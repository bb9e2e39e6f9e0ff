#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py OUTDIR SFDIR [query ...]
OUTDIR = dir written by `graft.Verify` (one parquet dir per query +
oracle_sql.json); SFDIR = testdata scale dir. Compares Spark results with
DuckDB results exactly (columns sorted by name, rows sorted by all columns).
"""
import duckdb, json, math, os, sys
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]") if s.dt.tz is None else s.dt.tz_convert("UTC").dt.tz_localize(None).astype("datetime64[us]")
            s = s.astype(str)
        elif s.dtype == object:
            s = s.apply(lambda v: str(v))
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        out[c] = s
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders","lineitem",
              "events","documents","embeddings"]:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        spath = os.path.join(outdir, name)
        if not os.path.isdir(spath):
            print(f"FAIL {name}: no spark output at {spath}")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(spath))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs oracle {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                bad = ~((a.isna() & b.isna()) | (a == b))
                if bad.any():
                    d = (a - b).abs().max()
                    diffs.append((c, int(bad.sum()), f"maxdiff={d}"))
            else:
                if not a.astype(str).equals(b.astype(str)):
                    bad = a.astype(str) != b.astype(str)
                    i = bad.idxmax()
                    diffs.append((c, int(bad.sum()), f"first: {a[i]!r} vs {b[i]!r}"))
        if diffs:
            print(f"FAIL {name}: {diffs[:4]}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
