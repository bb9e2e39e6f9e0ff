package graft.queries

/** DuckDB oracle SQL for [[DataQueries]] — every string here replays a
  * `DataQueries.defs` entry's semantics bit-for-bit (quantized sums,
  * fixed-iteration model loops, engine-exact hashing). Split out of
  * DataQueries so engine-code review stops paging through SQL; the
  * query/oracle pairing is unchanged (SparkEntry stitches both maps).
  */
object DataOracles {
  import graft.text.TextOps

  /** The q175/q176/q177 derived second corpus snapshot, as a pre-stripped
    * CTE body (`b AS (...)`) for interpolation into s-strings: one slice
    * removed (doc_id % 13 = 3), one revised (% 7 = 2, text + ' rev2'), one
    * added (% 17 = 5 re-keyed past the id space). Mirrors
    * [[DataQueries.snapshotB]] exactly — deterministic, so both engines
    * derive the identical snapshot.
    */
  private[queries] val snapshotBSql: String =
    """b AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id % 17 = 5
      |)""".stripMargin

  /** [[snapshotBSql]] carrying the full document row — mirrors
    * [[DataQueries.snapshotBFull]] exactly (metadata persists across a
    * revision, n_chars tracks the edit: +5 for ' rev2', +4 for 'new ').
    * The q191 oracle roots the ENTIRE monolithic pipeline-v4 replay here.
    */
  private[queries] val snapshotBFullSql: String =
    """bsnap AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS text,
      |    lang, source,
      |    CASE WHEN doc_id % 7 = 2 THEN n_chars + 5 ELSE n_chars END AS n_chars
      |  FROM documents WHERE doc_id % 13 <> 3
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'new ' || text, lang, source, n_chars + 4
      |  FROM documents WHERE doc_id % 17 = 5
      |)""".stripMargin

  /** The q196 third snapshot — [[DataQueries.snapshotCFull]] mirrored over
    * `bsnap`: removed % 11 = 4, revised % 5 = 1 (' rev3'), added % 19 = 7
    * (re-keyed +2e6, 'new2 ' prefix).
    */
  private[queries] val snapshotCFullSql: String =
    """csnap AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 1 THEN text || ' rev3' ELSE text END AS text,
      |    lang, source,
      |    CASE WHEN doc_id % 5 = 1 THEN n_chars + 5 ELSE n_chars END AS n_chars
      |  FROM bsnap WHERE doc_id % 11 <> 4
      |  UNION ALL
      |  SELECT doc_id + 2000000, 'new2 ' || text, lang, source, n_chars + 5
      |  FROM bsnap WHERE doc_id % 19 = 7
      |)""".stripMargin


  /** Shared oracle CTEs: tokens and distinct word-trigram shingles (the ONE
    * definition — [[OracleCte.triCte]] — shared with the sketch oracles).
    */
  private val triCte: String = OracleCte.triCte

  /** Shared CTE prefix for the q155/q157 oracles: corpus (base + planted
    * twins), the 9x8 pixel grid, and the 63-bit dHash — the SQL replay of
    * renderGrayPngs + imageDhash (lossless gray8 PNG makes them equal).
    */
  private val dhashCtes: String =
    """WITH base AS (
      |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
      |),
      |corpus AS (
      |  SELECT vec_id, v FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000 AS vec_id,
      |         [CASE WHEN i - 1 = vec_id THEN v[i] + 0.125 ELSE v[i] END
      |          FOR i IN generate_series(1, len(v))] AS v
      |  FROM base WHERE vec_id < 10
      |),
      |cells AS (
      |  SELECT c.vec_id, t.y, u.x,
      |    CAST(floor(least(greatest((v[((t.y * 9 + u.x) % len(v)) + 1] + 3.0) / 6.0,
      |                              0.0), 1.0) * 255.0) AS BIGINT) AS p
      |  FROM corpus c, unnest(generate_series(0, 7)) AS t(y),
      |       unnest(generate_series(0, 8)) AS u(x)
      |),
      |dh AS (
      |  SELECT a.vec_id,
      |    CAST(sum(CASE WHEN a.p < b.p
      |                  THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x)) ELSE 0 END)
      |         AS BIGINT) AS dhash
      |  FROM cells a JOIN cells b
      |    ON a.vec_id = b.vec_id AND a.y = b.y AND b.x = a.x + 1
      |  WHERE a.x < 8 AND NOT (a.y = 7 AND a.x = 7)
      |  GROUP BY 1
      |)""".stripMargin

  /** The uncapped MinHash+LSH pair mine replayed in DuckDB — q26's oracle,
    * shared verbatim by the q124 store-lifecycle gate (the increment-parity
    * contract: batched appends accumulate exactly the monolithic mine).
    */
  private lazy val minhashOracle: String = minhashOracleOver("documents")

  /** The pair mine parameterized over the corpus relation (the
    * trigramBackoffOracleOver treatment): q178 re-roots the SAME oracle at
    * the derived snapshot B, so the delta-maintained store must reproduce a
    * from-scratch mine over the moved corpus. `extraCtes` (comma-terminated)
    * prepends the snapshot derivation.
    */
  private[queries] def minhashOracleOver(rel: String, extraCtes: String = ""): String =
    s"""WITH $extraCtes${OracleCte.triCteOver(rel)},
       |tri2 AS (
       |  SELECT doc_id, ${hex60Sql("shingle")} % 2147483647 AS base FROM tri
       |),
       |mh AS (
       |  SELECT doc_id, p.i AS i,
       |         min((((1103515245*(p.i+1) + 12345) % 2147483647 * 2 + 1) % 2147483647 * base
       |              + (p.i+1) * 2654435761 % 2147483647) % 2147483647) AS minh
       |  FROM tri2, unnest(generate_series(0, 15)) AS p(i)
       |  GROUP BY doc_id, p.i
       |),
       |bandkeys AS (
       |  SELECT doc_id, CAST(i // 4 AS INT) AS band,
       |         md5(CAST(i // 4 AS INT)::VARCHAR || ':' || string_agg(minh::VARCHAR, ',' ORDER BY i)) AS band_key
       |  FROM mh GROUP BY doc_id, i // 4
       |),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandkeys a JOIN bandkeys b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |),
       |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tri GROUP BY 1),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM cand c
       |  JOIN tri a ON a.doc_id = c.doc_a
       |  JOIN tri b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
       |  GROUP BY 1,2
       |)
       |SELECT c.doc_a, c.doc_b, round(i.inter / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
       |FROM cand c JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
       |JOIN sizes sa ON sa.doc_id = c.doc_a
       |JOIN sizes sb ON sb.doc_id = c.doc_b
       |WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= 0.8
       |ORDER BY 1,2""".stripMargin

  /** Unrolled DuckDB mirror of [[Similarity.ivfKmeansTopK]] for any iteration
    * count: c0 is the deterministic seed, each Lloyd iteration t emits
    * assignment (a / asg), quantized-mean (upd), and rebuilt-centroid (c)
    * CTEs, and the final assignment feeds the cell-local search. The Spark
    * side collects centroids to the driver per iteration, but computes the
    * exact same quantized means, so the unrolled SQL stays hash-identical.
    */
  private def assignCte(t: Int, centName: String, src: String = "b",
                        tag: String = ""): String =
    s"""a$t$tag AS (
       |  SELECT b.vec_id, b.v, b.n, c.cid,
       |    round(list_dot_product(b.v, c.cv) / (b.n * c.cn), 6) AS csim
       |  FROM $src b CROSS JOIN $centName c
       |),
       |asg$t$tag AS (
       |  SELECT vec_id, v, n, cid AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
       |        FROM a$t$tag)
       |  WHERE crn = 1
       |)""".stripMargin

  /** WITH-prefix replaying [[Similarity.kmeansAssign]] in DuckDB: defines
    * `asg<iters>` = (vec_id, v, n, cell) after the Lloyd loop. Shared by the
    * q52 top-k oracle and the q99 semantic-dedup oracle.
    *
    * `fitWhere` (optional) restricts the vectors the Lloyd LOOP fits on —
    * the q119 lifecycle shape, where the index is built from a corpus
    * prefix and later arrivals are assigned to the FROZEN centroids: loop
    * CTEs run over `bf` (the fit subset) while the final `asg<iters>`
    * assignment — and the `a<iters>` scores the nprobe probe reads — covers
    * every vector, exactly like [[Similarity.ivfAppendCells]] against the
    * stored centroid set.
    */
  private[queries] def kmeansAsgCtes(numCentroids: Int, iters: Int,
                                     fitWhere: String = "",
                                     extraCtes: String = "",
                                     finalSrc: String = "b"): String = {
    val fitSrc = if (fitWhere.isEmpty) "b" else "bf"
    val bfCte = if (fitWhere.isEmpty) ""
      else s""",
              |bf AS (SELECT * FROM b WHERE $fitWhere)""".stripMargin
    val loop = (0 until iters).map { t =>
      s""",
         |${assignCte(t, s"c$t", fitSrc)},
         |upd$t AS (
         |  SELECT cell AS cid, t.i AS dim,
         |         CAST(sum(CAST(floor(v[t.i] * 100000000.0) AS BIGINT)) AS DOUBLE)
         |           / count(*) / 100000000.0 AS m
         |  FROM asg$t, unnest(generate_series(1, len(v))) AS t(i)
         |  GROUP BY 1, 2
         |),
         |c${t + 1} AS (
         |  SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn
         |  FROM (SELECT cid, list(m ORDER BY dim) AS cv FROM upd$t GROUP BY cid)
         |)""".stripMargin
    }.mkString
    s"""WITH e AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
       |),
       |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e)$bfCte$extraCtes,
       |c0 AS (SELECT vec_id AS cid, v AS cv, n AS cn FROM $fitSrc WHERE vec_id < $numCentroids)$loop,
       |${assignCte(iters, s"c$iters", finalSrc)}""".stripMargin
  }

  /** The q179/q180 derived second embedding snapshot (DataQueries
    * .embSnapshotB replayed): removed % 13 = 3, revised % 7 = 2 (vector
    * reversed), added % 17 = 5 (re-keyed +1e6, vector negated) — every
    * transform exact, so both engines derive the identical snapshot.
    * Leading comma; defines `bb` = the prepped frame over snapshot B.
    */
  private val embSnapshotBCtes: String =
    s""",
       |eb2 AS (
       |  SELECT vec_id, CASE WHEN vec_id % 7 = 2 THEN list_reverse(v) ELSE v END AS v
       |  FROM e WHERE vec_id % 13 <> 3
       |  UNION ALL
       |  SELECT vec_id + 1000000 AS vec_id, [-x FOR x IN v] AS v
       |  FROM e WHERE vec_id % 17 = 5
       |),
       |bb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM eb2)""".stripMargin

  /** The q195 third snapshot ([[DataQueries.embSnapshotC]] replayed over
    * eb2): removed % 11 = 4, revised % 5 = 1 (negated), added % 19 = 7
    * (re-keyed +2e6, reversed). Leading comma; defines `cc` over C.
    */
  private val embSnapshotCCtes: String =
    s""",
       |ec2 AS (
       |  SELECT vec_id, CASE WHEN vec_id % 5 = 1 THEN [-x FOR x IN v] ELSE v END AS v
       |  FROM eb2 WHERE vec_id % 11 <> 4
       |  UNION ALL
       |  SELECT vec_id + 2000000 AS vec_id, list_reverse(v) AS v
       |  FROM eb2 WHERE vec_id % 19 = 7
       |),
       |cc AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM ec2)""".stripMargin

  /** Shared CTE prefix for the DSIR oracles (q182/q183): hashed uni+bigram
    * instances (hex60 % 1024 — the [[graft.text.TextOps.hashedGramInstances]]
    * bucket function), target = the `lang = 'en'` slice, raw = the whole
    * corpus, add-one smoothed bucket models, per-bucket LLR quantized to
    * integer micro-nats (the q95/q101 ln discipline), per-doc integer sums.
    * Defines `scored` = (doc_id, n_grams, dsir6, avg_llr) over every doc.
    */
  /** `ns` prefixes every CTE name so the block composes into oracles that
    * already define generic names (inst/per/scored — the q189 pipeline-v4
    * composition); `lead` lets the caller splice it mid-WITH. ns = "" and
    * lead = "WITH " reproduce the standalone q182-q186 text byte-for-byte.
    */
  private def dsirCtesOver(src: String, targetWhere: String,
                           prefix: String = "", ns: String = "",
                           lead: String = "WITH "): String =
    s"""$lead${prefix}${ns}toks AS (
       |  SELECT *, string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM $src
       |),
       |${ns}grams AS (
       |  SELECT doc_id, ${hex60Sql("g")} % 1024 AS bucket, tgt FROM (
       |    SELECT doc_id, unnest(w) AS g, $targetWhere AS tgt FROM ${ns}toks
       |    UNION ALL
       |    SELECT doc_id, w[i] || ' ' || w[i+1] AS g, $targetWhere AS tgt
       |    FROM ${ns}toks, unnest(generate_series(1, len(w)-1)) AS t(i)
       |  )
       |),
       |${ns}rc AS (SELECT bucket, count(*) AS cr FROM ${ns}grams GROUP BY 1),
       |${ns}tc AS (SELECT bucket, count(*) AS ct FROM ${ns}grams WHERE tgt GROUP BY 1),
       |${ns}bj AS (
       |  SELECT coalesce(${ns}rc.bucket, ${ns}tc.bucket) AS bucket,
       |         coalesce(ct, 0) AS ct, coalesce(cr, 0) AS cr
       |  FROM ${ns}rc FULL OUTER JOIN ${ns}tc ON ${ns}rc.bucket = ${ns}tc.bucket
       |),
       |${ns}tot AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
       |  FROM ${ns}bj
       |),
       |${ns}llr AS (
       |  SELECT bucket,
       |    CAST(floor(ln(((ct + 1.0) / (nt + 1024.0)) / ((cr + 1.0) / (nr + 1024.0)))
       |      * 1000000.0 + 0.5) AS BIGINT) AS llr6
       |  FROM ${ns}bj CROSS JOIN ${ns}tot
       |),
       |${ns}inst AS (SELECT doc_id, bucket, count(*) AS c FROM ${ns}grams GROUP BY 1, 2),
       |${ns}per AS (
       |  SELECT i.doc_id, CAST(sum(i.c) AS BIGINT) AS n_grams,
       |         CAST(sum(i.c * l.llr6) AS BIGINT) AS dsir6
       |  FROM ${ns}inst i JOIN ${ns}llr l USING (bucket) GROUP BY 1
       |),
       |${ns}scored AS (
       |  SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
       |    coalesce(p.dsir6, 0) AS dsir6,
       |    CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
       |         ELSE round(CAST(p.dsir6 AS DOUBLE) / p.n_grams / 1000000.0, 6)
       |    END AS avg_llr
       |  FROM $src d LEFT JOIN ${ns}per p USING (doc_id)
       |)""".stripMargin

  private lazy val dsirCtes: String = dsirCtesOver("documents", "lang = 'en'")

  /** Shared prefix for the q187/q188 filter-attribution oracles: the q31
    * quality formula, the q66 repetition fractions, and the q96
    * dup-shingle fraction (rounded as published there), composed into
    * `att` = one row per document with the four rule verdicts at the
    * established thresholds. Every comparison runs on IEEE-exact
    * arithmetic identical to the Spark expressions.
    */
  private val filterAttCtes: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    len(string_split_regex(trim(text), '\s+')) AS n_words,
      |    len(list_filter(string_split_regex(trim(text), '\s+'),
      |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS stop_cnt
      |  FROM documents
      |),
      |q AS (
      |  SELECT doc_id, n_words,
      |    least(1.0, n_words / 100.0)
      |      * (1.0 - abs(CAST(stop_cnt AS DOUBLE) / n_words - 0.4)) AS qs
      |  FROM f
      |),
      |wcounts AS (
      |  SELECT doc_id, w AS word, count(*) AS cnt
      |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2
      |),
      |rep AS (
      |  SELECT doc_id,
      |    CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS twf,
      |    1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dwf
      |  FROM wcounts GROUP BY 1
      |),
      |ftoks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
      |),
      |finst AS (
      |  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |  FROM ftoks, unnest(generate_series(1, len(w)-2)) AS t(i)
      |),
      |fdfx AS (
      |  SELECT shingle, count(*) AS df
      |  FROM (SELECT DISTINCT doc_id, shingle FROM finst) GROUP BY 1
      |),
      |fper AS (
      |  SELECT i.doc_id, count(*) AS n_shingles,
      |         CAST(sum(CASE WHEN x.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
      |  FROM finst i JOIN fdfx x USING (shingle) GROUP BY 1
      |),
      |dng AS (
      |  SELECT d.doc_id,
      |    coalesce(round(CAST(p.n_dup AS DOUBLE) / p.n_shingles, 6), 0.0) AS dup_frac
      |  FROM documents d LEFT JOIN fper p USING (doc_id)
      |),
      |att AS (
      |  SELECT q.doc_id, q.n_words, q.qs,
      |    q.n_words >= 5 AS pass_length,
      |    q.qs >= 0.3 AS pass_quality,
      |    (r.twf <= 0.2 AND r.dwf <= 0.7) AS pass_repetition,
      |    g.dup_frac <= 0.6 AS pass_dupngram
      |  FROM q JOIN rep r USING (doc_id) JOIN dng g USING (doc_id)
      |)""".stripMargin

  /** The squash -> ppm-floor CTEs yielding `<ns>rated` =
    * (doc_id, n_grams, dsir6, avg_llr, rate_ppm). Leading comma.
    */
  private[queries] def dsirRatedCtes(ns: String = ""): String =
    s""",
       |${ns}gate AS (
       |  SELECT *, CAST(dsir6 AS DOUBLE) / 1000000.0 AS xd
       |  FROM ${ns}scored
       |),
       |${ns}rated AS (
       |  SELECT doc_id, n_grams, dsir6, avg_llr,
       |    CAST(floor((1.0 + xd / (1.0 + abs(xd))) / 2.0 * 1000000.0 + 0.5)
       |      AS BIGINT) AS rate_ppm
       |  FROM ${ns}gate
       |)""".stripMargin

  /** The full DSIR model + rate CTEs, composable mid-WITH under a
    * namespace — the q189 pipeline-v4 splice: `<ns>rated` carries every
    * document's acceptance rate for the corpus-wide en-target fit.
    */
  private[queries] def dsirRatedBlock(ns: String,
                                      src: String = "documents"): String =
    dsirCtesOver(src, "lang = 'en'", ns = ns, lead = "") +
      dsirRatedCtes(ns)

  /** The q183 resampling-gate tail (squash -> ppm floor -> hex60 draw),
    * shared by every DSIR oracle that emits [[graft.text.TextOps
    * .dsirSample]]'s frame. Leading comma; closes the statement.
    */
  private lazy val dsirGateTail: String =
    s"""${dsirRatedCtes()}
       |SELECT doc_id, n_grams, dsir6, avg_llr, rate_ppm,
       |  ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 1000000 < rate_ppm AS kept
       |FROM rated ORDER BY doc_id""".stripMargin

  private def ivfKmeansOracle(numCentroids: Int, iters: Int, k: Int): String = {
    s"""${kmeansAsgCtes(numCentroids, iters)},
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell AS cell,
       |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
       |  FROM asg$iters q JOIN asg$iters c ON q.cell = c.cell AND q.vec_id <> c.vec_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, cell, CAST(rank AS INT) AS rank, sim
       |FROM ranked WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  private val hex60Sql: String => String = OracleCte.hex60Sql

  /** The q209/q212 PSI block over a snapshot pair, namespaced for
    * composition: per-feature bucket counts over the UNION of observed
    * buckets, add-one smoothing, ln(pB/pA) quantized to integer micro-nats
    * (the q95/q101 discipline), the (pB−pA) factor carried as an exact
    * HUGEINT numerator, one final double division. Mirrors
    * [[graft.operators.Drift.psiReport]] over the q209 feature set
    * ([[DataQueries]] driftFeatures) term for term. Ends with `${ns}rep`
    * = (feature, n_buckets, n_a, n_b, psi); both relations must carry
    * (text, lang, source, n_chars).
    */
  private[queries] def psiCtesOver(aRel: String, bRel: String, ns: String): String =
    s"""${ns}u AS (
       |  SELECT 'a' AS side, text, lang, source, n_chars FROM $aRel
       |  UNION ALL
       |  SELECT 'b', text, lang, source, n_chars FROM $bRel
       |),
       |${ns}ex AS (
       |  SELECT side, 'lang' AS feature, coalesce(lang, ' null') AS bucket FROM ${ns}u
       |  UNION ALL
       |  SELECT side, 'source', coalesce(source, ' null') FROM ${ns}u
       |  UNION ALL
       |  SELECT side, 'len_b', CAST(CAST(floor(n_chars / 50) AS BIGINT) AS VARCHAR) FROM ${ns}u
       |  UNION ALL
       |  SELECT side, 'words_b',
       |    CAST(CAST(floor(len(string_split_regex(trim(text), '\\s+')) / 10) AS BIGINT) AS VARCHAR)
       |  FROM ${ns}u
       |),
       |${ns}cnt AS (
       |  SELECT feature, bucket,
       |    CAST(sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM ${ns}ex GROUP BY 1, 2
       |),
       |${ns}tot AS (
       |  SELECT feature, count(*) AS k,
       |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
       |  FROM ${ns}cnt GROUP BY 1
       |),
       |${ns}term AS (
       |  SELECT c.feature, c.bucket, c.ca, c.cb, t.k, t.na, t.nb,
       |    CAST(c.cb + 1 AS HUGEINT) * (t.na + t.k)
       |      - CAST(c.ca + 1 AS HUGEINT) * (t.nb + t.k) AS dnum,
       |    CAST(floor(ln(((c.cb + 1.0) * (t.na + t.k)) / ((c.ca + 1.0) * (t.nb + t.k)))
       |      * 1000000.0 + 0.5) AS BIGINT) AS l6
       |  FROM ${ns}cnt c JOIN ${ns}tot t USING (feature)
       |),
       |${ns}rep AS (
       |  SELECT feature, k AS n_buckets, na AS n_a, nb AS n_b,
       |    floor(CAST(sum(dnum * l6) AS DOUBLE)
       |      / (CAST(na + k AS DOUBLE) * CAST(nb + k AS DOUBLE)) + 0.5) / 1e6 AS psi
       |  FROM ${ns}term GROUP BY 1, 2, 3, 4
       |)""".stripMargin

  /** The monolithic A→B drift report (q209) — also q216's oracle, where
    * the Spark side serves the identical report from the delta-maintained
    * store.
    */
  private lazy val psiMonolithicSql: String =
    s"""WITH $snapshotBFullSql,
       |${psiCtesOver("documents", "bsnap", "")}
       |SELECT feature, n_buckets, n_a, n_b, psi, $psiVerdictSql
       |FROM rep ORDER BY feature""".stripMargin

  /** Verdict thresholds shared by the q209/q212 oracles (the conventional
    * PSI bands), applied to the ALREADY-quantized psi so both engines
    * compare the identical double.
    */
  private val psiVerdictSql: String =
    "CASE WHEN psi < 0.1 THEN 'stable' WHEN psi < 0.2 THEN 'moderate' " +
      "ELSE 'drifted' END AS verdict"

  /** The q210/q211 per-shard manifest rows over a corpus relation:
    * hex60(id) mod nShards routing + the per-row `id:text` fingerprint —
    * mirrors [[graft.operators.Shards.manifest]]'s projection exactly.
    */
  private def shardRowsOver(rel: String, nShards: Int): String =
    s"""SELECT ${hex60Sql("CAST(doc_id AS VARCHAR)")} % $nShards AS shard, doc_id,
       |    length(text) AS len,
       |    ${hex60Sql("CAST(doc_id AS VARCHAR) || ':' || text")} AS fp
       |  FROM $rel""".stripMargin

  /** q131 oracle: replay [[Similarity.pqCodebooks]]' m independent
    * per-subspace spherical Lloyd fits (each the kmeansAsgCtes loop over a
    * `v[lo:hi]` slice), [[Similarity.pqEncode]]'s assignment argmax, and
    * [[Similarity.pqAdcTopK]]'s integer-quantized ADC lookup-table scoring
    * — same floor*1e8 long partials, so the per-pair sums are
    * addition-order-independent in BOTH engines and the ranking matches
    * bit-for-bit.
    */
  private def pqAdcOracle(m: Int, k: Int, iters: Int, dim: Int,
                          nQueries: Int, topK: Int, fitWhere: String = "",
                          extraCtes: String = "", encodeSrc: String = "e",
                          querySrc: String = "e"): String =
    s"""${pqCtes(m, k, iters, dim, nQueries, fitWhere, extraCtes, encodeSrc, querySrc)}
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
       |FROM ranked WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** q132's oracle: the PQ pipeline as the probe side of the q106-shaped
    * recall computation (no mirror of the Spark assert_true floor, same as
    * the other recall gates).
    */
  private def pqRecallOracle(m: Int, k: Int, iters: Int, dim: Int,
                             nQueries: Int, topK: Int): String =
    s"""${pqCtes(m, k, iters, dim, nQueries)},
       |pq_topk AS (
       |  SELECT query_id, neighbor_id FROM ranked WHERE rank <= $topK
       |),
       |bn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
       |brute_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS true_id,
       |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
       |  FROM bn q JOIN bn c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < $nQueries
       |),
       |brute_topk AS (
       |  SELECT query_id, true_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, true_id ASC) AS rk
       |    FROM brute_scored) WHERE rk <= $topK
       |),
       |per AS (
       |  SELECT t.query_id,
       |    CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM brute_topk t LEFT JOIN pq_topk i
       |    ON t.query_id = i.query_id AND t.true_id = i.neighbor_id
       |  GROUP BY 1
       |),
       |agg AS (
       |  SELECT CAST(sum(n_hits) AS BIGINT) AS sum_hits, count(*) AS n_queries FROM per
       |)
       |SELECT query_id, n_hits,
       |  round(n_hits / $topK.0, 6) AS recall,
       |  round(sum_hits / ($topK.0 * n_queries), 6) AS mean_recall
       |FROM per CROSS JOIN agg ORDER BY query_id""".stripMargin

  /** Shared WITH-prefix for the PQ oracles: defines `e` (widened vectors),
    * `q` (the first `nQueries` as queries), the per-subspace Lloyd loops,
    * `codes`/`lut`, and `ranked` = the full ADC ranking.
    */
  private def pqCtes(m: Int, k: Int, iters: Int, dim: Int, nQueries: Int,
                     fitWhere: String = "", extraCtes: String = "",
                     encodeSrc: String = "e", querySrc: String = "e"): String =
    s"""WITH e AS (
       |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
       |)$extraCtes,
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
       |  FROM $querySrc WHERE vec_id < $nQueries
       |)${pqSubCtes(m, k, iters, dim, fitWhere, encodeSrc)},
       |scored AS (
       |  SELECT l.query_id, co.vec_id,
       |         sum(l.pdot) AS sdot, sum(l.pn2) AS sn2, max(l.qn) AS qn
       |  FROM codes co JOIN lut l ON co.s = l.s AND co.code = l.cid
       |  WHERE l.query_id <> co.vec_id
       |  GROUP BY 1, 2
       |),
       |approx AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    round((sdot / 100000000.0) / (qn * sqrt(sn2 / 100000000.0)), 6) AS sim
       |  FROM scored
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM approx
       |)""".stripMargin

  /** The per-subspace PQ CTEs alone (Lloyd loops, `codes`, `lut`) — they
    * reference an already-defined `e` (corpus) and `q` (queries), so they
    * compose after [[kmeansAsgCtes]] for the IVF-PQ oracle. Leading comma.
    */
  /** `encodeSrc` (q181's delta-maintenance re-root): the Lloyd loops stay
    * on `e`'s slices (the store's frozen codebook geometry), but the final
    * encode (`af\$s` → `codes`) runs over this frame's slices instead —
    * fit-on-A/encode-B, exactly what a retired + re-appended + compacted
    * PQ store holds.
    */
  private def pqSubCtes(m: Int, k: Int, iters: Int, dim: Int,
                        fitWhere: String = "",
                        encodeSrc: String = "e"): String = {
    val sub = dim / m
    // `fitWhere` restricts the Lloyd LOOP's fit set (the q134 lifecycle
    // shape: codebooks frozen from a corpus prefix, later arrivals encoded
    // against them) while the final `codes`/`lut` cover every vector —
    // the kmeansAsgCtes fitWhere treatment applied per subspace.
    val perS = (0 until m).map { s =>
      val fitSrc = if (fitWhere.isEmpty) s"b$s" else s"bf$s"
      val bfCte = if (fitWhere.isEmpty) ""
        else s""",
                |bf$s AS (SELECT * FROM b$s WHERE $fitWhere)""".stripMargin
      val lo = s * sub + 1; val hi = (s + 1) * sub
      val loop = (0 until iters).map { t =>
        s""",
           |a${s}_$t AS (
           |  SELECT b.vec_id, b.v, b.n, c.cid,
           |    round(list_dot_product(b.v, c.cv) / (b.n * c.cn), 6) AS csim
           |  FROM $fitSrc b CROSS JOIN c${s}_$t c
           |),
           |asg${s}_$t AS (
           |  SELECT vec_id, v, n, cid AS cell
           |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
           |        FROM a${s}_$t)
           |  WHERE crn = 1
           |),
           |upd${s}_$t AS (
           |  SELECT cell AS cid, t.i AS dim,
           |         CAST(sum(CAST(floor(v[t.i] * 100000000.0) AS BIGINT)) AS DOUBLE)
           |           / count(*) / 100000000.0 AS m
           |  FROM asg${s}_$t, unnest(generate_series(1, len(v))) AS t(i)
           |  GROUP BY 1, 2
           |),
           |c${s}_${t + 1} AS (
           |  SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn
           |  FROM (SELECT cid, list(m ORDER BY dim) AS cv FROM upd${s}_$t GROUP BY cid)
           |)""".stripMargin
      }.mkString
      val encCte = if (encodeSrc == "e") ""
        else s""",
                |be$s AS (
                |  SELECT vec_id, v[$lo:$hi] AS v,
                |         sqrt(list_dot_product(v[$lo:$hi], v[$lo:$hi])) AS n
                |  FROM $encodeSrc
                |)""".stripMargin
      val encFrame = if (encodeSrc == "e") s"b$s" else s"be$s"
      s""",
         |b$s AS (
         |  SELECT vec_id, v[$lo:$hi] AS v,
         |         sqrt(list_dot_product(v[$lo:$hi], v[$lo:$hi])) AS n
         |  FROM e
         |)$bfCte$encCte,
         |c${s}_0 AS (SELECT vec_id AS cid, v AS cv, n AS cn FROM $fitSrc WHERE vec_id < $k)$loop,
         |af$s AS (
         |  SELECT b.vec_id, c.cid,
         |    round(list_dot_product(b.v, c.cv) / (b.n * c.cn), 6) AS csim
         |  FROM $encFrame b CROSS JOIN c${s}_$iters c
         |),
         |codes$s AS (
         |  SELECT vec_id, $s AS s, cid AS code
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
         |        FROM af$s)
         |  WHERE crn = 1
         |),
         |lut$s AS (
         |  SELECT q.query_id, q.qn, $s AS s, c.cid,
         |    CAST(floor(list_dot_product(q.qv[$lo:$hi], c.cv) * 100000000.0) AS BIGINT) AS pdot,
         |    CAST(floor(c.cn * c.cn * 100000000.0) AS BIGINT) AS pn2
         |  FROM q CROSS JOIN c${s}_$iters c
         |)""".stripMargin
    }.mkString
    val codesUnion = (0 until m).map(s => s"SELECT * FROM codes$s").mkString(" UNION ALL ")
    val lutUnion = (0 until m).map(s => s"SELECT * FROM lut$s").mkString(" UNION ALL ")
    s"""$perS,
       |codes AS ($codesUnion),
       |lut AS ($lutUnion)""".stripMargin
  }

  /** q133's oracle: [[kmeansAsgCtes]] supplies the IVF cells (`a3`/`asg3`),
    * [[pqSubCtes]] the codebooks/codes/LUT, and the probe/candidate/ADC
    * chain mirrors [[Similarity.ivfPqTopK]] — nprobe cells per query,
    * cell-local candidates, integer-quantized LUT sums.
    */
  private def ivfPqOracle(numCentroids: Int, iters: Int, m: Int, k: Int,
                          pqIters: Int, dim: Int, nQueries: Int, topK: Int,
                          nprobe: Int): String =
    s"""${kmeansAsgCtes(numCentroids, iters)},
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
       |  FROM e WHERE vec_id < $nQueries
       |)${pqSubCtes(m, k, pqIters, dim)},
       |probes AS (
       |  SELECT vec_id AS query_id, cid AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
       |        FROM a$iters)
       |  WHERE crn <= $nprobe AND vec_id < $nQueries
       |),
       |cand AS (
       |  SELECT p.query_id, c.vec_id AS neighbor_id, p.cell
       |  FROM probes p JOIN asg$iters c ON p.cell = c.cell AND p.query_id <> c.vec_id
       |),
       |scored AS (
       |  SELECT cd.query_id, cd.neighbor_id, cd.cell,
       |         sum(l.pdot) AS sdot, sum(l.pn2) AS sn2, max(l.qn) AS qn
       |  FROM cand cd
       |  JOIN codes co ON co.vec_id = cd.neighbor_id
       |  JOIN lut l ON l.query_id = cd.query_id AND l.s = co.s AND l.cid = co.code
       |  GROUP BY 1, 2, 3
       |),
       |approx AS (
       |  SELECT query_id, neighbor_id, cell,
       |    round((sdot / 100000000.0) / (qn * sqrt(sn2 / 100000000.0)), 6) AS sim
       |  FROM scored
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM approx
       |)
       |SELECT query_id, neighbor_id, cell, CAST(rank AS INT) AS rank, sim
       |FROM ranked WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** Multi-probe (nprobe=2) IVF rows over the 8-centroid/3-iter build:
    * query side takes the TWO nearest centroids (crn <= 2 over the final
    * Lloyd scores a3); corpus side keeps its crn = 1 cell. Shared by q107
    * (in-memory search) and q112 (probe of the persisted index) — the
    * store round-trip must be invisible to the search results.
    */
  private val nprobeOracleBody: String =
    s"""probes AS (
       |  SELECT vec_id, v, n, cid AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
       |        FROM a3)
       |  WHERE crn <= 2
       |),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell AS cell,
       |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
       |  FROM probes q JOIN asg3 c ON q.cell = c.cell AND q.vec_id <> c.vec_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, cell, CAST(rank AS INT) AS rank, sim
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  private val nprobeOracle: String =
    s"""${kmeansAsgCtes(numCentroids = 8, iters = 3)},
       |$nprobeOracleBody""".stripMargin

  /** q119's oracle: the SAME nprobe probe, but the Lloyd fit runs only on
    * the vec_id < 300 build prefix (the store's frozen geometry) while the
    * final assignment — prefix at build time, remainder at append time —
    * covers every vector. The probe after build→append→compact must be
    * bit-identical to this; compaction must be invisible entirely.
    */
  private val ivfLifecycleOracle: String =
    s"""${kmeansAsgCtes(numCentroids = 8, iters = 3, fitWhere = "vec_id < 300")},
       |$nprobeOracleBody""".stripMargin

  /** Row-level twin of the tuned 16x5 LSH search (q117 and the q122
    * lifecycle share it — the store round-trip, and any build/append split
    * of the corpus, must be invisible to the search results). The kmeans
    * CTE prefix supplies `b`; DuckDB prunes the unreferenced Lloyd CTEs.
    */
  /** `src` is the prepped (vec_id, v, n) frame the signatures and rescore
    * payloads read — `b` for the snapshot-A oracles, `bb` (via
    * [[embSnapshotBCtes]] in `extraCtes`) for the q180 delta-maintenance
    * re-root.
    */
  private def lshStoreOracleOver(src: String, extraCtes: String = ""): String =
    s"""${kmeansAsgCtes(numCentroids = 8, iters = 3, extraCtes = extraCtes)},
       |comps AS (
       |  SELECT tt.t AS t, jj.j AS j, dd.d AS d,
       |    CAST(${hex60Sql("CAST(tt.t AS VARCHAR) || ':' || CAST(jj.j AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR)")} % 2001 - 1000 AS DOUBLE) / 1000.0 AS h
       |  FROM unnest(generate_series(0, 15)) AS tt(t),
       |       unnest(generate_series(0, 4)) AS jj(j),
       |       unnest(generate_series(0, 63)) AS dd(d)
       |),
       |hp AS (SELECT t, j, list(h ORDER BY d) AS harr FROM comps GROUP BY 1, 2),
       |sig AS (
       |  SELECT b.vec_id, hp.t,
       |    sum(CASE WHEN list_dot_product(b.v, hp.harr) > 0
       |             THEN (CAST(1 AS BIGINT) << CAST(hp.j AS INT)) ELSE 0 END) AS bucket
       |  FROM $src b CROSS JOIN hp
       |  GROUP BY 1, 2
       |),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM sig q JOIN sig c
       |    ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 100
       |),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    round(list_dot_product(qb.v, cb.v) / (qb.n * cb.n), 6) AS sim
       |  FROM cand JOIN $src qb ON cand.query_id = qb.vec_id
       |            JOIN $src cb ON cand.neighbor_id = cb.vec_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
       |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  private val lshStoreOracle: String = lshStoreOracleOver("b")

  /** DuckDB twin of [[annRecallGate]]: `ivfTopkSql` must define the probe
    * side as rows (query_id, neighbor_id) named `ivf_topk`, on top of
    * [[kmeansAsgCtes]]' prefix (so `b` and `a3`/`asg3` are in scope). No
    * mirror of the Spark assert_true floor — see the gate's scaladoc.
    */
  private def annRecallOracle(ivfTopkSql: String, k: Int): String =
    s"""${kmeansAsgCtes(numCentroids = 8, iters = 3)},
       |$ivfTopkSql,
       |brute_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS true_id,
       |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
       |  FROM b q JOIN b c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 100
       |),
       |brute_topk AS (
       |  SELECT query_id, true_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, true_id ASC) AS rk
       |    FROM brute_scored) WHERE rk <= $k
       |),
       |per AS (
       |  SELECT t.query_id,
       |    CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM brute_topk t LEFT JOIN ivf_topk i
       |    ON t.query_id = i.query_id AND t.true_id = i.neighbor_id
       |  GROUP BY 1
       |),
       |agg AS (
       |  SELECT CAST(sum(n_hits) AS BIGINT) AS sum_hits, count(*) AS n_queries FROM per
       |)
       |SELECT query_id, n_hits,
       |  round(n_hits / $k.0, 6) AS recall,
       |  round(sum_hits / ($k.0 * n_queries), 6) AS mean_recall
       |FROM per CROSS JOIN agg ORDER BY query_id""".stripMargin

  /** WITH-prefix shared by the PCA oracles: replay [[Pca.covariance]]'s
    * quantized means + centered Gram matrix, then [[Pca.powerIteration]]'s
    * fixed-count power iteration with Hotelling deflation — every inner sum
    * a floor*1e8 BIGINT partial, iterates re-rounded to 6 decimals per
    * step, so both engines run the identical arithmetic whether or not the
    * subspace has converged. Defines `pe` (widened vectors), `pcx`
    * (centered exploded rows), `ptrace`, and `comps` = (comp, dim, w
    * signed, eigval).
    */
  /** The per-component power-iteration/deflation loop + `comps` (leading
    * comma) — references `pmu` (dims), `g0` (the covariance, however
    * derived), shared by the centered-Gram and raw-moments prefixes.
    */
  private def pcaLoopCtes(p: Int, iters: Int, dim: Int = 64): String = {
    val perC = (0 until p).map { c =>
      val loop = (1 to iters).map { t =>
        s""",
           |y${c}_$t AS MATERIALIZED (
           |  SELECT g.i, CAST(sum(CAST(floor(g.g * x.w * 100000000.0) AS BIGINT)) AS DOUBLE)
           |           / 100000000.0 AS y
           |  FROM g$c g JOIN x${c}_${t - 1} x ON g.j = x.i GROUP BY 1
           |),
           |n${c}_$t AS MATERIALIZED (
           |  SELECT sqrt(CAST(sum(CAST(floor(y * y * 100000000.0) AS BIGINT)) AS DOUBLE)
           |              / 100000000.0) AS nrm
           |  FROM y${c}_$t
           |),
           |x${c}_$t AS MATERIALIZED (
           |  SELECT y.i, CASE WHEN n.nrm = 0.0 THEN x.w ELSE round(y.y / n.nrm, 6) END AS w
           |  FROM y${c}_$t y JOIN x${c}_${t - 1} x ON y.i = x.i CROSS JOIN n${c}_$t n
           |)""".stripMargin
      }.mkString
      s""",
         |x${c}_0 AS MATERIALIZED (
         |  SELECT i, CASE WHEN i = ${c % dim} THEN 1.0 ELSE 0.0 END AS w FROM pmu
         |)$loop,
         |l$c AS MATERIALIZED (
         |  SELECT CAST(sum(CAST(floor(g.g * xi.w * xj.w * 100000000.0) AS BIGINT)) AS DOUBLE)
         |           / 100000000.0 AS lam
         |  FROM g$c g JOIN x${c}_$iters xi ON g.i = xi.i JOIN x${c}_$iters xj ON g.j = xj.i
         |),
         |s$c AS MATERIALIZED (
         |  SELECT CASE WHEN (SELECT w FROM x${c}_$iters ORDER BY abs(w) DESC, i ASC LIMIT 1) < 0
         |              THEN -1.0 ELSE 1.0 END AS sgn
         |),
         |g${c + 1} AS MATERIALIZED (
         |  SELECT g.i, g.j,
         |    g.g - CAST(floor(l.lam * xi.w * xj.w * 100000000.0) AS BIGINT) / 100000000.0 AS g
         |  FROM g$c g JOIN x${c}_$iters xi ON g.i = xi.i JOIN x${c}_$iters xj ON g.j = xj.i
         |  CROSS JOIN l$c l
         |)""".stripMargin
    }.mkString
    val compsUnion = (0 until p).map { c =>
      s"""SELECT $c AS comp, x.i AS dim, x.w * s.sgn AS w, l.lam AS eigval
         |  FROM x${c}_$iters x CROSS JOIN s$c s CROSS JOIN l$c l""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""$perC,
       |comps AS (
       |  $compsUnion
       |)""".stripMargin
  }

  // dim threads through to the one-hot start (`c % dim`) so the oracle
  // can't silently diverge from Pca.powerIteration if reused with dim != 64
  private def pcaCtes(p: Int, iters: Int, dim: Int = 64): String =
    s"""WITH pe AS MATERIALIZED (
       |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
       |),
       |pnn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nd FROM pe),
       |pex AS MATERIALIZED (
       |  SELECT vec_id, t.i - 1 AS i, v[t.i] AS x
       |  FROM pe, unnest(generate_series(1, len(v))) AS t(i)
       |),
       |pmu AS MATERIALIZED (
       |  SELECT i, CAST(sum(CAST(floor(x * 100000000.0) AS BIGINT)) AS DOUBLE)
       |         / (SELECT nd FROM pnn) / 100000000.0 AS m
       |  FROM pex GROUP BY 1
       |),
       |pcx AS MATERIALIZED (SELECT e.vec_id, e.i, e.x - m.m AS x FROM pex e JOIN pmu m ON e.i = m.i),
       |g0 AS MATERIALIZED (
       |  SELECT a.i, b.i AS j,
       |    CAST(sum(CAST(floor(a.x * b.x * 100000000.0) AS BIGINT)) AS DOUBLE)
       |      / (SELECT nd FROM pnn) / 100000000.0 AS g
       |  FROM pcx a JOIN pcx b ON a.vec_id = b.vec_id GROUP BY 1, 2
       |),
       |ptrace AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(floor(g * 100000000.0) AS BIGINT)) AS DOUBLE) / 100000000.0 AS tr
       |  FROM g0 WHERE i = j
       |)${pcaLoopCtes(p, iters, dim)}""".stripMargin

  /** Raw-moments PCA prefix (the streamable path): the covariance derives
    * from ADDITIVE quantized sums — count, per-dim first moments, and the
    * second-moment matrix — via cov_ij = M2_ij/n/1e8 - mu_i*mu_j. The sums
    * are plain BIGINTs, so any partition of the corpus accumulates to the
    * identical store (the LM-counts additivity argument) — which is what
    * makes the q153 stream-grown fit hash-equal to this batch fit.
    */
  private def pcaMomentsCtes(p: Int, iters: Int, dim: Int = 64,
                             where: String = "1=1"): String =
    s"""WITH pe AS MATERIALIZED (
       |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v
       |  FROM embeddings WHERE $where
       |),
       |pnn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS nd FROM pe),
       |pex AS MATERIALIZED (
       |  SELECT vec_id, t.i - 1 AS i, v[t.i] AS x
       |  FROM pe, unnest(generate_series(1, len(v))) AS t(i)
       |),
       |pm1 AS MATERIALIZED (
       |  SELECT i, CAST(sum(CAST(floor(x * 100000000.0) AS BIGINT)) AS BIGINT) AS s1
       |  FROM pex GROUP BY 1
       |),
       |pm2 AS MATERIALIZED (
       |  SELECT a.i, b.i AS j,
       |    CAST(sum(CAST(floor(a.x * b.x * 100000000.0) AS BIGINT)) AS BIGINT) AS s2
       |  FROM pex a JOIN pex b ON a.vec_id = b.vec_id GROUP BY 1, 2
       |),
       |pmu AS MATERIALIZED (
       |  SELECT i, CAST(s1 AS DOUBLE) / (SELECT nd FROM pnn) / 100000000.0 AS m
       |  FROM pm1
       |),
       |g0 AS MATERIALIZED (
       |  SELECT m2.i, m2.j,
       |    CAST(m2.s2 AS DOUBLE) / (SELECT nd FROM pnn) / 100000000.0 - mi.m * mj.m AS g
       |  FROM pm2 m2 JOIN pmu mi ON m2.i = mi.i JOIN pmu mj ON m2.j = mj.i
       |),
       |ptrace AS MATERIALIZED (
       |  SELECT CAST(sum(CAST(floor(g * 100000000.0) AS BIGINT)) AS DOUBLE) / 100000000.0 AS tr
       |  FROM g0 WHERE i = j
       |)${pcaLoopCtes(p, iters, dim)}""".stripMargin

  /** `where` re-roots the raw-moments replay at a vector predicate — the
    * q203 retirement gate; "1=1" reproduces the q152/q153 oracle.
    */
  private def pcaMomentsOracle(p: Int, iters: Int, where: String = "1=1"): String =
    s"""${pcaMomentsCtes(p, iters, where = where)}
       |SELECT CAST(comp AS INT) AS comp, CAST(dim AS INT) AS dim, w,
       |  round(eigval, 6) AS eigval,
       |  round(eigval / (SELECT tr FROM ptrace), 6) AS var_ratio
       |FROM comps ORDER BY comp, dim""".stripMargin

  /** The q139 projection CTE (leading comma): centered rows x signed
    * loadings, quantized partials per (vector, component).
    */
  private val pcaProjCte: String =
    """,
      |proj AS MATERIALIZED (
      |  SELECT c.vec_id, p.comp,
      |    CAST(sum(CAST(floor(c.x * p.w * 100000000.0) AS BIGINT)) AS DOUBLE)
      |      / 100000000.0 AS proj
      |  FROM pcx c JOIN comps p ON c.i = p.dim
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** q146's oracle: the composed PCA -> PQ pipeline — [[pcaCtes]]' fit and
    * projection feed a RE-ROOTED `e` (the 16-dim projected corpus), and
    * [[pqSubCtes]] + the ADC tail replay the sub-k-means fits, encoding,
    * LUT, and ranking over it — every stage the same quantized arithmetic,
    * so the whole two-model pipeline is hash-exact end to end.
    */
  private def pcaPqOracle(p: Int, pIters: Int, m: Int, k: Int, pqIters: Int,
                          nQueries: Int, topK: Int): String =
    s"""${pcaCtes(p, pIters)}$pcaProjCte,
       |e AS MATERIALIZED (
       |  SELECT vec_id, list(proj ORDER BY comp) AS v FROM proj GROUP BY 1
       |),
       |q AS (
       |  SELECT vec_id AS query_id, v AS qv, sqrt(list_dot_product(v, v)) AS qn
       |  FROM e WHERE vec_id < $nQueries
       |)${pqSubCtes(m, k, pqIters, p)},
       |scored AS (
       |  SELECT l.query_id, co.vec_id,
       |         sum(l.pdot) AS sdot, sum(l.pn2) AS sn2, max(l.qn) AS qn
       |  FROM codes co JOIN lut l ON co.s = l.s AND co.code = l.cid
       |  WHERE l.query_id <> co.vec_id
       |  GROUP BY 1, 2
       |),
       |approx AS (
       |  SELECT query_id, vec_id AS neighbor_id,
       |    round((sdot / 100000000.0) / (qn * sqrt(sn2 / 100000000.0)), 6) AS sim
       |  FROM scored
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
       |  FROM approx
       |)
       |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
       |FROM ranked WHERE rank <= $topK ORDER BY query_id, rank""".stripMargin

  /** WITH-prefix for the ridge oracles: replay [[graft.operators.Ridge.fit]]
    * — q31's feature derivations, quantized means/variances,
    * standardization (sd=0 guard mirrored), the 3x3 standardized moment
    * matrix + moment vector, and the fixed-count gradient loop as 1-row
    * scalar-column CTEs. Defines `rf`, `rmu`, `rsd`, `rz`, `rab`, and
    * `w$iters`.
    */
  // `src` parameterizes the training table (q160 fits on the pipeline's
  // balanced survivors); emitted WITHOUT the leading WITH so callers can
  // compose it after their own CTEs
  private[queries] def ridgeCtes(iters: Int, lr: Double, lambda: Double,
                                 src: String = "documents"): String = {
    def z(i: Int) = s"CASE WHEN s$i = 0 THEN 0.0 ELSE (x$i - m$i) / s$i END"
    def aName(i: Int, j: Int) = s"a_${math.min(i, j)}_${math.max(i, j)}"
    val loop = (1 to iters).map { t =>
      val aws = (0 until 3).map { i =>
        (0 until 3).map(j =>
          s"CAST(floor(${aName(i, j)} * w$j * 100000000.0) AS BIGINT)")
          .mkString("(", " + ", ") / 100000000.0")
      }
      s""",
         |w$t AS MATERIALIZED (
         |  SELECT
         |    round(w0 - $lr * (${aws(0)} - b_0 + $lambda * w0), 6) AS w0,
         |    round(w1 - $lr * (${aws(1)} - b_1 + $lambda * w1), 6) AS w1,
         |    round(w2 - $lr * (${aws(2)} - b_2 + $lambda * w2), 6) AS w2
         |  FROM w${t - 1} CROSS JOIN rab
         |)""".stripMargin
    }.mkString
    s"""rf AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x0,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS x1,
       |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS x2,
       |    CAST(n_chars AS DOUBLE) AS y
       |  FROM $src
       |),
       |rn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM rf),
       |rmu AS MATERIALIZED (
       |  SELECT
       |    CAST(sum(CAST(floor(x0 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS m0,
       |    CAST(sum(CAST(floor(x1 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS m1,
       |    CAST(sum(CAST(floor(x2 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS m2,
       |    CAST(sum(CAST(floor(y * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS my
       |  FROM rf
       |),
       |rsd AS MATERIALIZED (
       |  SELECT
       |    sqrt(CAST(sum(CAST(floor((x0 - m0) * (x0 - m0) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0) AS s0,
       |    sqrt(CAST(sum(CAST(floor((x1 - m1) * (x1 - m1) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0) AS s1,
       |    sqrt(CAST(sum(CAST(floor((x2 - m2) * (x2 - m2) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0) AS s2,
       |    sqrt(CAST(sum(CAST(floor((y - my) * (y - my) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0) AS sy
       |  FROM rf CROSS JOIN rmu
       |),
       |rz AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    ${z(0)} AS z0, ${z(1)} AS z1, ${z(2)} AS z2,
       |    CASE WHEN sy = 0 THEN 0.0 ELSE (y - my) / sy END AS zy
       |  FROM rf CROSS JOIN rmu CROSS JOIN rsd
       |),
       |rab AS MATERIALIZED (
       |  SELECT
       |    CAST(sum(CAST(floor(z0 * z0 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS a_0_0,
       |    CAST(sum(CAST(floor(z0 * z1 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS a_0_1,
       |    CAST(sum(CAST(floor(z0 * z2 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS a_0_2,
       |    CAST(sum(CAST(floor(z1 * z1 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS a_1_1,
       |    CAST(sum(CAST(floor(z1 * z2 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS a_1_2,
       |    CAST(sum(CAST(floor(z2 * z2 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS a_2_2,
       |    CAST(sum(CAST(floor(z0 * zy * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS b_0,
       |    CAST(sum(CAST(floor(z1 * zy * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS b_1,
       |    CAST(sum(CAST(floor(z2 * zy * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM rn) / 100000000.0 AS b_2
       |  FROM rz
       |),
       |w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)$loop""".stripMargin
  }

  /** DuckDB replay of [[graft.operators.Logit.fit]] — the classifier twin
    * of [[ridgeCtes]]. Differences from ridge: the label is the binary
    * "quality_score >= 0.3" verdict (derived from the same features by
    * identical IEEE ops, so both engines agree on every label), only the
    * FEATURES standardize, and each of the `iters` gradient rounds is a
    * DATA pass: per-row margin as summed floor(z_i*w_i*1e8) BIGINT terms,
    * the ALGEBRAIC sigmoid 0.5 + 0.5*t/(1+|t|) (no libm anywhere — exp's
    * last ulp differs across builds, +,*,/,abs do not), residual sums as
    * quantized BIGINT partials, and the iterate re-rounded to 6 decimals.
    * Defines lmu/lsd (moments), lz (standardized frame), v<iters>
    * (final weights w0..w2 + bias bb).
    */
  private[queries] def logitCtes(iters: Int, lr: Double, lambda: Double,
                                 src: String = "documents"): String = {
    def z(i: Int) = s"CASE WHEN s$i = 0 THEN 0.0 ELSE (x$i - m$i) / s$i END"
    val loop = (1 to iters).map { t =>
      s""",
         |gr$t AS MATERIALIZED (
         |  SELECT
         |    CAST(sum(CAST(floor(z0 * (pp - y) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS g0,
         |    CAST(sum(CAST(floor(z1 * (pp - y) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS g1,
         |    CAST(sum(CAST(floor(z2 * (pp - y) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS g2,
         |    CAST(sum(CAST(floor((pp - y) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS gb
         |  FROM (
         |    SELECT z0, z1, z2, y, 0.5 + 0.5 * tt / (1 + abs(tt)) AS pp
         |    FROM (
         |      SELECT lz.*,
         |        (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
         |         + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
         |         + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
         |      FROM lz CROSS JOIN v${t - 1})
         |  )
         |),
         |v$t AS MATERIALIZED (
         |  SELECT
         |    round(w0 - $lr * (g0 + $lambda * w0), 6) AS w0,
         |    round(w1 - $lr * (g1 + $lambda * w1), 6) AS w1,
         |    round(w2 - $lr * (g2 + $lambda * w2), 6) AS w2,
         |    round(bb - $lr * gb, 6) AS bb
         |  FROM v${t - 1} CROSS JOIN gr$t
         |)""".stripMargin
    }.mkString
    s"""lf AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS x0,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS x1,
       |    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE)
       |      / len(string_split_regex(trim(text), '\\s+')) AS x2,
       |    CASE WHEN least(1.0, CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) / 100.0)
       |      * (1.0 - abs(CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
       |          x -> list_contains(['the','a','of','and','in','to','is'], x))) AS DOUBLE)
       |          / len(string_split_regex(trim(text), '\\s+')) - 0.4)) >= 0.3
       |      THEN 1.0 ELSE 0.0 END AS y
       |  FROM $src
       |),
       |lcnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM lf),
       |lmu AS MATERIALIZED (
       |  SELECT
       |    CAST(sum(CAST(floor(x0 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS m0,
       |    CAST(sum(CAST(floor(x1 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS m1,
       |    CAST(sum(CAST(floor(x2 * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0 AS m2
       |  FROM lf
       |),
       |lsd AS MATERIALIZED (
       |  SELECT
       |    sqrt(CAST(sum(CAST(floor((x0 - m0) * (x0 - m0) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0) AS s0,
       |    sqrt(CAST(sum(CAST(floor((x1 - m1) * (x1 - m1) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0) AS s1,
       |    sqrt(CAST(sum(CAST(floor((x2 - m2) * (x2 - m2) * 100000000.0) AS BIGINT)) AS DOUBLE) / (SELECT n FROM lcnt) / 100000000.0) AS s2
       |  FROM lf CROSS JOIN lmu
       |),
       |lz AS MATERIALIZED (
       |  SELECT doc_id, y, ${z(0)} AS z0, ${z(1)} AS z1, ${z(2)} AS z2
       |  FROM lf CROSS JOIN lmu CROSS JOIN lsd
       |),
       |v0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS bb)$loop""".stripMargin
  }

  /** Shared by q164/q171: the fitted model table over [[logitCtes]]' 30
    * gradient rounds (q171's stream-grown feature store and model store
    * round-trips must be invisible, so both register it verbatim).
    */
  private lazy val logitFitOracle: String =
    s"""WITH ${logitCtes(iters = 30, lr = 0.5, lambda = 0.001)}
       |SELECT * FROM (
       |  SELECT 0 AS i, 'n_words' AS feature, w0 AS w, m0 AS mu, s0 AS sd, bb AS bias
       |  FROM v30 CROSS JOIN lmu CROSS JOIN lsd
       |  UNION ALL
       |  SELECT 1, 'avg_word_len', w1, m1, s1, bb
       |  FROM v30 CROSS JOIN lmu CROSS JOIN lsd
       |  UNION ALL
       |  SELECT 2, 'stopword_ratio', w2, m2, s2, bb
       |  FROM v30 CROSS JOIN lmu CROSS JOIN lsd
       |) ORDER BY i""".stripMargin

  /** Shared by q165/q166: quantized scores, thresholded verdicts, and the
    * 6-decimal accuracy over [[logitCtes]]' fit (the store round-trip must
    * be invisible, so both register it verbatim).
    */
  private lazy val logitPredictOracle: String =
    s"""WITH ${logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
       |lp AS MATERIALIZED (
       |  SELECT doc_id, y,
       |    floor((0.5 + 0.5 * tt / (1 + abs(tt))) * 1000000.0 + 0.5) / 1000000.0 AS p
       |  FROM (
       |    SELECT lz.doc_id, lz.y,
       |      (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
       |       + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
       |       + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
       |    FROM lz CROSS JOIN v30)
       |),
       |lacc AS MATERIALIZED (
       |  SELECT floor(CAST(sum(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END) AS DOUBLE)
       |    / count(*) * 1000000.0 + 0.5) / 1000000.0 AS acc
       |  FROM lp
       |)
       |SELECT doc_id, p, p >= 0.5 AS pred, y, acc
       |FROM lp CROSS JOIN lacc ORDER BY doc_id""".stripMargin

  /** Shared by q148/q150: predictions + R^2 over [[ridgeCtes]]' fit (the
    * store round-trip must be invisible, so both register it verbatim).
    */
  private lazy val ridgePredictOracle: String =
    s"""WITH ${ridgeCtes(iters = 30, lr = 0.9, lambda = 0.001)},
       |pred AS MATERIALIZED (
       |  SELECT r.doc_id, r.y,
       |    my + sy * ((CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
       |      + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
       |      + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0) AS yhat
       |  FROM rz r CROSS JOIN w30 CROSS JOIN rmu CROSS JOIN rsd
       |),
       |r2c AS MATERIALIZED (
       |  SELECT
       |    CAST(sum(CAST(floor(((y - yhat) / sy) * ((y - yhat) / sy) * 100000000.0) AS BIGINT)) AS DOUBLE) AS sseq,
       |    CAST(sum(CAST(floor(((y - my) / sy) * ((y - my) / sy) * 100000000.0) AS BIGINT)) AS DOUBLE) AS sstq
       |  FROM pred CROSS JOIN rmu CROSS JOIN rsd
       |)
       |SELECT doc_id, y, yhat, round(1 - sseq / sstq, 6) AS r2
       |FROM pred CROSS JOIN r2c ORDER BY doc_id""".stripMargin

  private def pcaComponentsOracle(p: Int, iters: Int): String =
    s"""${pcaCtes(p, iters)}
       |SELECT CAST(comp AS INT) AS comp, CAST(dim AS INT) AS dim, w,
       |  round(eigval, 6) AS eigval,
       |  round(eigval / (SELECT tr FROM ptrace), 6) AS var_ratio
       |FROM comps ORDER BY comp, dim""".stripMargin

  private def pcaProjectOracle(p: Int, iters: Int): String =
    s"""${pcaCtes(p, iters)}$pcaProjCte
       |SELECT vec_id, CAST(comp AS INT) AS comp, proj
       |FROM proj ORDER BY vec_id, comp""".stripMargin

  /** q140's oracle: recall@k of brute-force cosine in the PCA-projected
    * space vs brute-force truth in the full space (the annRecallOracle
    * shape over the PCA chain; no mirror of the Spark assert_true floor).
    */
  private def pcaRecallOracle(p: Int, iters: Int, k: Int): String =
    s"""${pcaCtes(p, iters)}$pcaProjCte,
       |pvn AS MATERIALIZED (
       |  SELECT vec_id, pv, sqrt(list_dot_product(pv, pv)) AS pn
       |  FROM (SELECT vec_id, list(proj ORDER BY comp) AS pv FROM proj GROUP BY 1)
       |),
       |proj_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    round(list_dot_product(q.pv, c.pv) / (q.pn * c.pn), 6) AS sim
       |  FROM pvn q JOIN pvn c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 100
       |),
       |proj_topk AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
       |    FROM proj_scored) WHERE rk <= $k
       |),
       |pb AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM pe),
       |brute_scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS true_id,
       |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
       |  FROM pb q JOIN pb c ON q.vec_id <> c.vec_id
       |  WHERE q.vec_id < 100
       |),
       |brute_topk AS (
       |  SELECT query_id, true_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, true_id ASC) AS rk
       |    FROM brute_scored) WHERE rk <= $k
       |),
       |per AS (
       |  SELECT t.query_id,
       |    CAST(sum(CASE WHEN i.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
       |  FROM brute_topk t LEFT JOIN proj_topk i
       |    ON t.query_id = i.query_id AND t.true_id = i.neighbor_id
       |  GROUP BY 1
       |),
       |agg AS (
       |  SELECT CAST(sum(n_hits) AS BIGINT) AS sum_hits, count(*) AS n_queries FROM per
       |)
       |SELECT query_id, n_hits,
       |  round(n_hits / $k.0, 6) AS recall,
       |  round(sum_hits / ($k.0 * n_queries), 6) AS mean_recall
       |FROM per CROSS JOIN agg ORDER BY query_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q24_dedup_exact" ->
      """SELECT md5(lower(text)) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "q66_text_repetition" ->
      """WITH counts AS (
        |  SELECT doc_id, w AS word, count(*) AS cnt
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents)
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(sum(cnt) AS BIGINT) AS n_words,
        |  count(*) AS n_distinct,
        |  round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS top_word_frac,
        |  round(1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) AS dup_word_frac,
        |  (CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) <= 0.2
        |    AND 1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) <= 0.7) AS keep
        |FROM counts GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q25_dedup_ngram" ->
      s"""WITH $triCte,
         |df AS (SELECT shingle, count(*) AS df FROM tri GROUP BY 1),
         |sizes AS (SELECT doc_id, count(*) AS n_sh FROM tri GROUP BY 1),
         |rare AS (SELECT t.doc_id, t.shingle FROM tri t JOIN df USING (shingle) WHERE df.df <= 5),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM tri a JOIN tri b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1,2
         |)
         |SELECT c.doc_a, c.doc_b, round(i.inter / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
         |FROM cand c JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |JOIN sizes sa ON sa.doc_id = c.doc_a
         |JOIN sizes sb ON sb.doc_id = c.doc_b
         |WHERE i.inter / (sa.n_sh + sb.n_sh - i.inter) >= 0.6
         |ORDER BY 1,2""".stripMargin,
    "q26_dedup_minhash" -> minhashOracle,
    // The documented increment-parity contract: pairs accumulated by the
    // batched store equal the uncapped batch miner over the whole corpus,
    // so the lifecycle gate shares q26's oracle verbatim.
    "q124_minhash_store_lifecycle" -> minhashOracle,
    // the uncapped mine re-rooted at snapshot B: the retired+re-appended
    // store must be indistinguishable from a from-scratch mine over the
    // moved corpus
    "q178_dedup_delta_maintenance" ->
      minhashOracleOver("b", snapshotBSql + ",\n"),
    // q107's probe with the final assignment re-rooted at the derived
    // embedding snapshot (fit stays on A — the store's frozen geometry):
    // the retired+re-appended+compacted IVF store must answer exactly
    // like a fit-on-A/assign-B search computed from scratch
    "q179_ann_ivf_delta" ->
      s"""${kmeansAsgCtes(numCentroids = 8, iters = 3,
             extraCtes = embSnapshotBCtes, finalSrc = "bb")},
         |$nprobeOracleBody""".stripMargin,
    // q107's probe with the fit frozen on A and the assignment re-rooted
    // at the TWICE-derived snapshot C — the store after two full delta
    // cycles (the second closed by a minor compaction with its retirement
    // ledger pending) must answer as if rebuilt from scratch
    "q195_ann_ivf_delta2" ->
      s"""${kmeansAsgCtes(numCentroids = 8, iters = 3,
             extraCtes = embSnapshotBCtes + embSnapshotCCtes, finalSrc = "cc")},
         |$nprobeOracleBody""".stripMargin,
    // q117's search re-rooted at snapshot B: signatures are pure functions
    // of the stored geometry, so the store after retire → re-append →
    // compact must probe bit-identical to the monolithic search over the
    // moved corpus
    "q180_ann_lsh_delta" -> lshStoreOracleOver("bb", embSnapshotBCtes),

    // the vacuumed store must probe bit-identically: q180's oracle verbatim
    "q232_ann_lsh_vacuum" -> lshStoreOracleOver("bb", embSnapshotBCtes),
    // q117's search re-rooted at the TWICE-derived snapshot C — the LSH
    // store after two full delta cycles (the second closed by a minor
    // compaction with its retirement ledger pending, over bases cycle 1's
    // full compaction relocated) must probe as if rebuilt from scratch
    "q201_ann_lsh_delta2" ->
      lshStoreOracleOver("cc", embSnapshotBCtes + embSnapshotCCtes),
    // q131's ADC ranking with codebooks fit on A (the store's frozen
    // geometry) and the encode re-rooted at snapshot B: the retired +
    // re-appended + compacted PQ store must answer exactly like a
    // fit-on-A/encode-B search computed from scratch
    "q181_ann_pq_delta" -> pqAdcOracle(m = 4, k = 8, iters = 2, dim = 64,
      nQueries = 10, topK = 5, extraCtes = embSnapshotBCtes,
      encodeSrc = "eb2", querySrc = "eb2"),
    // q131's ADC ranking with codebooks fit on A and the encode re-rooted
    // at the TWICE-derived snapshot C — the PQ store after two delta
    // cycles (the second closed by a minor compaction with its ledger
    // pending, over bases cycle 1's full compaction relocated)
    "q202_ann_pq_delta2" -> pqAdcOracle(m = 4, k = 8, iters = 2, dim = 64,
      nQueries = 10, topK = 5, extraCtes = embSnapshotBCtes + embSnapshotCCtes,
      encodeSrc = "ec2", querySrc = "ec2"),
    // per-doc kill matrix: all four rule verdicts recomputed from the
    // q31/q66/q96 published formulas, first_fail in pipeline order
    "q187_filter_attribution" ->
      s"""$filterAttCtes
         |SELECT doc_id, n_words, round(qs, 6) AS quality_score,
         |  pass_length, pass_quality, pass_repetition, pass_dupngram,
         |  CASE WHEN NOT pass_length THEN '0_length'
         |       WHEN NOT pass_quality THEN '1_quality'
         |       WHEN NOT pass_repetition THEN '2_repetition'
         |       WHEN NOT pass_dupngram THEN '3_dupngram'
         |       ELSE 'pass' END AS first_fail,
         |  (pass_length AND pass_quality AND pass_repetition AND pass_dupngram)
         |    AS kept
         |FROM att ORDER BY doc_id""".stripMargin,
    // the sequential-chain funnel over the same attribution frame
    "q188_filter_funnel" ->
      s"""$filterAttCtes,
         |ff AS (
         |  SELECT CASE WHEN NOT pass_length THEN '0_length'
         |              WHEN NOT pass_quality THEN '1_quality'
         |              WHEN NOT pass_repetition THEN '2_repetition'
         |              WHEN NOT pass_dupngram THEN '3_dupngram'
         |              ELSE 'pass' END AS stage
         |  FROM att
         |),
         |stages AS (
         |  SELECT * FROM (VALUES ('0_length'), ('1_quality'),
         |    ('2_repetition'), ('3_dupngram')) v(stage)
         |),
         |kills AS (
         |  SELECT stage, CAST(count(*) AS BIGINT) AS n_killed FROM ff
         |  WHERE stage <> 'pass' GROUP BY 1
         |),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM ff),
         |cum AS (
         |  SELECT s.stage, coalesce(k.n_killed, 0) AS n_killed,
         |    CAST(coalesce(sum(coalesce(k.n_killed, 0)) OVER (ORDER BY s.stage
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS killed_before
         |  FROM stages s LEFT JOIN kills k USING (stage)
         |)
         |SELECT stage,
         |  CAST(n_total - killed_before AS BIGINT) AS n_in,
         |  CAST(n_killed AS BIGINT) AS n_killed,
         |  CAST(n_total - killed_before - n_killed AS BIGINT) AS n_out
         |FROM cum CROSS JOIN tot ORDER BY stage""".stripMargin,
    // DSIR importance weights: target/raw hashed uni+bigram bucket models
    // (add-one smoothing, m = 1024), per-bucket LLR quantized to integer
    // micro-nats, per-doc integer sums — the full fit + scoring replayed
    "q182_dsir_weights" ->
      s"""$dsirCtes
         |SELECT doc_id, n_grams, dsir6, avg_llr
         |FROM scored ORDER BY doc_id""".stripMargin,
    // the resampling gate: algebraic squash -> ppm floor -> hex60 draw
    "q183_dsir_sample" -> (dsirCtes + dsirGateTail),
    // the store round-trip must be invisible: build-on-prefix + two
    // appends + compact == the monolithic fit, so q183's oracle VERBATIM
    "q184_dsir_store" -> (dsirCtes + dsirGateTail),
    // stream-grown store, same invisibility contract (q130's convention)
    "q185_dsir_streamed" -> (dsirCtes + dsirGateTail),
    // delta-maintained store scoring the moved corpus: q183's oracle
    // re-rooted at the derived snapshot (the q177 treatment; the target
    // rule is id-based so it survives text revisions)
    "q186_dsir_delta" ->
      (dsirCtesOver("b", "doc_id % 4 = 0", snapshotBSql + ",\n") + dsirGateTail),
    "q27_dedup_simhash" ->
      s"""WITH tok2 AS (
         |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
         |),
         |th AS (SELECT doc_id, ${hex60Sql("tok")} AS h FROM tok2),
         |bitsums AS (
         |  SELECT doc_id, t.b AS b, sum(CASE WHEN (h >> t.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |  FROM th, unnest(generate_series(0, 59)) AS t(b) GROUP BY 1,2
         |),
         |sh AS (
         |  SELECT doc_id, sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS simhash
         |  FROM bitsums GROUP BY 1
         |),
         |banded AS (
         |  SELECT doc_id, simhash, bb.band AS band, (simhash >> (bb.band * 15)) & 32767 AS band_val
         |  FROM sh, unnest(generate_series(0, 3)) AS bb(band)
         |),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS ha, b.simhash AS hb
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
         |ORDER BY 1,2""".stripMargin,
    "q28_dedup_embcos" ->
      """WITH e AS (
        |  SELECT vec_id, label, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) /
        |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
        |ORDER BY 1,2""".stripMargin,
    "q29_ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
        |),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
        |  FROM e q JOIN e c ON q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q30_ann_lsh" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v,
        |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
        |    + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
        |    + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
        |    + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
        |    + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END) AS bucket
        |  FROM embeddings
        |),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, c.v) /
        |          (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
        |  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q31_text_quality" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_words,
        |    length(regexp_replace(text, '\s', '', 'g')) AS nsl,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS stop_cnt,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS dig
        |  FROM documents
        |)
        |SELECT doc_id, n_words,
        |  round(CAST(nsl AS DOUBLE) / n_words, 6) AS avg_word_len,
        |  round(CAST(stop_cnt AS DOUBLE) / n_words, 6) AS stopword_ratio,
        |  round(CAST(dig AS DOUBLE) / greatest(nsl, 1), 6) AS digit_ratio,
        |  round(least(1.0, n_words / 100.0) * (1.0 - abs(CAST(stop_cnt AS DOUBLE) / n_words - 0.4)), 6) AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,
    "q32_text_langid" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['der','und','die','nicht','ist'], x))) AS s_de,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['the','and','of','is','a'], x))) AS s_en,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['el','la','de','y','que'], x))) AS s_es,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['le','la','et','les','des'], x))) AS s_fr
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
        |       WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
        |       WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |       WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |       ELSE 'fr' END AS pred_lang,
        |  greatest(s_de, s_en, s_es, s_fr) AS top_score
        |FROM s ORDER BY doc_id""".stripMargin,
    "q33_text_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
        |  length(text) AS n_chars_txt
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_text_fingerprint" ->
      s"""WITH nrm AS (
         |  SELECT doc_id, lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm FROM documents
         |),
         |codes AS (
         |  SELECT doc_id, norm,
         |    list_transform(string_split(norm, ''), c -> ascii(c)) || [0,0,0,0,0,0,0,0] AS cs
         |  FROM nrm
         |)
         |SELECT doc_id, md5(norm) AS fp_md5,
         |  list_min([${TextOps.polyTerms(8, "::BIGINT")(j => s"cs[i + $j]")}
         |            FOR i IN generate_series(1, greatest(length(norm) - 7, 1))]) AS winnow_min
         |FROM codes ORDER BY doc_id""".stripMargin,
    "q35_mm_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  sha256(text) AS sha256,
        |  CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
        |  CAST(CAST(octet_length(encode(text)) AS BIGINT) * 7 % 480 + 16 AS INT) AS height,
        |  CAST(octet_length(encode(text)) % 32 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q155_image_dhash" ->
      s"""$dhashCtes
         |SELECT vec_id, dhash, TRUE AS decoded FROM dh ORDER BY vec_id""".stripMargin,
    "q157_image_neardup" ->
      s"""$dhashCtes,
         |banded AS (
         |  SELECT vec_id, dhash,
         |    ((dhash >> (b.band * 16)) & 65535) + b.band * 65536 AS bkey
         |  FROM dh, unnest(generate_series(0, 3)) AS b(band)
         |),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b,
         |         a.dhash AS ha, b.dhash AS hb
         |  FROM banded a JOIN banded b ON a.bkey = b.bkey AND a.vec_id < b.vec_id
         |)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(ha, hb)) <= 8
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the GIF frames' closed form: frame f samples dimension
    // (9y + x + 7f) mod d — the q155 pixel/dHash replay with a frame axis
    "q161_frame_dhash" ->
      """WITH base AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
        |),
        |cells AS (
        |  SELECT b.vec_id, ff.f, t.y, u.x,
        |    CAST(floor(least(greatest(
        |      (v[((t.y * 9 + u.x + ff.f * 7) % len(v)) + 1] + 3.0) / 6.0,
        |      0.0), 1.0) * 255.0) AS BIGINT) AS p
        |  FROM base b, unnest([0, 2]) AS ff(f),
        |       unnest(generate_series(0, 7)) AS t(y),
        |       unnest(generate_series(0, 8)) AS u(x)
        |),
        |dh AS (
        |  SELECT a.vec_id, a.f,
        |    CAST(sum(CASE WHEN a.p < b.p
        |                  THEN (CAST(1 AS BIGINT) << (a.y * 8 + a.x)) ELSE 0 END)
        |         AS BIGINT) AS dhash
        |  FROM cells a JOIN cells b
        |    ON a.vec_id = b.vec_id AND a.f = b.f AND a.y = b.y AND b.x = a.x + 1
        |  WHERE a.x < 8 AND NOT (a.y = 7 AND a.x = 7)
        |  GROUP BY 1, 2
        |)
        |SELECT vec_id, CAST(f AS INT) AS frame_idx, dhash, TRUE AS decoded
        |FROM dh ORDER BY vec_id, frame_idx""".stripMargin,
    // PCM16 closed form: sample j = floor(clamp(v[j mod d]/3, -1, 1)*32767),
    // windows of 64 over 256 samples — exact integer aggregates
    "q162_audio_windows" ->
      """WITH base AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
        |),
        |smp AS (
        |  SELECT b.vec_id, t.j, t.j // 64 AS win,
        |    CAST(floor(least(greatest(v[(t.j % len(v)) + 1] / 3.0, -1.0), 1.0)
        |               * 32767.0) AS INT) AS s
        |  FROM base b, unnest(generate_series(0, 255)) AS t(j)
        |)
        |SELECT vec_id, CAST(win AS INT) AS win,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(min(s) AS INT) AS min_s, CAST(max(s) AS INT) AS max_s,
        |  CAST(sum(s) AS BIGINT) AS sum_s,
        |  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) AS sum_sq,
        |  TRUE AS decoded
        |FROM smp GROUP BY 1, 2 ORDER BY vec_id, win""".stripMargin,
    "q62_bm25_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |lens AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len FROM tf GROUP BY 1),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |corpus AS (SELECT count(*) AS n_docs, CAST(sum(doc_len) AS DOUBLE) / count(*) AS avg_len
        |           FROM lens),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, lens.doc_len,
        |    floor(
        |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
        |      * ((tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * doc_len / avg_len)))
        |      * 1e6 + 0.5) / 1e6 AS bm25
        |  FROM tf JOIN dfx USING (term) JOIN lens USING (doc_id) CROSS JOIN corpus
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, term ASC) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, term, tf, doc_len, bm25, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q154_tfidf_ann" ->
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents
        |),
        |toks AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS term
        |  FROM w, unnest(generate_series(1, len(ws) - 2)) AS t(i)
        |  WHERE len(ws) >= 3
        |),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    floor(tf.tf * ln(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5) / 1e6 AS tfidf
        |  FROM tf JOIN dfx USING (term) CROSS JOIN nd
        |),
        |kept AS (
        |  SELECT s.doc_id, s.term, s.tfidf
        |  FROM scored s JOIN dfx USING (term) WHERE dfx.df <= 20
        |),
        |norms AS (
        |  SELECT * FROM (
        |    SELECT doc_id,
        |      sqrt(CAST(sum(CAST(floor(tfidf * tfidf * 100000000.0) AS BIGINT)) AS DOUBLE)
        |           / 100000000.0) AS nrm
        |    FROM kept GROUP BY 1
        |  ) WHERE nrm > 0.0
        |),
        |pairs AS (
        |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
        |    CAST(sum(CAST(floor(q.tfidf * c.tfidf * 100000000.0) AS BIGINT)) AS BIGINT) AS sdot
        |  FROM kept q JOIN kept c ON q.term = c.term AND q.doc_id <> c.doc_id
        |  WHERE q.doc_id < 20
        |  GROUP BY 1, 2
        |),
        |sims AS (
        |  SELECT p.query_id, p.neighbor_id,
        |    round((CAST(p.sdot AS DOUBLE) / 100000000.0) / (nq.nrm * nc.nrm), 6) AS sim
        |  FROM pairs p
        |  JOIN norms nq ON p.query_id = nq.doc_id
        |  JOIN norms nc ON p.neighbor_id = nc.doc_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM sims
        |)
        |SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, sim
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q61_tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents
        |),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    floor(tf.tf * ln(CAST(n_docs AS DOUBLE) / df) * 1e6 + 0.5) / 1e6 AS tfidf
        |  FROM tf JOIN dfx USING (term) CROSS JOIN nd
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, term, tf, tfidf, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q59_hash_split" ->
      s"""WITH b AS (
         |  SELECT event_type, value,
         |         ${hex60Sql("event_id || ':' || user_id")} % 100 AS bucket
         |  FROM events
         |)
         |SELECT event_type,
         |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
         |  count(*) AS n, round(sum(value), 2) AS value_sum
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q60_quantize_int8" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
        |),
        |m AS (
        |  SELECT vec_id, v, greatest(list_max([abs(x) FOR x IN v]), 1e-12) AS m FROM e
        |)
        |SELECT vec_id, t.i AS dim, CAST(floor(v[t.i] * 127.0 / m + 0.5) AS INT) AS q8
        |FROM m, unnest(generate_series(1, len(v))) AS t(i)
        |ORDER BY vec_id, dim""".stripMargin,
    "q52_ann_ivf_kmeans" -> ivfKmeansOracle(numCentroids = 8, iters = 3, k = 3),
    "q138_pca_components" -> pcaComponentsOracle(p = 4, iters = 8),
    "q139_pca_project" -> pcaProjectOracle(p = 4, iters = 8),
    // the store round-trip must be invisible: q139's oracle verbatim
    "q143_pca_store" -> pcaProjectOracle(p = 4, iters = 8),
    "q152_pca_moments" -> pcaMomentsOracle(p = 4, iters = 8),
    // the stream-grown moments store must fit identically: q152 verbatim
    "q153_pca_moments_stream" -> pcaMomentsOracle(p = 4, iters = 8),
    // q152's raw-moments replay re-rooted at the surviving vectors — the
    // signed-delta retired store must fit as if the slice never streamed
    "q203_pca_moments_retired" ->
      pcaMomentsOracle(p = 4, iters = 8, where = "vec_id % 3 <> 1"),
    "q146_ann_pca_pq" -> pcaPqOracle(p = 16, pIters = 6, m = 4, k = 8,
      pqIters = 2, nQueries = 10, topK = 5),
    "q147_ridge_fit" ->
      s"""WITH ${ridgeCtes(iters = 30, lr = 0.9, lambda = 0.001)}
         |SELECT * FROM (
         |  SELECT 0 AS i, 'n_words' AS feature, w0 AS w, m0 AS mu, s0 AS sd,
         |         my AS y_mu, sy AS y_sd
         |  FROM w30 CROSS JOIN rmu CROSS JOIN rsd
         |  UNION ALL
         |  SELECT 1, 'avg_word_len', w1, m1, s1, my, sy
         |  FROM w30 CROSS JOIN rmu CROSS JOIN rsd
         |  UNION ALL
         |  SELECT 2, 'stopword_ratio', w2, m2, s2, my, sy
         |  FROM w30 CROSS JOIN rmu CROSS JOIN rsd
         |) ORDER BY i""".stripMargin,
    "q148_ridge_predict" -> ridgePredictOracle,
    // the store round-trip must be invisible: q148's oracle verbatim
    "q150_ridge_store" -> ridgePredictOracle,
    "q164_logit_fit" -> logitFitOracle,
    // the stream-grown feature store + model store round-trips must be
    // invisible: q164's monolithic-fit oracle verbatim
    "q171_logit_refit" -> logitFitOracle,
    "q165_logit_predict" -> logitPredictOracle,
    // the store round-trip must be invisible: q165's oracle verbatim
    "q166_logit_store" -> logitPredictOracle,
    "q168_logit_auc" ->
      s"""WITH ${logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
         |lp AS MATERIALIZED (
         |  SELECT doc_id, y,
         |    floor((0.5 + 0.5 * tt / (1 + abs(tt))) * 1000000.0 + 0.5) / 1000000.0 AS p
         |  FROM (
         |    SELECT lz.doc_id, lz.y,
         |      (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
         |    FROM lz CROSS JOIN v30)
         |),
         |grp AS (
         |  SELECT p,
         |    sum(CASE WHEN y = 1.0 THEN CAST(1 AS BIGINT) ELSE 0 END) AS np,
         |    sum(CASE WHEN y = 0.0 THEN CAST(1 AS BIGINT) ELSE 0 END) AS nn
         |  FROM lp GROUP BY p
         |),
         |cum AS (
         |  SELECT np, nn,
         |    coalesce(sum(nn) OVER (ORDER BY p
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
         |  FROM grp
         |)
         |SELECT CAST(sum(np) AS BIGINT) AS n_pos, CAST(sum(nn) AS BIGINT) AS n_neg,
         |  floor((CAST(sum(CAST(neg_below AS HUGEINT) * np) AS DOUBLE)
         |      + 0.5 * CAST(sum(CAST(nn AS HUGEINT) * np) AS DOUBLE))
         |    / CAST(sum(np) * sum(nn) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS auc
         |FROM cum""".stripMargin,
    "q167_logit_calibration" ->
      s"""WITH ${logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
         |lp AS MATERIALIZED (
         |  SELECT doc_id, y,
         |    floor((0.5 + 0.5 * tt / (1 + abs(tt))) * 1000000.0 + 0.5) / 1000000.0 AS p
         |  FROM (
         |    SELECT lz.doc_id, lz.y,
         |      (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
         |    FROM lz CROSS JOIN v30)
         |),
         |cb AS (
         |  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(floor(p * 100000000.0) AS BIGINT)) AS DOUBLE)
         |      / count(*) / 100000000.0 AS pr,
         |    CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) / count(*) AS yr
         |  FROM lp GROUP BY 1
         |)
         |SELECT bin, n,
         |  floor(pr * 1000000.0 + 0.5) / 1000000.0 AS avg_p,
         |  floor(yr * 1000000.0 + 0.5) / 1000000.0 AS avg_y,
         |  floor(abs(pr - yr) * 1000000.0 + 0.5) / 1000000.0 AS gap
         |FROM cb ORDER BY bin""".stripMargin,
    // q167's CTEs + the histogram-calibration bin join (p_cal = the bin's
    // 6-decimal empirical positive rate) — replays Logit.calibratedPredict
    "q169_logit_calibrated" ->
      s"""WITH ${logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
         |lp AS MATERIALIZED (
         |  SELECT doc_id, y,
         |    floor((0.5 + 0.5 * tt / (1 + abs(tt))) * 1000000.0 + 0.5) / 1000000.0 AS p
         |  FROM (
         |    SELECT lz.doc_id, lz.y,
         |      (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
         |    FROM lz CROSS JOIN v30)
         |),
         |cb AS (
         |  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
         |    floor(CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
         |      / 1000000.0 AS p_cal
         |  FROM lp GROUP BY 1
         |)
         |SELECT s.doc_id, s.p, s.bin, cb.p_cal
         |FROM (SELECT doc_id, p, CAST(least(floor(p * 10), 9) AS INT) AS bin FROM lp) s
         |JOIN cb USING (bin)
         |ORDER BY doc_id""".stripMargin,
    // ... + the hex60 keep-gate under floor(p_cal * 1e6): per bin the doc
    // count, kept count, and the exact expected kept mass sum(p_cal)
    "q170_calibrated_sample" ->
      s"""WITH ${logitCtes(iters = 30, lr = 0.5, lambda = 0.001)},
         |lp AS MATERIALIZED (
         |  SELECT doc_id, y,
         |    floor((0.5 + 0.5 * tt / (1 + abs(tt))) * 1000000.0 + 0.5) / 1000000.0 AS p
         |  FROM (
         |    SELECT lz.doc_id, lz.y,
         |      (CAST(floor(z0 * w0 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z1 * w1 * 100000000.0) AS BIGINT)
         |       + CAST(floor(z2 * w2 * 100000000.0) AS BIGINT)) / 100000000.0 + bb AS tt
         |    FROM lz CROSS JOIN v30)
         |),
         |cb AS (
         |  SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
         |    floor(CAST(sum(CAST(y AS BIGINT)) AS DOUBLE) / count(*) * 1000000.0 + 0.5)
         |      / 1000000.0 AS p_cal
         |  FROM lp GROUP BY 1
         |),
         |cal AS (
         |  SELECT s.doc_id, s.bin, cb.p_cal,
         |    CASE WHEN ${hex60Sql("CAST(s.doc_id AS VARCHAR)")} % 1000000
         |      < CAST(floor(cb.p_cal * 1000000.0) AS BIGINT) THEN 1 ELSE 0 END AS keep
         |  FROM (SELECT doc_id, p, CAST(least(floor(p * 10), 9) AS INT) AS bin FROM lp) s
         |  JOIN cb USING (bin)
         |)
         |SELECT bin, count(*) AS n, CAST(sum(keep) AS BIGINT) AS n_kept,
         |  CAST(sum(CAST(floor(p_cal * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         |    AS expected_kept
         |FROM cal GROUP BY bin ORDER BY bin""".stripMargin,
    "q140_pca_ann_recall" -> pcaRecallOracle(p = 16, iters = 6, k = 3),
    "q131_ann_pq_adc" -> pqAdcOracle(m = 4, k = 8, iters = 2, dim = 64,
      nQueries = 10, topK = 5),
    "q132_ann_recall_pq" -> pqRecallOracle(m = 8, k = 16, iters = 2, dim = 64,
      nQueries = 100, topK = 3),
    "q133_ann_ivfpq" -> ivfPqOracle(numCentroids = 8, iters = 3, m = 4, k = 8,
      pqIters = 2, dim = 64, nQueries = 10, topK = 3, nprobe = 2),
    // both stores' round-trips must be invisible: q133's oracle verbatim
    "q151_ann_ivfpq_stores" -> ivfPqOracle(numCentroids = 8, iters = 3, m = 4,
      k = 8, pqIters = 2, dim = 64, nQueries = 10, topK = 3, nprobe = 2),
    "q134_ann_pq_lifecycle" -> pqAdcOracle(m = 4, k = 8, iters = 2, dim = 64,
      nQueries = 10, topK = 5, fitWhere = "vec_id < 300"),
    // Recall@3 of the q52 IVF search vs the q29 brute-force scoring on the
    // vec_id < 100 query sample; `b` (double vectors + norms) comes from
    // kmeansAsgCtes and matches both engines' scoring exactly.
    "q106_ann_recall" -> annRecallOracle(
      """ivf_scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
        |  FROM asg3 q JOIN asg3 c ON q.cell = c.cell AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 100
        |),
        |ivf_topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
        |    FROM ivf_scored) WHERE rk <= 3
        |)""".stripMargin, k = 3),
    // nprobe=2 rows: query side takes the TWO nearest centroids (crn <= 2
    // over the final Lloyd scores a3); corpus side keeps its crn = 1 cell.
    "q107_ann_ivf_nprobe" -> nprobeOracle,
    // q112 probes the PERSISTED index built with q107's exact parameters,
    // so its rows — and therefore its oracle — are identical to q107's:
    // the store round-trip must be invisible to the search results.
    "q112_ann_ivf_store" -> nprobeOracle,
    // LSH recall twin: bucket from b's double-cast vectors (sign-identical
    // to the raw floats q30 buckets on); the kmeans CTE prefix is unused
    // here but harmless — DuckDB prunes unreferenced CTEs.
    "q110_ann_recall_lsh" -> annRecallOracle(
      """lshb AS (
        |  SELECT vec_id, v, n,
        |    (CASE WHEN v[1] > 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v[2] > 0 THEN 2 ELSE 0 END)
        |    + (CASE WHEN v[3] > 0 THEN 4 ELSE 0 END)
        |    + (CASE WHEN v[4] > 0 THEN 8 ELSE 0 END)
        |    + (CASE WHEN v[5] > 0 THEN 16 ELSE 0 END)
        |    + (CASE WHEN v[6] > 0 THEN 32 ELSE 0 END) AS bucket
        |  FROM b
        |),
        |ivf_scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
        |  FROM lshb q JOIN lshb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 100
        |),
        |ivf_topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
        |    FROM ivf_scored) WHERE rk <= 3
        |)""".stripMargin, k = 3),
    // Multi-table LSH recall twin: the hyperplane components replay the
    // SAME integer-hash construction as Similarity.lshPlanes, the per-plane
    // dot products run over identically-ordered double lists, and buckets
    // are integer shift sums — engine-exact end to end.
    "q111_ann_recall_lshmulti" -> annRecallOracle(
      s"""comps AS (
         |  SELECT tt.t AS t, jj.j AS j, dd.d AS d,
         |    CAST(${hex60Sql("CAST(tt.t AS VARCHAR) || ':' || CAST(jj.j AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR)")} % 2001 - 1000 AS DOUBLE) / 1000.0 AS h
         |  FROM unnest(generate_series(0, 3)) AS tt(t),
         |       unnest(generate_series(0, 5)) AS jj(j),
         |       unnest(generate_series(0, 63)) AS dd(d)
         |),
         |hp AS (SELECT t, j, list(h ORDER BY d) AS harr FROM comps GROUP BY 1, 2),
         |sig AS (
         |  SELECT b.vec_id, hp.t,
         |    sum(CASE WHEN list_dot_product(b.v, hp.harr) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(hp.j AS INT)) ELSE 0 END) AS bucket
         |  FROM b CROSS JOIN hp
         |  GROUP BY 1, 2
         |),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM sig q JOIN sig c
         |    ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100
         |),
         |ivf_scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    round(list_dot_product(qb.v, cb.v) / (qb.n * cb.n), 6) AS sim
         |  FROM cand JOIN b qb ON cand.query_id = qb.vec_id
         |            JOIN b cb ON cand.neighbor_id = cb.vec_id
         |),
         |ivf_topk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
         |    FROM ivf_scored) WHERE rk <= 3
         |)""".stripMargin, k = 3),
    // Row-level twin of the tuned 16x5 search, shared shape with q111's
    // derivation; q117 probes the PERSISTED signature store, so its rows
    // must equal the in-memory search — the store round-trip is invisible.
    "q117_ann_lsh_store" -> lshStoreOracle,
    // Signatures are per-vector pure functions, so the q122 lifecycle
    // (build prefix -> append remainder -> compact -> probe) must reproduce
    // the monolithic search exactly — q117's oracle verbatim.
    "q122_ann_lsh_lifecycle" -> lshStoreOracle,
    // Prefix-fit Lloyd + assign-everyone: the frozen-centroid append
    // semantics of the q119 lifecycle.
    "q119_ann_ivf_lifecycle" -> ivfLifecycleOracle,
    // Re-index heals the prefix-fit drift completely: after reindexIvf the
    // store must answer exactly like a monolithic full-corpus build, so the
    // oracle is q107's full-fit nprobe search verbatim.
    "q123_ann_ivf_reindex" -> nprobeOracle,
    // Re-tune leaves no trace of the old geometry: after reindexLsh to
    // 16x5 the store must answer exactly like a monolithic 16x5 build —
    // q117's oracle verbatim.
    "q125_ann_lsh_reindex" -> lshStoreOracle,
    // Tuned-config twin: identical plane/signature/candidate derivation as
    // q111's oracle, at 16 tables x 5 bits.
    "q114_ann_recall_lshtuned" -> annRecallOracle(
      s"""comps AS (
         |  SELECT tt.t AS t, jj.j AS j, dd.d AS d,
         |    CAST(${hex60Sql("CAST(tt.t AS VARCHAR) || ':' || CAST(jj.j AS VARCHAR) || ':' || CAST(dd.d AS VARCHAR)")} % 2001 - 1000 AS DOUBLE) / 1000.0 AS h
         |  FROM unnest(generate_series(0, 15)) AS tt(t),
         |       unnest(generate_series(0, 4)) AS jj(j),
         |       unnest(generate_series(0, 63)) AS dd(d)
         |),
         |hp AS (SELECT t, j, list(h ORDER BY d) AS harr FROM comps GROUP BY 1, 2),
         |sig AS (
         |  SELECT b.vec_id, hp.t,
         |    sum(CASE WHEN list_dot_product(b.v, hp.harr) > 0
         |             THEN (CAST(1 AS BIGINT) << CAST(hp.j AS INT)) ELSE 0 END) AS bucket
         |  FROM b CROSS JOIN hp
         |  GROUP BY 1, 2
         |),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM sig q JOIN sig c
         |    ON q.t = c.t AND q.bucket = c.bucket AND q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100
         |),
         |ivf_scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    round(list_dot_product(qb.v, cb.v) / (qb.n * cb.n), 6) AS sim
         |  FROM cand JOIN b qb ON cand.query_id = qb.vec_id
         |            JOIN b cb ON cand.neighbor_id = cb.vec_id
         |),
         |ivf_topk AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
         |    FROM ivf_scored) WHERE rk <= 3
         |)""".stripMargin, k = 3),
    "q108_ann_recall_nprobe" -> annRecallOracle(
      """probes AS (
        |  SELECT vec_id, v, n, cid AS cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
        |        FROM a3)
        |  WHERE crn <= 2
        |),
        |ivf_scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
        |  FROM probes q JOIN asg3 c ON q.cell = c.cell AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 100
        |),
        |ivf_topk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rk
        |    FROM ivf_scored) WHERE rk <= 3
        |)""".stripMargin, k = 3),
    "q42_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS v FROM embeddings
        |),
        |b AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n FROM e),
        |cent AS (SELECT vec_id AS cid, v AS cv, n AS cn FROM b WHERE vec_id < 8),
        |assign0 AS (
        |  SELECT b.vec_id, b.v, b.n, c.cid,
        |    round(list_dot_product(b.v, c.cv) / (b.n * c.cn), 6) AS csim
        |  FROM b CROSS JOIN cent c
        |),
        |assigned AS (
        |  SELECT vec_id, v, n, cid AS cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS crn
        |        FROM assign0)
        |  WHERE crn = 1
        |),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.cell AS cell,
        |    round(list_dot_product(q.v, c.v) / (q.n * c.n), 6) AS sim
        |  FROM assigned q JOIN assigned c ON q.cell = c.cell AND q.vec_id <> c.vec_id
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, neighbor_id, cell, CAST(rank AS INT) AS rank, sim
        |FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q75_contamination" ->
      s"""WITH $triCte,
         |bench AS (SELECT DISTINCT shingle FROM tri WHERE doc_id % 20 = 0),
         |corp AS (SELECT doc_id, shingle FROM tri WHERE doc_id % 20 <> 0),
         |agg AS (
         |  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |    CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
         |  FROM corp c LEFT JOIN bench b ON b.shingle = c.shingle
         |  GROUP BY 1
         |)
         |SELECT doc_id, n_shingles, n_overlap,
         |  round(n_overlap / n_shingles, 6) AS overlap_frac,
         |  (n_overlap / n_shingles) >= 0.5 AS contaminated
         |FROM agg ORDER BY doc_id""".stripMargin,
    "q76_seq_packing" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
        |    ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 32 AS shard
        |  FROM documents
        |),
        |c AS (
        |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
        |    PARTITION BY shard ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, shard, cum_excl // 512 AS bin,
        |  cum_excl - (cum_excl // 512) * 512 AS bin_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q77_vocab_topk" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents
        |),
        |stats AS (
        |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
        |    CAST(count(*) AS BIGINT) AS cf
        |  FROM terms GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
        |),
        |ranked AS (
        |  SELECT *, row_number() OVER (ORDER BY df DESC, cf DESC, term ASC) AS rank
        |  FROM stats
        |)
        |SELECT term, df, cf, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 200 ORDER BY rank""".stripMargin,
    "q79_pii_redact" ->
      s"""WITH enriched AS (
         |  SELECT doc_id, text || ' contact user' || doc_id || '@example.com or +1 (555) 010-'
         |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
         |  FROM documents
         |),
         |r AS (
         |  SELECT doc_id,
         |    len(regexp_extract_all(text, '${TextOps.EmailRe}')) AS n_emails,
         |    regexp_replace(text, '${TextOps.EmailRe}', '<EMAIL>', 'g') AS ne
         |  FROM enriched
         |)
         |SELECT doc_id,
         |  CAST(n_emails AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(ne, '${TextOps.PhoneRe}')) AS INT) AS n_phones,
         |  md5(regexp_replace(ne, '${TextOps.PhoneRe}', '<PHONE>', 'g')) AS redacted_md5
         |FROM r ORDER BY doc_id""".stripMargin,
    "q80_stratified_sample" ->
      s"""WITH b AS (
         |  SELECT event_type, value,
         |         ${hex60Sql("event_id || ':' || user_id")} % 1000 AS bucket
         |  FROM events
         |)
         |SELECT event_type, count(*) AS n_kept, round(sum(value), 2) AS value_kept
         |FROM b
         |WHERE bucket < CASE event_type WHEN 'view' THEN 100 WHEN 'click' THEN 500 ELSE 1000 END
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // τ=0.5 tempered language shares from exact integer token sums (sqrt
    // is IEEE-correctly-rounded on both engines; the rate expression runs
    // in the same left-to-right order as TextOps.temperatureGate), then
    // the hex60 keep gate under the quantized ppm threshold.
    "q173_lang_mixture" ->
      s"""WITH nw AS (
         |  SELECT doc_id, lang,
         |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words
         |  FROM documents
         |),
         |bl AS (
         |  SELECT lang, count(*) AS n_docs, sum(n_words) AS tok
         |  FROM nw GROUP BY 1
         |),
         |ls AS (
         |  SELECT lang, n_docs, tok,
         |    CAST(floor(sqrt(CAST(tok AS DOUBLE)) * 1000000.0) AS BIGINT) AS s6
         |  FROM bl
         |),
         |tot AS (SELECT sum(s6) AS s_tot, sum(tok) AS tok_all FROM ls),
         |rates AS (
         |  SELECT lang,
         |    CAST(floor(least(1.0,
         |      CAST(tok_all AS DOUBLE) * 0.5 * CAST(s6 AS DOUBLE)
         |        / CAST(s_tot AS DOUBLE) / CAST(tok AS DOUBLE)) * 1000000.0) AS BIGINT)
         |      AS thr_ppm
         |  FROM ls CROSS JOIN tot
         |),
         |g AS (
         |  SELECT n.lang, n.n_words, r.thr_ppm,
         |    CASE WHEN ${hex60Sql("CAST(n.doc_id AS VARCHAR)")} % 1000000 < r.thr_ppm
         |      THEN 1 ELSE 0 END AS keep
         |  FROM nw n JOIN rates r USING (lang)
         |)
         |SELECT lang, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS tok_total,
         |  max(thr_ppm) AS thr_ppm,
         |  CAST(sum(keep) AS BIGINT) AS n_kept,
         |  CAST(coalesce(sum(CASE WHEN keep = 1 THEN n_words END), 0) AS BIGINT) AS tok_kept
         |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    // Snapshot B derived in SQL (same slices), then the hash-compare
    // full-outer join — replays Dedup.corpusDelta's verdict per id.
    "q175_corpus_delta" ->
      s"""WITH a AS (SELECT doc_id, text FROM documents),
        |$snapshotBSql,
        |j AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |    md5(a.text) AS ha, md5(b.text) AS hb
        |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        |)
        |SELECT doc_id,
        |  CASE WHEN ha IS NULL THEN 'added'
        |       WHEN hb IS NULL THEN 'removed'
        |       WHEN ha <> hb THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM j ORDER BY doc_id""".stripMargin,

    // The FULL recompute over snapshot B (q31's quality SQL re-rooted at
    // the derived snapshot) — the incremental Spark path must land on it
    // exactly, proving delta-reuse converges to from-scratch.
    "q176_incremental_quality" ->
      s"""WITH $snapshotBSql,
        |f AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\\s+')) AS n_words,
        |    length(regexp_replace(text, '\\s', '', 'g')) AS nsl,
        |    len(list_filter(string_split_regex(trim(text), '\\s+'),
        |        x -> list_contains(['the','a','of','and','in','to','is'], x))) AS stop_cnt,
        |    length(regexp_replace(text, '[^0-9]', '', 'g')) AS dig
        |  FROM b
        |)
        |SELECT doc_id, n_words,
        |  round(CAST(nsl AS DOUBLE) / n_words, 6) AS avg_word_len,
        |  round(CAST(stop_cnt AS DOUBLE) / n_words, 6) AS stopword_ratio,
        |  round(CAST(dig AS DOUBLE) / greatest(nsl, 1), 6) AS digit_ratio,
        |  round(least(1.0, n_words / 100.0) * (1.0 - abs(CAST(stop_cnt AS DOUBLE) / n_words - 0.4)), 6) AS quality_score
        |FROM f ORDER BY doc_id""".stripMargin,

    "q209_drift_psi" -> psiMonolithicSql,

    // The drill-down: every (feature, bucket)'s own quantized PSI part —
    // the report row an operator acts on.
    "q221_drift_buckets" ->
      s"""WITH $snapshotBFullSql,
        |${psiCtesOver("documents", "bsnap", "")}
        |SELECT feature, bucket, ca, cb,
        |  floor(CAST(dnum * l6 AS DOUBLE)
        |    / (CAST(na + k AS DOUBLE) * CAST(nb + k AS DOUBLE)) + 0.5) / 1e6 AS psi_part
        |FROM term ORDER BY feature, bucket""".stripMargin,

    // The store-served report must equal the monolithic A->B one exactly
    // (bucket populations are additive longs: retire(old)+append(new)
    // sums to the fresh snapshot-B counts per bucket) — q209's oracle
    // text VERBATIM is the convergence proof.
    "q216_drift_store" -> psiMonolithicSql,

    "q210_shard_manifest" ->
      s"""WITH m AS (
        |  ${shardRowsOver("documents", 64)}
        |)
        |SELECT shard, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  bit_xor(fp) AS checksum
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // Snapshot B at the deb1x moduli (130/70/170 — ~2.6% delta), both
    // manifests at 256 shards, then the shard-status full-outer join.
    "q211_manifest_delta" ->
      s"""WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 70 = 2 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 130 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id % 170 = 5
        |),
        |ra AS (
        |  ${shardRowsOver("documents", 256)}
        |),
        |rb AS (
        |  ${shardRowsOver("b", 256)}
        |),
        |ma AS (SELECT shard, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_chars,
        |       bit_xor(fp) AS ck FROM ra GROUP BY 1),
        |mb AS (SELECT shard, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_chars,
        |       bit_xor(fp) AS ck FROM rb GROUP BY 1)
        |SELECT coalesce(ma.shard, mb.shard) AS shard,
        |  CASE WHEN mb.shard IS NULL THEN 'removed'
        |       WHEN ma.shard IS NULL THEN 'added'
        |       WHEN ma.ck <> mb.ck OR ma.n_docs <> mb.n_docs
        |         OR ma.sum_chars <> mb.sum_chars THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  coalesce(ma.n_docs, 0) AS n_docs_a, coalesce(mb.n_docs, 0) AS n_docs_b
        |FROM ma FULL OUTER JOIN mb ON ma.shard = mb.shard
        |ORDER BY 1""".stripMargin,

    // A FULL export of the small-delta snapshot B, manifested — the
    // convergence target the reuse+rewrite assembly must hash-match.
    "q217_incremental_export" ->
      s"""WITH b AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 70 = 2 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 130 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id % 170 = 5
        |),
        |m AS (
        |  ${shardRowsOver("b", 256)}
        |)
        |SELECT shard, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  bit_xor(fp) AS checksum
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    // Each day's event-type mix vs the previous day's — the q209 psi
    // arithmetic with the shifted day as the feature key (one row per
    // day that has a populated predecessor).
    "q220_daily_drift" -> dailyDriftSql,

    // the r14 verdict's item 3: q220 served from the ledgered per-day
    // count store must hash-equal the recompute-from-raw monitor — the
    // oracle IS q220's SQL, verbatim.
    "q225_daily_drift_served" -> dailyDriftSql,

    // the stream-grown count-delta store serves the same monitor
    "q228_daily_drift_streamed" -> dailyDriftSql,

    // retention + vacuum: the served report over a horizon-cut store
    // equals the monitor over events from the horizon on — and the
    // query's own in-flight replay of a vacuumed day must NOT land, or
    // a pre-horizon pair appears and this hash breaks.
    "q229_daily_drift_vacuum" -> dailyDriftSqlFrom(horizonDays = 10),

    "q222_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
        |),
        |st AS (
        |  SELECT doc_id, w, s.st AS start
        |  FROM t, unnest(generate_series(0, greatest(len(w) - 1, 0), 48)) AS s(st)
        |)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_idx,
        |  CAST(start AS BIGINT) AS start_tok,
        |  CAST(len(w[start + 1 : start + 64]) AS BIGINT) AS n_tok,
        |  md5(array_to_string(w[start + 1 : start + 64], ' ')) AS chunk_md5
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,

    // chunk (q222's CTE, md5-free) -> pack by exact chunk token counts
    // (q76's window over the synthetic chunk id) -> ledger (q214's
    // grouping with the id:bin_offset fingerprint).
    "q223_chunk_pack_ledger" -> chunkExportLedgerSql("documents"),

    // q223's chain verbatim, re-rooted at snapshot B: the incremental
    // assembly must equal the from-scratch export of B, bin for bin.
    "q224_incr_chunk_export" ->
      chunkExportLedgerSql("bsnap", s"$snapshotBFullSql,\n"),

    // the two-cycle chain: q223's SQL re-rooted at snapshot C — the
    // incremental artifacts must carry across generations exactly.
    "q226_incr_chunk_export2" ->
      chunkExportLedgerSql("csnap", s"$snapshotBFullSql,\n$snapshotCFullSql,\n"),

    // the streamed tail-grower must serve the IDENTICAL ledger the
    // monolithic chain computes over everything delivered
    "q227_packed_export_streamed" -> chunkExportLedgerSql("documents"),

    // the modulo opt-out: identical chain, shard = id % 32 instead of
    // the hash-balanced default (roles flipped in r17 — the hash key is
    // now the default everywhere; this pins the explicit opt-out)
    "q234_chunk_pack_modshard" -> chunkExportLedgerSql("documents",
      shardSql = "doc_id % 32"),

    // per-shard training-file utilization off the chunk-pack ledger:
    // integer fill_ppm so the division is exact on both engines
    "q233_pack_efficiency" ->
      s"""SELECT shard, CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(1000000 * sum(n_tokens) AS BIGINT) // (count(*) * 512) AS fill_ppm
        |FROM (${chunkExportLedgerSql("documents")}) pk
        |GROUP BY shard ORDER BY shard""".stripMargin,

    // the streamed export through a corpus move: q223's chain re-rooted
    // at the FINAL snapshot — tranche 1 revised (%7==2) and cut
    // (%13==3), tranche 2 verbatim. The store got there by stream +
    // in-place repack + stream; the oracle packs it from scratch.
    "q231_packed_export_moved" -> chunkExportLedgerSql("fsnap",
      """fsnap AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 2 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents
        |  WHERE doc_id <= 2 * (SELECT max(doc_id) FROM documents) // 3
        |    AND doc_id % 13 <> 3
        |  UNION ALL
        |  SELECT doc_id, text FROM documents
        |  WHERE doc_id > 2 * (SELECT max(doc_id) FROM documents) // 3
        |),
        |""".stripMargin),

    // The rebased second cycle must equal a from-scratch B-vs-C
    // comparison — exactly q212's b_c block, standalone.
    "q218_drift_cycle2" ->
      s"""WITH $snapshotBFullSql,
        |$snapshotCFullSql,
        |${psiCtesOver("bsnap", "csnap", "bc")}
        |SELECT feature, n_buckets, n_a, n_b, psi, $psiVerdictSql
        |FROM bcrep ORDER BY feature""".stripMargin,

    "q212_drift_cycles" ->
      s"""WITH $snapshotBFullSql,
        |$snapshotCFullSql,
        |${psiCtesOver("documents", "bsnap", "ab")},
        |${psiCtesOver("bsnap", "csnap", "bc")}
        |SELECT * FROM (
        |  SELECT 'a_b' AS cycle, feature, n_buckets, n_a, n_b, psi, $psiVerdictSql
        |  FROM abrep
        |  UNION ALL
        |  SELECT 'b_c', feature, n_buckets, n_a, n_b, psi, $psiVerdictSql
        |  FROM bcrep
        |) ORDER BY cycle, feature""".stripMargin,

    // Cell-population drift against FROZEN centroids: the q52 Lloyd fit
    // over snapshot A (asg2), snapshot B assigned to the same c2 set
    // (asg2x), then the q209 PSI arithmetic over the per-cell counts —
    // same micro-nat / HUGEINT-numerator discipline as psiCtesOver,
    // inlined because the populations come from assignments, not feature
    // buckets.
    "q213_ivf_cell_drift" ->
      s"""${kmeansAsgCtes(8, 2, extraCtes = embSnapshotBCtes)},
        |${assignCte(2, "c2", "bb", "x")},
        |cca AS (SELECT cell, count(*) AS ca FROM asg2 GROUP BY 1),
        |ccb AS (SELECT cell, count(*) AS cb FROM asg2x GROUP BY 1),
        |cnt AS (
        |  SELECT coalesce(cca.cell, ccb.cell) AS cell,
        |    CAST(coalesce(ca, 0) AS BIGINT) AS ca,
        |    CAST(coalesce(cb, 0) AS BIGINT) AS cb
        |  FROM cca FULL OUTER JOIN ccb ON cca.cell = ccb.cell
        |),
        |tot AS (
        |  SELECT count(*) AS k, CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb
        |  FROM cnt
        |),
        |term AS (
        |  SELECT t.k, t.na, t.nb,
        |    CAST(c.cb + 1 AS HUGEINT) * (t.na + t.k)
        |      - CAST(c.ca + 1 AS HUGEINT) * (t.nb + t.k) AS dnum,
        |    CAST(floor(ln(((c.cb + 1.0) * (t.na + t.k)) / ((c.ca + 1.0) * (t.nb + t.k)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS l6
        |  FROM cnt c CROSS JOIN tot t
        |),
        |rep AS (
        |  SELECT 'ivf_cell' AS feature, k AS n_buckets, na AS n_a, nb AS n_b,
        |    floor(CAST(sum(dnum * l6) AS DOUBLE)
        |      / (CAST(na + k AS DOUBLE) * CAST(nb + k AS DOUBLE)) + 0.5) / 1e6 AS psi
        |  FROM term GROUP BY 1, 2, 3, 4
        |)
        |SELECT feature, n_buckets, n_a, n_b, psi, $psiVerdictSql
        |FROM rep ORDER BY feature""".stripMargin,

    "q214_packed_ledger" ->
      s"""WITH ${packedCteOver("documents", "")}
        |SELECT shard, bin, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc,
        |  bit_xor(${hex60Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(bin_offset AS VARCHAR)")}) AS checksum
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q215_packed_ledger_delta" ->
      s"""WITH bsn AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 70 = 2 THEN text || ' rev2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 130 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, 'new ' || text FROM documents WHERE doc_id % 170 = 5
        |),
        |${packedCteOver("documents", "a")},
        |${packedCteOver("bsn", "b")},
        |la AS (
        |  SELECT shard, bin, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(doc_id) AS first_doc,
        |    bit_xor(${hex60Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(bin_offset AS VARCHAR)")}) AS ck
        |  FROM ap GROUP BY 1, 2
        |),
        |lb AS (
        |  SELECT shard, bin, count(*) AS n_docs,
        |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens, min(doc_id) AS first_doc,
        |    bit_xor(${hex60Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(bin_offset AS VARCHAR)")}) AS ck
        |  FROM bp GROUP BY 1, 2
        |)
        |SELECT coalesce(la.shard, lb.shard) AS shard,
        |  coalesce(la.bin, lb.bin) AS bin,
        |  CASE WHEN lb.n_docs IS NULL THEN 'removed'
        |       WHEN la.n_docs IS NULL THEN 'added'
        |       WHEN la.ck <> lb.ck OR la.n_docs <> lb.n_docs
        |         OR la.n_tokens <> lb.n_tokens
        |         OR la.first_doc <> lb.first_doc THEN 'changed'
        |       ELSE 'unchanged' END AS status,
        |  coalesce(la.n_docs, 0) AS n_docs_a, coalesce(lb.n_docs, 0) AS n_docs_b
        |FROM la FULL OUTER JOIN lb ON la.shard = lb.shard AND la.bin = lb.bin
        |ORDER BY 1, 2""".stripMargin
  )

  /** The q76 packing replay over any corpus relation, CTE-namespaced:
    * defines `${ns}p` = (doc_id, n_tokens, shard, bin, bin_offset) at the
    * 512-token / 32-shard config — one definition shared by the q214/q215
    * ledger oracles so the packing text can never skew from q76's.
    */
  private def packedCteOver(rel: String, ns: String): String =
    s"""${ns}t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       |    ${hex60Sql("CAST(doc_id AS VARCHAR)")} % 32 AS shard
       |  FROM $rel
       |),
       |${ns}c AS (
       |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
       |    PARTITION BY shard ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
       |  FROM ${ns}t
       |),
       |${ns}p AS (
       |  SELECT doc_id, n_tokens, shard, cum_excl // 512 AS bin,
       |    cum_excl - (cum_excl // 512) * 512 AS bin_offset
       |  FROM ${ns}c
       |)""".stripMargin

  /** q220 and q225 share this oracle: each day's event-type mix vs
    * the previous day's (the q209 psi arithmetic with the shifted day
    * as the feature key) — q225 must serve the IDENTICAL frame from
    * its count ledger.
    */
  /** The chunk -> pack -> ledger chain (q222's chunk CTE md5-free, q76's
    * packing window over the synthetic chunk id, q214's grouping with the
    * id:bin_offset fingerprint), parameterized on the source snapshot:
    * q223/q227 root it at `documents`, q224 at `bsnap`, q226 at `csnap`.
    */
  /** The chunk → pack CTE chain (t0/ch/t/c/p), shared by the export
    * ledger oracles and the flagship-v3 per-doc placement oracle. `p` =
    * (doc_id [folded], n_tokens, shard, bin, bin_offset) at the
    * 64/48-chunk, 512-budget, 32-shard config.
    */
  private[queries] def chunkPackCtes(source: String,
                                     shardSql: String = "",
                                     ns: String = ""): String = {
    // the default mirrors packSequences' hash-balanced routing; the
    // modulo opt-out (q234) passes its key explicitly
    val shard =
      if (shardSql.nonEmpty) shardSql
      else s"${hex60Sql("CAST(doc_id AS VARCHAR)")} % 32"
    s"""${ns}t0 AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM $source
      |),
      |${ns}ch AS (
      |  SELECT doc_id * 1000000 + (s.st // 48) AS doc_id,
      |    CAST(len(w[s.st + 1 : s.st + 64]) AS BIGINT) AS n_tokens
      |  FROM ${ns}t0, unnest(generate_series(0, greatest(len(w) - 1, 0), 48)) AS s(st)
      |),
      |${ns}t AS (SELECT doc_id, n_tokens, $shard AS shard FROM ${ns}ch),
      |${ns}c AS (
      |  SELECT *, CAST(coalesce(sum(n_tokens) OVER (
      |    PARTITION BY shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
      |  FROM ${ns}t
      |),
      |${ns}p AS (
      |  SELECT doc_id, n_tokens, shard, cum_excl // 512 AS bin,
      |    cum_excl - (cum_excl // 512) * 512 AS bin_offset
      |  FROM ${ns}c
      |)""".stripMargin
  }

  /** Flagship-v3's per-doc pack placement (the export store served at
    * DOCUMENT grain): `pkdoc` aggregates every folded unit of a document
    * — unit count, packed tokens, and an order-free xor checksum over
    * (folded id, shard, bin, bin_offset) — and `pkfirst` anchors the
    * chunk-0 unit's (shard, bin) (chunk 0 exists for every document, its
    * folded id is exactly doc_id·1e6).
    */
  private[queries] def packPlacementBlock: String =
    s"""${chunkPackCtes("documents", ns = "pk_")},
       |pkdoc AS (
       |  SELECT doc_id // 1000000 AS doc_id, CAST(count(*) AS BIGINT) AS n_units,
       |    CAST(sum(n_tokens) AS BIGINT) AS tok_packed,
       |    bit_xor(${hex60Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(shard AS VARCHAR) || ':' || CAST(bin AS VARCHAR) || ':' || CAST(bin_offset AS VARCHAR)")}) AS pack_sum
       |  FROM pk_p GROUP BY 1
       |),
       |pkfirst AS (
       |  SELECT doc_id // 1000000 AS doc_id, shard AS first_shard, bin AS first_bin
       |  FROM pk_p WHERE doc_id % 1000000 = 0
       |)""".stripMargin

  private[queries] def chunkExportLedgerSql(source: String, withCtes: String = "",
                                            shardSql: String = ""): String =
    s"""WITH ${withCtes}${chunkPackCtes(source, shardSql)}
      |SELECT shard, bin, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS first_doc,
      |  bit_xor(${hex60Sql("CAST(doc_id AS VARCHAR) || ':' || CAST(bin_offset AS VARCHAR)")}) AS checksum
      |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private[queries] def dailyDriftSql: String = dailyDriftSqlFrom(horizonDays = -1)

  /** [[dailyDriftSql]] with an optional retention horizon: events from
    * `max(day) - horizonDays` on (a negative horizon keeps everything).
    * q229 serves from a horizon-cut, vacuumed store; the oracle simply
    * never sees the retired days.
    */
  private def dailyDriftSqlFrom(horizonDays: Int): String = {
    val where =
      if (horizonDays < 0) ""
      else s"""
        |  WHERE CAST(ts AS DATE) >=
        |    (SELECT max(CAST(ts AS DATE)) - $horizonDays FROM events)""".stripMargin
    s"""WITH ev AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS metric FROM events$where
        |),
        |cnt0 AS (SELECT day, metric AS bucket, count(*) AS c FROM ev GROUP BY 1, 2),
        |ac AS (SELECT CAST(day + 1 AS VARCHAR) AS feature, bucket, c FROM cnt0),
        |bc AS (SELECT CAST(day AS VARCHAR) AS feature, bucket, c FROM cnt0),
        |jo AS (
        |  SELECT coalesce(a.feature, b.feature) AS feature,
        |    coalesce(a.bucket, b.bucket) AS bucket,
        |    CAST(coalesce(a.c, 0) AS BIGINT) AS ca,
        |    CAST(coalesce(b.c, 0) AS BIGINT) AS cb
        |  FROM ac a FULL OUTER JOIN bc b
        |    ON a.feature = b.feature AND a.bucket = b.bucket
        |),
        |tot AS (
        |  SELECT feature, count(*) AS k,
        |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
        |  FROM jo GROUP BY 1
        |),
        |term AS (
        |  SELECT c.feature, t.k, t.na, t.nb,
        |    CAST(c.cb + 1 AS HUGEINT) * (t.na + t.k)
        |      - CAST(c.ca + 1 AS HUGEINT) * (t.nb + t.k) AS dnum,
        |    CAST(floor(ln(((c.cb + 1.0) * (t.na + t.k)) / ((c.ca + 1.0) * (t.nb + t.k)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS l6
        |  FROM jo c JOIN tot t USING (feature)
        |),
        |rep AS (
        |  SELECT feature, k AS n_buckets, na AS n_a, nb AS n_b,
        |    floor(CAST(sum(dnum * l6) AS DOUBLE)
        |      / (CAST(na + k AS DOUBLE) * CAST(nb + k AS DOUBLE)) + 0.5) / 1e6 AS psi
        |  FROM term GROUP BY 1, 2, 3, 4
        |)
        |SELECT feature AS day, n_buckets, n_a, n_b, psi, $psiVerdictSql
        |FROM rep WHERE n_a > 0 AND n_b > 0 ORDER BY day""".stripMargin
  }

}
