package graft.operators

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic training-shard manifest: route every document to a shard
  * by a content-independent hash of its id, and summarize each shard with
  * counts, bounds, and an order-insensitive content checksum — the ledger a
  * 1000-executor export job writes FIRST, so every shard file it produces
  * can be verified against the manifest (and re-verified after any replay,
  * compaction, or object-store migration) without re-reading neighbors.
  *
  * The reference exports a single CSV stream (`backend/app/api/export.py`,
  * SURVEY.md §2.8 S8) — adequate at its scale, unverifiable at 100 TB where
  * an export is thousands of files written by fallible tasks. The manifest
  * is the missing integrity layer: n_docs/sum_chars catch truncation,
  * min/max id catch mis-routing, and the XOR-of-row-fingerprints checksum
  * catches any single-row corruption regardless of row order (XOR is
  * commutative, so a verifier streams each shard file in ANY order and
  * folds — no sort, no buffering).
  *
  * Routing is [[Dedup.hex60]] of the id string, mod nShards: uniform
  * whatever the id distribution (sequential crawl ids would make range
  * sharding skew with crawl order), and stable across snapshots so an
  * UNCHANGED document lands in the same shard forever — the property
  * [[manifestDelta]] turns into incremental export.
  *
  * Scale shape: one map-side projection (hashes are per-row), one hash
  * aggregate keyed on the shard id with map-side partial combine — the
  * shuffle carries at most nShards rows per task. No sort, no window, no
  * driver state; output is nShards rows however large the corpus.
  */
object Shards {

  /** Per-shard manifest over `docs`: (shard, n_docs, sum_chars, min_id,
    * max_id, checksum). The row fingerprint hashes `id:text`, so the
    * checksum moves if any document's text OR id changes, while XOR keeps
    * it independent of row order and partitioning.
    */
  def manifest(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    docs.select(
        pmod(Dedup.hex60(col(idCol).cast("string")), lit(nShards.toLong)).as("shard"),
        col(idCol).as("__id"),
        length(col(textCol)).cast("long").as("__len"),
        Dedup.hex60(concat(col(idCol).cast("string"), lit(":"), col(textCol))).as("__fp"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
           sum("__len").as("sum_chars"),
           min("__id").as("min_id"),
           max("__id").as("max_id"),
           expr("bit_xor(__fp)").as("checksum"))
  }

  /** Shard-level delta between two manifests of the SAME nShards: which
    * shard files an incremental export must rewrite. A shard whose
    * checksum AND counts match across snapshots is byte-equivalent as a
    * set of rows (up to 60-bit XOR collision) and its file is reused; the
    * rest are rewritten from the new snapshot. This is [[Dedup.corpusDelta]]
    * lifted to the export unit — at a 2-3% crawl delta the job rewrites a
    * few hundred of thousands of shard files instead of all of them.
    *
    * Output: (shard, status ∈ added|removed|changed|unchanged, n_docs_a,
    * n_docs_b). Join is on the shard id — manifest-sized inputs, so any
    * join strategy is trivially cheap.
    */
  def manifestDelta(ma: DataFrame, mb: DataFrame): DataFrame =
    ledgerDelta(ma, mb, Seq("shard"), Seq("n_docs", "sum_chars", "checksum"))

  /** [[manifestDelta]] generalized to any export-unit ledger: full-outer
    * join on `keyCols`, a unit is `changed` when ANY of `cmpCols` differs,
    * `added`/`removed` when one side is missing. Output: keyCols, status,
    * n_docs_a, n_docs_b (zero-coalesced) — both ledgers must carry n_docs.
    * Ledger-sized inputs; any join strategy is trivially cheap.
    */
  def ledgerDelta(ma: DataFrame, mb: DataFrame, keyCols: Seq[String],
                  cmpCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) =
      df.select((keyCols.map(col) ++ (cmpCols :+ "n_docs").distinct
        .map(c => col(c).as(s"${c}_$tag"))): _*)
    val j = side(ma, "a").join(side(mb, "b"), keyCols, "full_outer")
    val anyDiff = cmpCols.map(c => col(s"${c}_a") =!= col(s"${c}_b"))
      .reduce(_ || _)
    j.select(keyCols.map(col) ++ Seq(
      when(col("n_docs_b").isNull, "removed")
        .when(col("n_docs_a").isNull, "added")
        .when(anyDiff, "changed")
        .otherwise("unchanged").as("status"),
      coalesce(col("n_docs_a"), lit(0L)).as("n_docs_a"),
      coalesce(col("n_docs_b"), lit(0L)).as("n_docs_b")): _*)
  }

  /** The incremental export itself — what [[manifestDelta]] exists FOR:
    * assemble snapshot B's export by REUSING snapshot A's rows for every
    * shard whose manifest entry is unchanged (in production: the already
    * written file is left in place) and rewriting only the changed/added
    * shards from B. Removed shards appear in neither side and drop out.
    * An unchanged manifest row means identical (count, chars, checksum) —
    * identical row content up to 60-bit XOR collision — so the assembly
    * equals a full export of B; q217 proves that at the hash level.
    *
    * Output: B's columns plus `shard`. Scale shape: two manifests (one
    * aggregate each), a manifest-sized delta, and two semi-join-shaped
    * broadcast joins routing corpus rows by shard — the corpus itself is
    * never shuffled, only scanned.
    */
  def incrementalExport(a: DataFrame, b: DataFrame, nShards: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    // materialize the (≤ nShards)-row delta once: it feeds two broadcast
    // sides, and recomputing it lazily would cost two extra corpus passes
    val delta = manifestDelta(manifest(a, nShards, idCol, textCol),
      manifest(b, nShards, idCol, textCol)).localCheckpoint(true)
    def routed(df: DataFrame) = df.withColumn("shard",
      pmod(Dedup.hex60(col(idCol).cast("string")), lit(nShards.toLong)))
    val reuse = broadcast(delta.filter(col("status") === "unchanged").select("shard"))
    val rewrite = broadcast(
      delta.filter(col("status").isin("changed", "added")).select("shard"))
    routed(a).join(reuse, "shard")
      .unionByName(routed(b).join(rewrite, "shard"))
  }

  /** Ledger over PACKED training files ([[graft.text.TextOps.packSequences]]
    * output): one row per (shard, bin) = one physical training file, with
    * the doc count, the token payload, and a checksum binding member
    * identity AND position (`id:bin_offset`) — a training file's bytes
    * depend on concatenation order, so the fingerprint must too, while XOR
    * keeps verification order-free. Same one-aggregate scale shape as
    * [[manifest]].
    */
  def packedLedger(packed: DataFrame): DataFrame =
    packed.select(col("shard"), col("bin"), col("doc_id"), col("n_tokens"),
        Dedup.hex60(concat(col("doc_id").cast("string"), lit(":"),
          col("bin_offset").cast("string"))).as("__fp"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
           sum("n_tokens").as("n_tokens"),
           min("doc_id").as("first_doc"),
           expr("bit_xor(__fp)").as("checksum"))

  /** Incremental [[packedLedger]] across a corpus delta — the export chain
    * closed at BIN granularity (the q217 shard-file treatment pushed down
    * to packed training files): reuse every ledger row of cycle A that the
    * delta provably cannot touch, re-pack only from the first affected
    * unit onward, and the assembled ledger hash-equals the from-scratch
    * ledger over snapshot B.
    *
    * Offset-packing ripples: within a shard, bins are cumulative-token
    * windows in unit-id order, so the first affected unit shifts every
    * LATER bin in its shard ([[graft.text.TextOps.packSequences]];
    * the q215 ripple). The exact reusable set is therefore a per-shard
    * PREFIX: bins strictly below `bin_cut = prefix_tokens div budget`,
    * where prefix_tokens counts the units before the shard's smallest
    * affected id — those bins hold only unchanged units with unchanged
    * cumulative offsets. The boundary bin (`bin_cut` itself) may mix
    * prefix units with re-packed ones, so its prefix members re-enter the
    * re-pack with everything at or after the affected id, seeded at
    * `base_tok` (the reused bins' token sum — exactly the cumulative
    * offset the from-scratch pack would assign). A shard with no affected
    * units reuses every row; an empty delta re-packs nothing.
    *
    * Inputs: `unitsB` = snapshot B's pack units (doc_id, n_tokens) — only
    * rows at/after each shard's first affected id are consumed; `packA` /
    * `ledgerA` = cycle A's stored pack frame and ledger (in production,
    * read back from the store; the pack frame IS the written files).
    * `affectedIds` = unit ids invalidated by the delta on EITHER side
    * (A-units of changed+removed docs, B-units of changed+added — both
    * sides, because a shrunk document must still invalidate its vanished
    * tail units).
    *
    * Scale shape: the corpus-sized inputs are touched by one ≤nShards
    * aggregate each (affected-min, prefix-token sum) plus the re-pack
    * window, which covers only the post-cut suffix per shard; every join
    * routes through a broadcast ≤nShards-row scalar frame; ledger-sized
    * frames carry the rest. No driver state.
    */
  def incrementalPackedLedger(unitsB: DataFrame, packA: DataFrame,
                              ledgerA: DataFrame, affectedIds: DataFrame,
                              budget: Int, nShards: Int,
                              idCol: String = "doc_id"): DataFrame = {
    val (scal, repacked) =
      incrementalPackParts(unitsB, packA, affectedIds, budget, nShards, idCol)
    val reused = ledgerA.join(broadcast(scal), Seq("shard"))
      .filter(col("bin") < col("bin_cut"))
      .select("shard", "bin", "n_docs", "n_tokens", "first_doc", "checksum")
    reused.unionByName(packedLedger(repacked))
  }

  /** The incremental PACK FRAME itself — what cycle N+1's maintenance
    * reads: cycle A's stored rows for every bin below the cut plus the
    * re-packed rows, together bit-equal to a from-scratch
    * `packSequences` over snapshot B. This is how the incremental export
    * CHAINS: q226 drives A→B→C with cycle 2's `packA` being cycle 1's
    * assembled frame, no from-scratch rebuild in between.
    */
  def incrementalPackFrame(unitsB: DataFrame, packA: DataFrame,
                           affectedIds: DataFrame, budget: Int, nShards: Int,
                           idCol: String = "doc_id"): DataFrame = {
    val (scal, repacked) =
      incrementalPackParts(unitsB, packA, affectedIds, budget, nShards, idCol)
    packA.join(broadcast(scal), Seq("shard"))
      .filter(col("bin") < col("bin_cut"))
      .select("shard", "bin", "doc_id", "n_tokens", "bin_offset")
      .unionByName(repacked)
  }

  /** Shared core of the incremental pack: the ≤nShards scalar frame
    * (min affected id, prefix tokens, bin cut) and the re-packed rows
    * (boundary-bin prefix members + everything at/after the cut, seeded
    * at the reused token offset). See [[incrementalPackedLedger]] for the
    * reuse-boundary argument.
    */
  private def incrementalPackParts(unitsB: DataFrame, packA: DataFrame,
                                   affectedIds: DataFrame, budget: Int,
                                   nShards: Int, idCol: String)
      : (DataFrame, DataFrame) = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    // the same hash-balanced routing as packSequences' default — the two
    // MUST agree or the reuse boundary reads the wrong shard's prefix
    val shardOf = (c: org.apache.spark.sql.Column) =>
      pmod(Dedup.hex60(c.cast("string")), lit(nShards.toLong))
    // ≤ nShards rows: each shard's smallest invalidated unit id
    val minAff = affectedIds.select(shardOf(col(idCol)).as("shard"), col(idCol).as("__id"))
      .groupBy("shard").agg(min("__id").as("min_aff"))
    // prefix/reused token sums from the STORED pack frame (one scan, one
    // ≤nShards aggregate — unaffected shards don't join and default to 0).
    // base_tok (the re-pack seed) = tokens in bins BELOW the cut, i.e. the
    // cumulative offset the from-scratch pack would hand the first
    // re-packed unit.
    val prefTok = packA.join(broadcast(minAff), Seq("shard"))
      .filter(col("doc_id") < col("min_aff"))
      .groupBy("shard").agg(sum("n_tokens").as("prefix_tok"))
    // every shard gets a scalar row: min_aff null = nothing affected =
    // reuse all (bin_cut rides at Long.MaxValue)
    val scal0 = unitsB.sparkSession.range(nShards).select(col("id").as("shard"))
      .join(minAff, Seq("shard"), "left")
      .join(prefTok, Seq("shard"), "left")
      .select(col("shard"), col("min_aff"),
        coalesce(col("prefix_tok"), lit(0L)).as("prefix_tok"))
      .withColumn("bin_cut", when(col("min_aff").isNull, lit(Long.MaxValue))
        .otherwise(expr(s"prefix_tok div $budget")))
    val baseTok = packA.join(broadcast(scal0), Seq("shard"))
      .filter(col("bin") < col("bin_cut"))
      .groupBy("shard").agg(sum("n_tokens").as("base_tok"))
    val scal = scal0.join(baseTok, Seq("shard"), "left")
      .withColumn("base_tok", coalesce(col("base_tok"), lit(0L)))
      .localCheckpoint(true)
    // boundary-bin prefix members re-enter the re-pack with their A-side
    // token counts (identical in B — they precede every affected id)
    val repackPrefix = packA.join(broadcast(scal), Seq("shard"))
      .filter(col("doc_id") < col("min_aff") && col("bin") === col("bin_cut"))
      .select(col("shard"), col("doc_id"), col("n_tokens"), col("base_tok"))
    val repackSuffix = unitsB
      .select(shardOf(col(idCol)).as("shard"), col(idCol).as("doc_id"), col("n_tokens"))
      .join(broadcast(scal), Seq("shard"))
      .filter(col("min_aff").isNotNull && col("doc_id") >= col("min_aff"))
      .select("shard", "doc_id", "n_tokens", "base_tok")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val repacked = repackPrefix.unionByName(repackSuffix)
      .withColumn("cum_excl",
        col("base_tok") + coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_excl div $budget"))
      .withColumn("bin_offset", col("cum_excl") - col("bin") * budget)
      .select("shard", "bin", "doc_id", "n_tokens", "bin_offset")
    (scal, repacked)
  }
}
