package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * The actual codec work (image decode, audio resample, frame extraction) is
  * STUBBED with a deterministic fake — the media libraries are not in this
  * container — but the Spark-side shape is real: binary columns survive
  * columnar scans, the decode runs via `mapPartitions` over a typed Dataset
  * (one JVM call per batch, the Scala analogue of `mapInPandas` batch UDFs),
  * and downstream operators see a typed struct schema.
  *
  * Scale notes: payloads are opaque blobs, so the plan never shuffles them
  * except for an explicit repartition; metadata extraction is map-only.
  * Partition sizing: with ~1 MB media payloads, keep
  * `spark.sql.files.maxPartitionBytes` at the default 128 MB so a partition
  * holds ~128 payloads — decode state is per-batch, memory stays bounded.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte], media_type: String)
  case class DecodedMeta(doc_id: Long, byte_len: Long, sha256: String,
                         width: Int, height: Int, n_frames: Int)

  /** Wrap a text corpus as fake media payloads (UTF-8 bytes) — the stand-in
    * for reading real media blobs from parquet binary columns.
    */
  def asMedia(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/fake").as("media_type"))

  /** Batch "decode": per-partition iteration with a deterministic fake codec.
    * A real implementation swaps `fakeDecode` for the codec call; everything
    * else (typed Dataset in/out, partition batching, schema) stays.
    */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // One digest instance per partition — the "expensive codec init" slot.
      val md = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { r => fakeDecode(r, md) }
    }
  }

  /** Deterministic fake codec: metadata derived only from payload bytes. */
  private def fakeDecode(r: MediaRecord, md: java.security.MessageDigest): DecodedMeta = {
    val len = r.payload.length.toLong
    val sha = md.digest(r.payload).map("%02x".format(_)).mkString
    DecodedMeta(r.doc_id, len, sha,
      width = (len % 640 + 16).toInt,
      height = (len * 7 % 480 + 16).toInt,
      n_frames = (len % 32 + 1).toInt)
  }

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_sha: String)

  /** Frame sampling: every `everyK`-th frame of each media payload, so the
    * fan-out per document is bounded by n_frames/everyK (the explode-shaped
    * media op — at scale the output is rows-per-frame, never a shuffled
    * blob). The per-frame decode is the stubbed codec slot: the fake
    * derives a deterministic digest from (doc, frame index, payload head).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int = 4): Dataset[FrameSample] = {
    require(everyK >= 1, "everyK must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      batch.flatMap { r =>
        val meta = fakeDecode(r, md)
        (0 until meta.n_frames by everyK).iterator.map { i =>
          val d = md.digest(s"${r.doc_id}:$i:".getBytes("UTF-8") ++ r.payload.take(64))
          FrameSample(r.doc_id, i, d.map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Column-expression twin of the fake decode (used by the oracle-checked
    * query so DuckDB can mirror it; the Dataset path above is the operator).
    */
  def metaColumns(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("sha256"),
      (octet_length(col("payload")) % 640 + 16).as("width"),
      (octet_length(col("payload")).cast("long") * 7 % 480 + 16).cast("int").as("height"),
      (octet_length(col("payload")) % 32 + 1).as("n_frames"))
}
