package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode is REAL: [[ImageIoCodec]] parses PNG/JPEG/GIF/BMP headers
  * with the JDK-native `javax.imageio` readers (no extra dependencies, no
  * pixel materialization). Audio/video codec work stays STUBBED with a
  * deterministic fake — those libraries are not in this container — behind
  * the same [[MediaCodec]] slot. The Spark-side shape is real throughout:
  * binary columns survive columnar scans, the decode runs via
  * `mapPartitions` over a typed Dataset (one JVM call per batch, the Scala
  * analogue of `mapInPandas` batch UDFs), and downstream operators see a
  * typed struct schema.
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

  /** Pluggable codec: returns (width, height, n_frames) when it can decode
    * the payload, None to fall through to the deterministic fake (the slot
    * for media types whose libraries are absent).
    */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): Option[(Int, Int, Int)]
  }

  /** JDK-native image codec: resolves a `javax.imageio` reader from the byte
    * stream and reads width/height FROM THE HEADER ONLY — no pixel raster is
    * materialized, so a scan over image blobs stays I/O-bound at scale.
    * Frame count uses `getNumImages(allowSearch = false)`; readers that
    * would need a full-stream search (-1) report 1 frame rather than paying
    * a second pass over the payload. Undecodable or corrupt payloads return
    * None and fall through to the fake, keeping the output total — including
    * payloads whose magic bytes resolve a reader that then throws a
    * RuntimeException on the truncated/garbled remainder (javax.imageio
    * readers raise IllegalArgumentException, IndexOutOfBoundsException, even
    * NegativeArraySizeException on malformed headers; at 100 TB one corrupt
    * blob must not kill the task).
    */
  object ImageIoCodec extends MediaCodec {
    def decode(payload: Array[Byte], mediaType: String): Option[(Int, Int, Int)] = {
      if (!mediaType.startsWith("image/")) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis, true, true)
              val frames = r.getNumImages(false)
              Some((r.getWidth(0), r.getHeight(0), if (frames < 1) 1 else frames))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Batch decode: per-partition iteration; real codecs (images via
    * [[ImageIoCodec]]) fill width/height/n_frames from the payload, anything
    * they decline falls back to the deterministic fake. Everything else
    * (typed Dataset in/out, partition batching, schema) is the production
    * shape.
    */
  def decodeMeta(media: Dataset[MediaRecord],
                 codec: MediaCodec = ImageIoCodec): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // One digest instance per partition — the "expensive codec init" slot.
      val md = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { r =>
        codec.decode(r.payload, r.media_type) match {
          case Some((w, h, nf)) =>
            DecodedMeta(r.doc_id, r.payload.length.toLong,
              md.digest(r.payload).map("%02x".format(_)).mkString, w, h, nf)
          case None => fakeDecode(r, md)
        }
      }
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

  case class AudioMeta(doc_id: Long, byte_len: Long, sha256: String,
                       sample_rate: Int, channels: Int, n_frames: Long, duration_ms: Double)

  /** JDK-native audio codec: `javax.sound.sampled.AudioSystem` parses WAV /
    * AIFF / AU headers (no sample data is decoded — `getAudioFileFormat`
    * reads only the container header, so scans over audio blobs stay
    * I/O-bound like the image path). Anything it can't parse returns None
    * and falls through to the deterministic fake, keeping decode total.
    */
  object WavCodec extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): Option[(Int, Int, Long)] = {
      if (!mediaType.startsWith("audio/")) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        Some((math.round(aff.getFormat.getSampleRate),
          aff.getFormat.getChannels, aff.getFrameLength.toLong))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** Batch audio-metadata decode, same shape as [[decodeMeta]]: typed
    * Dataset in/out, per-partition batching, real codec first (WAV/AIFF/AU
    * via [[WavCodec]]) with the deterministic fake as the fallback slot for
    * formats whose libraries are absent (mp3/ogg/flac).
    */
  def decodeAudioMeta(media: Dataset[MediaRecord]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { r =>
        val len = r.payload.length.toLong
        val sha = md.digest(r.payload).map("%02x".format(_)).mkString
        WavCodec.decode(r.payload, r.media_type) match {
          case Some((sr, ch, nf)) =>
            AudioMeta(r.doc_id, len, sha, sr, ch, nf,
              if (sr > 0) nf * 1000.0 / sr else 0.0)
          case None =>
            val sr = Seq(8000, 16000, 44100)((len % 3).toInt)
            val nf = len * 4
            AudioMeta(r.doc_id, len, sha, sr, (len % 2 + 1).toInt, nf, nf * 1000.0 / sr)
        }
      }
    }
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
