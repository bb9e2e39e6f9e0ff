package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * Image decode is REAL: [[ImageIoCodec]] parses PNG/JPEG/GIF/BMP headers
  * with the JDK-native `javax.imageio` readers (no extra dependencies, no
  * pixel materialization), [[imageDhash]] decodes full pixel rasters for
  * the perceptual hash, and [[sampleFrameHashes]] decodes ANIMATED GIF
  * frames one by one — the multi-frame path is no longer a stub. Only
  * audio formats beyond WAV/AIFF/AU (mp3/ogg/flac) and non-GIF video
  * stay behind the deterministic-fake slot: those codecs are not in the
  * JDK. The Spark-side shape is real throughout:
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

  /** Render one mono 16-bit PCM WAV per vector row (id, array<double>):
    * `samples` samples at 8 kHz, sample j quantizing dimension j mod d as
    * s_j = floor(clamp(v[j mod d] / 3, -1, 1) * 32767) — an exact integer,
    * and PCM16 in a WAV container is lossless, so the decoded samples have
    * a closed form (the q155/q161 oracle strategy, now for audio DATA, not
    * just headers). The bytes go through the REAL `javax.sound.sampled`
    * writer (`AudioSystem.write(..., Type.WAVE, ...)`), not a hand-rolled
    * header.
    */
  def renderPcmWavs(vectors: DataFrame, samples: Int, idCol: String = "vec_id",
                    vecCol: String = "embedding"): Dataset[MediaRecord] = {
    require(samples >= 1, "need at least one sample")
    import vectors.sparkSession.implicits._
    vectors
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        it.map { case (id, v0) =>
          val v = nonEmptyOrZero(v0)
          val pcm = new Array[Byte](samples * 2)
          var j = 0
          while (j < samples) {
            val s = math.floor(
              math.min(1.0, math.max(-1.0, v(j % v.length) / 3.0)) * 32767.0).toInt
            pcm(2 * j) = (s & 0xff).toByte          // little-endian PCM16
            pcm(2 * j + 1) = ((s >> 8) & 0xff).toByte
            j += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, samples.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          MediaRecord(id, bos.toByteArray, "audio/wav")
        }
      }
  }

  case class AudioWindow(doc_id: Long, win: Int, n_samples: Long, min_s: Int,
                         max_s: Int, sum_s: Long, sum_sq: Long, decoded: Boolean)

  /** Windowed sample statistics through the REAL audio decode: payload ->
    * `AudioSystem.getAudioInputStream` (container parse + PCM frame
    * extraction) -> 16-bit LE samples -> per `window`-sample chunk the
    * exact integer aggregates (count, min, max, sum, sum of squares —
    * everything an energy/silence detector derives). Integer sums of
    * |s| <= 32767 over bounded windows cannot overflow; all five numbers
    * are engine-exact.
    *
    * Non-canonical-but-valid PCM (big-endian, 8-bit, unsigned) is
    * CONVERTED to 16-bit LE signed through the JDK's deterministic
    * PCM-to-PCM codec ((b-128)<<8 widening with full-scale saturation,
    * bit-exact across runs — pinned in CorpusOpsSpec), so those payloads
    * get real windows instead of a fallback row. Two fallback
    * flavors remain, distinguishable by `win` (the ADVICE r10 fix —
    * "unsupported" must not read as "corrupt"): `win = -2` is a VALID
    * audio container in a format the JDK codec cannot reach (multi-channel
    * down-mix, float PCM); `win = -1` is a payload that failed container
    * parse or sample read — actually corrupt. Both are row-scoped
    * (decoded = false), the codec family's corrupt-input discipline.
    */
  def audioWindows(media: Dataset[MediaRecord], window: Int): Dataset[AudioWindow] = {
    require(window >= 1, "window must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.flatMap { r =>
        // Right(samples) = decodable to 16-bit LE mono; Left(win sentinel)
        // = valid container, unreachable format
        val out: Seq[AudioWindow] =
          try {
            val ais0 = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val f = ais0.getFormat
              val canonical = f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
                !f.isBigEndian &&
                f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              val aisOrSkip: Either[Int, javax.sound.sampled.AudioInputStream] =
                if (canonical) Right(ais0)
                else if (f.getChannels != 1) Left(-2) // JDK codec has no down-mix
                else try Right(javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new javax.sound.sampled.AudioFormat(
                    javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
                    f.getSampleRate, 16, 1, 2, f.getSampleRate, false), ais0))
                catch { case _: IllegalArgumentException => Left(-2) }
              aisOrSkip match {
                case Left(skipWin) =>
                  Seq(AudioWindow(r.doc_id, skipWin, 0L, 0, 0, 0L, 0L, decoded = false))
                case Right(ais) =>
                val bytes = ais.readAllBytes()
                val n = bytes.length / 2
                (0 until n by window).map { start =>
                  val end = math.min(start + window, n)
                  var i = start
                  var mn = Int.MaxValue; var mx = Int.MinValue
                  var sum = 0L; var sq = 0L
                  while (i < end) {
                    val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
                    if (s < mn) mn = s
                    if (s > mx) mx = s
                    sum += s; sq += s.toLong * s
                    i += 1
                  }
                  AudioWindow(r.doc_id, start / window, (end - start).toLong,
                    mn, mx, sum, sq, decoded = true)
                }
              }
            } finally ais0.close()
          } catch { case scala.util.control.NonFatal(_) => Seq.empty }
        if (out.nonEmpty) out
        else Seq(AudioWindow(r.doc_id, -1, 0L, 0, 0, 0L, 0L, decoded = false))
      }
    }
  }

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_sha: String)

  /** Deterministic-FAKE frame sampling — kept as the fallback-shaped twin
    * of [[sampleFrameHashes]] (which does the REAL multi-frame decode) for
    * media types with no JDK reader: the fake derives a digest from (doc,
    * frame index, payload head). Prefer sampleFrameHashes for anything a
    * `javax.imageio` reader can open (GIF animations decode for real).
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

  // ---------------------------------------------------------------------
  // Perceptual image hashing (dHash) + image near-dup — the dedup family
  // extended to image bytes. The pipeline is REAL end-to-end: pixels render
  // into actual PNG payloads (javax.imageio encode), the hash decodes those
  // payloads back through the real reader and thumbnails non-9x8 inputs
  // with a Graphics2D scale — the industry-standard difference-hash recipe
  // (scale to 9x8 grayscale, hash = adjacent-pixel comparisons).
  //
  // ORACLE STRATEGY (what makes this gateable without an image decoder in
  // DuckDB): the gate corpus renders its images DETERMINISTICALLY from the
  // embeddings table — pixel(y, x) = floor(clamp((v[(9y+x) mod d] + 3)/6,
  // 0, 1) * 255), all double arithmetic — and gray8 PNG is lossless, so
  // dHash(decode(render(v))) has a closed form DuckDB can compute straight
  // from the vector. A byte flipped anywhere in the encode → decode →
  // thumbnail → compare chain breaks the hash equality, so the gate pins
  // the REAL codec path bit-for-bit, not a fake.
  // ---------------------------------------------------------------------

  /** The shared pixel quantizer (double in, 0..255 int out) — keep in exact
    * sync with the SQL replay in the q155/q157 oracles.
    */
  private def quantizePixel(v: Double): Int =
    math.floor(math.min(1.0, math.max(0.0, (v + 3.0) / 6.0)) * 255.0).toInt

  /** Renderer input guard: an EMPTY vector would `% 0`-crash the whole
    * task (codec discipline: one bad row degrades, never kills) — it
    * renders as the constant zero-vector payload instead. Gate corpora
    * never contain empty vectors, so the oracles need no mirror.
    */
  private def nonEmptyOrZero(v: Seq[Double]): Seq[Double] =
    if (v.isEmpty) Seq(0.0) else v

  /** Render one 9x8 8-bit grayscale PNG per vector row (id, array<double>):
    * pixel (y, x) quantizes dimension (9y + x) mod d. Map-only, payloads
    * are ~100-byte blobs; at scale this is the "images live in a binary
    * column" ingest shape with a generator standing in for the crawl.
    */
  def renderGrayPngs(vectors: DataFrame, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Dataset[MediaRecord] = {
    import vectors.sparkSession.implicits._
    vectors
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, v0) =>
          val v = nonEmptyOrZero(v0)
          val img = new java.awt.image.BufferedImage(
            9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val ras = img.getRaster
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 9) {
              ras.setSample(x, y, 0, quantizePixel(v((y * 9 + x) % v.length)))
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          MediaRecord(id, bos.toByteArray, "image/png")
        }
      }
  }

  /** True iff the image is an indexed-color frame whose palette maps every
    * index i to gray (i, i, i) — the identity-gray palette [[renderGrayGifs]]
    * writes. For such frames the raster's band-0 samples ARE the gray
    * values, so no color conversion is needed (or wanted: conversion would
    * break the oracle's closed form).
    */
  private def identityGrayIndexed(img: java.awt.image.BufferedImage): Boolean =
    img.getColorModel match {
      case icm: java.awt.image.IndexColorModel =>
        val n = icm.getMapSize
        n <= 256 && (0 until n).forall { i =>
          icm.getRed(i) == i && icm.getGreen(i) == i && icm.getBlue(i) == i
        }
      case _ => false
    }

  /** The 9x8 grayscale raster every hash reads: direct when the frame is
    * already 9x8 gray (TYPE_BYTE_GRAY, or indexed with the identity-gray
    * palette), an integer box-sampled thumbnail otherwise.
    *
    * The downscale is a HAND-ROLLED integer box mean + BT.601 integer luma
    * ((299r + 587g + 114b) / 1000), not Graphics2D.drawImage: default-hint
    * Graphics2D scaling is JDK/platform-dependent, which made dHash values
    * for real-world-sized images deterministic only within one
    * environment (the ADVICE r10 finding). All-integer arithmetic is
    * bit-exact everywhere, so a hash computed on one cluster matches a
    * store built on another. Single-band gray frames read their samples
    * directly (no ICC gray->sRGB round trip); everything else goes through
    * getRGB + integer luma.
    */
  private def gray9x8(img: java.awt.image.BufferedImage): java.awt.image.Raster =
    if (img.getWidth == 9 && img.getHeight == 8 &&
      (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY ||
        identityGrayIndexed(img))) img.getRaster
    else {
      val w = img.getWidth; val h = img.getHeight
      val direct = img.getRaster.getNumBands == 1 &&
        (img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY ||
          identityGrayIndexed(img))
      val t = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val out = t.getRaster
      var y = 0
      while (y < 8) {
        val sy0 = y * h / 8; val sy1 = math.max(sy0 + 1, (y + 1) * h / 8)
        var x = 0
        while (x < 9) {
          val sx0 = x * w / 9; val sx1 = math.max(sx0 + 1, (x + 1) * w / 9)
          var sum = 0L; var cnt = 0L
          var sy = sy0
          while (sy < sy1) {
            var sx = sx0
            while (sx < sx1) {
              val lum =
                if (direct) img.getRaster.getSample(sx, sy, 0)
                else {
                  val rgb = img.getRGB(sx, sy)
                  (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                    (rgb & 0xff) * 114) / 1000
                }
              sum += lum; cnt += 1
              sx += 1
            }
            sy += 1
          }
          out.setSample(x, y, 0, (sum / cnt).toInt)
          x += 1
        }
        y += 1
      }
      out
    }

  /** The 63-bit difference hash over a 9x8 gray raster (see [[imageDhash]]
    * for the bit layout and the sign-bit rationale).
    */
  private def dhashOf(ras: java.awt.image.Raster): Long = {
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8 && (y < 7 || x < 7)) {
        if (ras.getSample(x, y, 0) < ras.getSample(x + 1, y, 0))
          h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  case class ImageHash(doc_id: Long, dhash: Long, decoded: Boolean)

  /** 63-bit difference hash over the REAL decoded image: payload ->
    * `ImageIO.read` -> (if not already 9x8 gray) Graphics2D thumbnail ->
    * bit (8y + x) set iff pixel(y, x) < pixel(y, x + 1), for y in 0..7 and
    * x in 0..7 minus the (7,7) slot — 63 comparisons, never touching the
    * sign bit, so the hash survives BIGINT engines and band arithmetic
    * without wrap surprises. Undecodable payloads fall back to a
    * deterministic digest-derived hash with `decoded = false` (the
    * [[ImageIoCodec]] corrupt-input discipline: one bad blob must not kill
    * the task, and the flag lets callers quarantine the fallbacks).
    */
  def imageDhash(media: Dataset[MediaRecord]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      batch.map { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null || img.getWidth < 1 || img.getHeight < 1) {
          // deterministic fallback: top 63 bits of the payload digest
          val d = md.digest(r.payload)
          val h = java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 1
          ImageHash(r.doc_id, h, decoded = false)
        } else ImageHash(r.doc_id, dhashOf(gray9x8(img)), decoded = true)
      }
    }
  }

  /** Render one ANIMATED GIF per vector row (id, array<double>): `frames`
    * frames of 9x8 indexed-color pixels under an IDENTITY gray palette
    * (index i -> rgb(i, i, i)), frame f's pixel (y, x) quantizing dimension
    * (9y + x + 7f) mod d — each frame samples a rotated slice of the
    * vector, so frames are distinct but closed-form. GIF's LZW coding is
    * lossless on palette INDICES and the identity palette makes index ==
    * gray level, so the encode -> decode round trip is pixel-exact
    * (measured by tools.GifProbe) — which is what lets the frame hashes be
    * oracle-gated the way q155 gates the still-image path.
    */
  def renderGrayGifs(vectors: DataFrame, frames: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): Dataset[MediaRecord] = {
    require(frames >= 1, "need at least one frame")
    import vectors.sparkSession.implicits._
    vectors
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val comps = Array.tabulate(256)(_.toByte)
        val icm = new java.awt.image.IndexColorModel(8, 256, comps, comps, comps)
        it.map { case (id, v0) =>
          val v = nonEmptyOrZero(v0)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val w = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          try {
            w.setOutput(ios)
            w.prepareWriteSequence(null)
            var f = 0
            while (f < frames) {
              val img = new java.awt.image.BufferedImage(
                9, 8, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
              val ras = img.getRaster
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 9) {
                  ras.setSample(x, y, 0, quantizePixel(v((y * 9 + x + f * 7) % v.length)))
                  x += 1
                }
                y += 1
              }
              w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
              f += 1
            }
            w.endWriteSequence()
          } finally { w.dispose(); ios.close() }
          MediaRecord(id, bos.toByteArray, "image/gif")
        }
      }
  }

  case class FrameHash(doc_id: Long, frame_idx: Int, dhash: Long, decoded: Boolean)

  /** REAL frame sampling — the stub [[sampleFrames]] carried since round 3,
    * retired: every `everyK`-th frame of each payload decodes through the
    * actual `javax.imageio` multi-frame reader (`getNumImages(true)` +
    * per-frame `read(i)` — GIF is the JDK-native multi-frame container)
    * and hashes via the shared 9x8-gray dHash. Fan-out per document is
    * bounded by n_frames/everyK; frames never shuffle as pixels, only as
    * 63-bit hashes. Payloads with no reader (or a reader that throws)
    * degrade to ONE fallback row (frame -1, digest-derived hash,
    * decoded = false) — the corrupt-input discipline of [[imageDhash]].
    */
  def sampleFrameHashes(media: Dataset[MediaRecord],
                        everyK: Int = 1): Dataset[FrameHash] = {
    require(everyK >= 1, "everyK must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      batch.flatMap { r =>
        val out =
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) Seq.empty
              else {
                val rd = readers.next()
                try {
                  rd.setInput(iis)
                  val n = rd.getNumImages(true)
                  (0 until n by everyK).map { i =>
                    FrameHash(r.doc_id, i, dhashOf(gray9x8(rd.read(i))), decoded = true)
                  }
                } finally rd.dispose()
              }
            } finally iis.close()
          } catch { case scala.util.control.NonFatal(_) => Seq.empty }
        if (out.nonEmpty) out
        else {
          val d = md.digest(r.payload)
          Seq(FrameHash(r.doc_id, -1,
            java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 1, decoded = false))
        }
      }
    }
  }

  /** Image near-dup pairs by banded Hamming over the dHash — the
    * [[graft.dedup.Dedup.simhashPairs]] mine verbatim (one groupBy + pair
    * explode, no self-join): four 16-bit bands (the top band carries 15
    * live bits) guarantee recall for Hamming distance <= 3 by pigeonhole;
    * candidates verify by exact `bit_count(xor)`. Input: (doc_id, dhash).
    * Output: distinct (doc_a, doc_b, hamming).
    *
    * RECALL CONTRACT (the simhashPairs convention, stated here because
    * callers pass maxHamming > 3): the output is the set of BANDING
    * CANDIDATES filtered to `hamming <= maxHamming`, NOT an exhaustive
    * all-pairs-within-maxHamming — a pair at distance 4..maxHamming whose
    * differing bits spread across all four bands shares no band and is
    * never generated. Exhaustive recall at distance d needs d+1 bands
    * (pigeonhole); four bands are the scale-chosen operating point, and
    * any oracle gating this operator must replay the identical banding.
    */
  def dhashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val banded = hashes.select(col("doc_id"),
        explode(sequence(lit(0), lit(3))).as("band"), col("dhash"))
      .withColumn("bkey", expr("((dhash >> (band * 16)) & 65535) + band * 65536"))
    banded.groupBy(col("bkey"))
      .agg(array_sort(collect_set(struct(col("doc_id"), col("dhash")))).as("__ds"))
      .filter(size(col("__ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(__ds) - 2), i ->
          |  transform(sequence(i + 1, size(__ds) - 1), j ->
          |    struct(__ds[i].doc_id AS doc_a, __ds[j].doc_id AS doc_b,
          |           __ds[i].dhash AS ha, __ds[j].dhash AS hb))))""".stripMargin)).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"),
        bit_count(col("p.ha").bitwiseXOR(col("p.hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
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
