package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset: opaque bytes plus typed metadata (SURVEY-adjacent
  * "multimodal columns" pipeline operator). `kind` ∈ image|audio|video.
  */
case class MediaRow(
    id: Long,
    kind: String,
    content: Array[Byte],
    width: Int,
    height: Int,
    sample_rate: Int,
    duration_ms: Int)

/** Extracted feature row. */
case class MediaFeatures(id: Long, kind: String, n_bytes: Int, features: Array[Float])

/** Sampled frame row. */
case class MediaFrame(id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal column handling for a training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample over them.
  *
  * The IMAGE path is real: PNG/JPEG/BMP/GIF payloads decode through
  * `javax.imageio` (pure JVM, in every JRE) to pixels —
  * [[imageStats]]/[[imageVectors]] feed the flatten/normalize→index
  * contract the reference's image notebooks use (CIFAR notebook cell-2/3,
  * minus torch). The AUDIO path is real for WAV: 16-bit PCM decodes
  * through `javax.sound.sampled` (also pure JVM) —
  * [[audioStats]]/[[decodePcm]], with [[encodePcmWav]] as the lossless
  * fixture encoder. The VIDEO path is real for YUV4MPEG2 (the standard
  * public uncompressed interchange format): [[decodeY4m]]/[[videoStats]],
  * with [[encodeY4m]] as the lossless fixture encoder. COMPRESSED video
  * is real for MJPEG-in-AVI — every frame a complete baseline JPEG,
  * decoded per-frame by `javax.imageio` ([[decodeMjpegAvi]]/
  * [[mjpegStats]]/[[mjpegVectors]], with [[encodeMjpegAvi]] as the
  * fixture encoder whose block-constant frames sit in JPEG's lossless
  * corner). INTER-FRAME codecs (H.264 etc.) have no bare-JVM decoder and
  * keep the deterministic byte-hash stand-in ([[fakeDecode]]) — the
  * signature (bytes → fixed-dim float features) is the contract a real
  * codec slots into.
  * Everything runs in `mapPartitions` so a real codec amortizes
  * per-partition initialization, the same shape a Pandas-UDF
  * `mapInPandas` would have in PySpark.
  */
object MediaOps {

  val FrameBytes = 16

  /** STUB decoder: deterministic pseudo-features from raw bytes (FNV-1a
    * rolling over fixed-stride windows). Replace with a real codec; the
    * signature (bytes → fixed-dim float features) is the contract.
    */
  def fakeDecode(content: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 0x811c9dc5L
    var i = 0
    while (i < content.length) {
      h = (h ^ (content(i) & 0xffL)) * 0x01000193L & 0xffffffffL
      out(i % dim) += ((h % 1000L) / 1000.0f - 0.5f)
      i += 1
    }
    out
  }

  // ---- real image codec path (javax.imageio — public JVM API) ----

  /** Encode a grayscale image whose pixel (x, y) is `gray(x, y)` (0..255)
    * as PNG bytes. Deterministic fixture/datagen helper: PNG is lossless,
    * so a decode of these bytes returns exactly `gray`.
    */
  def encodeGrayPng(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, gray(x, y) & 0xff); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode image bytes to (width, height, gray pixels row-major, 0..255).
    * Single-band images read their raster directly; multi-band (RGB…)
    * collapse by integer luminance (299·r + 587·g + 114·b) / 1000 — all
    * integer arithmetic, so the result is engine- and platform-exact.
    * Returns None for undecodable bytes (ImageIO contract: null image).
    */
  def decodeGray(content: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](w * h)
      if (img.getRaster.getNumBands == 1) {
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
            out(y * w + x) = (299 * r + 587 * g + 114 * b) / 1000
            x += 1
          }
          y += 1
        }
      }
      Some((w, h, out))
    }
  }

  /** Deterministic synthetic PNG table over an id column: width
    * 8 + id % 9, height 8 + id % 7, gray(x, y) = (id·31 + x·7 + y·13) %
    * 256. The closed form is the point: a SQL oracle can compute every
    * decoded-pixel statistic from (id, x, y) alone — PNG is lossless, so
    * checking [[imageStats]] of these bytes against that SQL proves the
    * codec path end-to-end without the oracle ever touching an image.
    * Output: (id, content).
    */
  def syntheticPngs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          (id, encodeGrayPng(w, h, (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt))
        }
      }
      .toDF("id", "content")
  }

  /** Decoded-image statistics over an (id, content) frame: REAL decode
    * (`javax.imageio`), integer outputs only (bit-exact for an oracle):
    * (id, width, height, n_px, px_sum). Undecodable payloads are dropped
    * (ImageIO returns null) — corrupt rows must not kill a 100 TB scan;
    * count them upstream by comparing row counts if needed.
    */
  def imageStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeGray(bytes).map { case (w, h, px) =>
            var s = 0L
            var i = 0
            while (i < px.length) { s += px(i); i += 1 }
            (id, w.toLong, h.toLong, (w * h).toLong, s)
          }
        }
      }
      .toDF("id", "width", "height", "n_px", "px_sum")
  }

  /** Decode + deterministic nearest-neighbor resize to side×side +
    * flatten row-major + /255 normalize — image bytes in, (id, vector)
    * out, feeding [[graft.hnsw.Hnsw.build]] directly (the reference
    * notebooks' transform pipeline, `hsnw_trial.py`-adjacent cell-2/3,
    * minus torch). Nearest-neighbor with pure integer source indexing
    * (x·srcW/side) keeps the result platform-exact, unlike Graphics2D
    * interpolation.
    */
  def imageVectors(media: DataFrame, side: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeGray(bytes).map { case (w, h, px) =>
            val v = new Array[Float](side * side)
            var y = 0
            while (y < side) {
              val sy = y * h / side
              var x = 0
              while (x < side) {
                val sx = x * w / side
                v(y * side + x) = px(sy * w + sx) / 255.0f
                x += 1
              }
              y += 1
            }
            (id, v)
          }
        }
      }
      .toDF("id", "vector")
  }

  /** [[syntheticPngs]] with a closed-form perturbation: gray(x, y) =
    * (id·31 + x·7 + y·13 + (y = 0 ? delta : 0)) % 256 and the output id
    * shifted by `idOffset` — a brightness-shifted top ROW of the source
    * image, the planted ground truth for perceptual-hash near-dup
    * detection (only resized row 0 samples source y = 0, so at most 8
    * [[imagePhash]] dHash bits move while rows 1–7 stay bit-identical).
    * Still fully closed-form, so the SQL oracle derives every variant
    * pixel from (id, x, y, delta) alone. Output: (id, content).
    */
  def syntheticPngVariants(ids: DataFrame, delta: Int, idOffset: Long): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          (id + idOffset, encodeGrayPng(w, h,
            (x, y) => ((id * 31 + x * 7 + y * 13 + (if (y == 0) delta else 0)) % 256).toInt))
        }
      }
      .toDF("id", "content")
  }

  /** Perceptual hashes over an (id, content) image frame: REAL decode,
    * integer-only arithmetic, so both hashes are oracle-exact.
    *
    *  - **aHash** (average hash): nearest-neighbor resize to 8×8 with the
    *    same integer source indexing as [[imageVectors]]; bit p (row-major,
    *    p = y·8+x) is set iff px·64 &gt; Σpx (the mean threshold kept in
    *    integers — px·64 &gt; sum ⇔ px &gt; mean, no division anywhere).
    *  - **dHash** (difference hash): resize to 9×8; bit p set iff
    *    px(x+1, y) &gt; px(x, y) — horizontal gradient signs, invariant
    *    under global brightness shifts, which is why it is the standard
    *    image near-dup fingerprint.
    *
    * Each 64-bit hash is carried as TWO 32-bit halves (`*_hi`, `*_lo`)
    * so every value stays positive and small enough for exact BIGINT
    * arithmetic in any SQL engine (bit 63 of a single BIGINT would
    * overflow the oracle's SUM-of-powers reconstruction). Undecodable
    * payloads are dropped, as in [[imageStats]].
    * Output: (id, ahash_hi, ahash_lo, dhash_hi, dhash_lo).
    */
  def imagePhash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeGray(bytes).map { case (w, h, px) =>
            // 8×8 integer NN resize (imageVectors' indexing, pixels kept integral)
            val r8 = new Array[Int](64)
            var s = 0L
            var p = 0
            while (p < 64) {
              val v = px((p / 8 * h / 8) * w + (p % 8 * w / 8))
              r8(p) = v; s += v; p += 1
            }
            var aHi = 0L; var aLo = 0L
            p = 0
            while (p < 64) {
              if (r8(p) * 64L > s) {
                if (p < 32) aLo |= 1L << p else aHi |= 1L << (p - 32)
              }
              p += 1
            }
            // 9×8 resize for the horizontal-gradient hash
            val r9 = new Array[Int](72)
            p = 0
            while (p < 72) {
              r9(p) = px((p / 9 * h / 8) * w + (p % 9 * w / 9))
              p += 1
            }
            var dHi = 0L; var dLo = 0L
            p = 0
            while (p < 64) {
              val x = p % 8; val y = p / 8
              if (r9(y * 9 + x + 1) > r9(y * 9 + x)) {
                if (p < 32) dLo |= 1L << p else dHi |= 1L << (p - 32)
              }
              p += 1
            }
            (id, aHi, aLo, dHi, dLo)
          }
        }
      }
      .toDF("id", "ahash_hi", "ahash_lo", "dhash_hi", "dhash_lo")
  }

  // ---- real audio codec path (javax.sound.sampled — public JVM API) ----

  /** Encode 16-bit signed PCM mono samples as a canonical WAV byte array
    * (44-byte RIFF header + little-endian payload). Deterministic fixture/
    * datagen helper: PCM WAV is lossless, so a decode of these bytes
    * returns exactly `samples` — the audio twin of [[encodeGrayPng]].
    */
  def encodePcmWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)             // PCM
      .putShort(1)             // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)  // byte rate
      .putShort(2)             // block align
      .putShort(16)            // bits per sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Decode WAV bytes through the REAL JDK codec
    * (`javax.sound.sampled.AudioSystem`) to (sample rate, interleaved
    * 16-bit samples). Only PCM_SIGNED 16-bit payloads are accepted —
    * other encodings and undecodable bytes return None (corrupt rows must
    * not kill a 100 TB scan), mirroring [[decodeGray]]'s ImageIO
    * contract.
    */
  def decodePcm(content: Array[Byte]): Option[(Int, Array[Short])] = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) None
      else {
        val bytes = ais.readAllBytes()
        val out = new Array[Short](bytes.length / 2)
        val hiOff = if (fmt.isBigEndian) 0 else 1
        val loOff = 1 - hiOff
        var i = 0
        while (i < out.length) {
          out(i) = (((bytes(2 * i + hiOff): Int) << 8) | (bytes(2 * i + loOff) & 0xff)).toShort
          i += 1
        }
        Some((fmt.getSampleRate.toInt, out))
      }
    } catch { case _: javax.sound.sampled.UnsupportedAudioFileException | _: java.io.IOException => None }
  }

  /** Deterministic synthetic WAV table over an id column: rate
    * 8000 + (id%3)·4000, n = 64 + id % 33 samples, sample(i) =
    * (id·37 + i·101) % 4001 − 2000. Same closed-form trick as
    * [[syntheticPngs]]: a SQL oracle re-derives every decoded-sample
    * statistic from (id, i) alone, so checking [[audioStats]] against it
    * proves the JDK codec path end-to-end without the oracle touching
    * audio. Output: (id, content).
    */
  def syntheticWavs(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val rate = (8000 + (id % 3) * 4000).toInt
          val n = (64 + id % 33).toInt
          val samples = Array.tabulate(n)(i => ((id * 37 + i * 101L) % 4001L - 2000L).toShort)
          (id, encodePcmWav(rate, samples))
        }
      }
      .toDF("id", "content")
  }

  /** Decoded-audio statistics over an (id, content) frame: REAL decode
    * (`javax.sound.sampled`), integer outputs only (bit-exact for an
    * oracle): (id, sample_rate, n_samples, amp_sum, abs_sum).
    * Undecodable/non-PCM payloads are dropped, as in [[imageStats]].
    */
  def audioStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePcm(bytes).map { case (rate, samples) =>
            var s = 0L
            var a = 0L
            var i = 0
            while (i < samples.length) { s += samples(i); a += math.abs(samples(i).toLong); i += 1 }
            (id, rate.toLong, samples.length.toLong, s, a)
          }
        }
      }
      .toDF("id", "sample_rate", "n_samples", "amp_sum", "abs_sum")
  }

  /** Frame-level audio features over an (id, content) frame: REAL PCM
    * decode, then per non-overlapping frame of `frameLen` samples (the
    * trailing frame may be short) the three classic integer-exact
    * descriptors a corpus-curation pass filters on:
    *
    *  - `energy`   = Σ s² (silence / clipping detection; BIGINT-exact,
    *    16-bit samples square to ≤ 2³⁰ so even 2³² samples cannot
    *    overflow),
    *  - `zero_cross` = count of sign changes between consecutive samples
    *    WITHIN the frame (noisiness / voicedness proxy; sign = s &lt; 0),
    *  - `peak`     = max |s|.
    *
    * Spectral (FFT) features are deliberately absent: transcendental trig
    * is not bit-reproducible across engines, and these time-domain
    * integers carry the same curation signal oracle-exactly. Scale shape:
    * one `mapPartitions` pass emitting n/frameLen rows per asset — no
    * shuffle, no state. Output: (id, frame_idx, n_samples, energy,
    * zero_cross, peak).
    */
  def audioFrameFeatures(media: DataFrame, frameLen: Int = 16): DataFrame = {
    require(frameLen > 0, s"audioFrameFeatures: frameLen must be positive, got $frameLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodePcm(bytes).toSeq.flatMap { case (_, samples) =>
            samples.indices.grouped(frameLen).zipWithIndex.map { case (idxs, f) =>
              var energy = 0L
              var zc = 0L
              var peak = 0L
              var prev = 0
              var first = true
              idxs.foreach { i =>
                val v = samples(i).toInt
                energy += v.toLong * v
                if (!first && ((prev < 0) != (v < 0))) zc += 1
                if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
                prev = v; first = false
              }
              (id, f.toLong, idxs.size.toLong, energy, zc, peak)
            }
          }
        }
      }
      .toDF("id", "frame_idx", "n_samples", "energy", "zero_cross", "peak")
  }

  // ---- real video codec path (YUV4MPEG2 — the standard PUBLIC
  //      uncompressed video interchange format: mjpegtools/ffmpeg's
  //      `-f yuv4mpegpipe`. A plain-text stream header, then per frame a
  //      "FRAME" line + raw planes — parseable in a bare JVM, which is
  //      what finally retires the video stub: compressed codecs (H.264
  //      etc.) still have no JVM decoder, and [[fakeDecode]] remains the
  //      documented slot for them) ----

  /** Encode a YUV4MPEG2 stream whose frame f's luma at (x, y) is
    * `luma(f, x, y)` (0..255). `mono = true` writes Cmono (luma plane
    * only); `mono = false` writes C420jpeg with neutral (128) chroma
    * planes. Uncompressed, so a decode returns exactly `luma` —
    * the [[encodeGrayPng]]/[[encodePcmWav]] trick on video.
    */
  def encodeY4m(width: Int, height: Int, nFrames: Int,
                luma: (Int, Int, Int) => Int, mono: Boolean = true,
                fps: Int = 25): Array[Byte] = {
    val cs = if (mono) "Cmono" else "C420jpeg"
    val header = s"YUV4MPEG2 W$width H$height F$fps:1 Ip A1:1 $cs\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    // 4:2:0 chroma planes are ceil(w/2) × ceil(h/2) EACH — odd dimensions
    // round UP (what ffmpeg emits), not down
    val chroma = if (mono) 0 else ((width + 1) / 2) * ((height + 1) / 2) * 2
    val out = new java.io.ByteArrayOutputStream(
      header.length + nFrames * (frameHdr.length + width * height + chroma))
    out.write(header)
    var f = 0
    while (f < nFrames) {
      out.write(frameHdr)
      val plane = new Array[Byte](width * height)
      var i = 0
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { plane(i) = luma(f, x, y).toByte; i += 1; x += 1 }
        y += 1
      }
      out.write(plane)
      if (!mono) {
        val c = new Array[Byte](chroma)
        java.util.Arrays.fill(c, 128.toByte)
        out.write(c)
      }
      f += 1
    }
    out.toByteArray
  }

  /** Decode YUV4MPEG2 bytes to (width, height, one luma plane per frame).
    * Accepts Cmono and the C420 family (chroma planes skipped — luma is
    * what the pipeline features consume); other colorspaces, truncated
    * streams and non-y4m bytes return None (corrupt rows must not kill a
    * 100 TB scan), mirroring [[decodeGray]]/[[decodePcm]].
    */
  def decodeY4m(content: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < content.length && content(i) != '\n'.toByte) i += 1
      if (i < content.length) i else -1
    }
    val nl = lineEnd(0)
    if (nl < 0) return None
    val header = new String(content, 0, nl, "US-ASCII")
    if (!header.startsWith("YUV4MPEG2")) return None
    var w = -1
    var h = -1
    var cs = "420jpeg" // the y4m default when no C tag is present
    header.split(' ').drop(1).foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("C")) cs = t.drop(1)
    }
    if (w <= 0 || h <= 0) return None
    val chromaBytes =
      if (cs == "mono") 0
      else if (cs.startsWith("420")) ((w + 1) / 2) * ((h + 1) / 2) * 2 // ceil: odd dims round up
      else return None
    val frames = Vector.newBuilder[Array[Byte]]
    var pos = nl + 1
    while (pos < content.length) {
      val fnl = lineEnd(pos)
      if (fnl < 0) return None
      if (!new String(content, pos, fnl - pos, "US-ASCII").startsWith("FRAME")) return None
      pos = fnl + 1
      if (pos + w * h + chromaBytes > content.length) return None
      frames += java.util.Arrays.copyOfRange(content, pos, pos + w * h)
      pos += w * h + chromaBytes
    }
    Some((w, h, frames.result()))
  }

  /** Deterministic synthetic y4m table over an id column: w = 8 + id%5,
    * h = 6 + id%3, 2 + id%4 frames, luma(f, x, y) =
    * (id·31 + f·29 + x·7 + y·13) % 256; odd ids carry C420jpeg chroma
    * (exercising the skip path), even ids Cmono. Same closed-form trick
    * as [[syntheticPngs]]/[[syntheticWavs]]: a SQL oracle re-derives
    * every decoded-luma statistic from (id, f, x, y) alone. Output:
    * (id, content).
    */
  def syntheticY4ms(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 + id % 5).toInt
          val h = (6 + id % 3).toInt
          val nf = (2 + id % 4).toInt
          val bytes = encodeY4m(w, h, nf,
            (f, x, y) => ((id * 31 + f * 29 + x * 7 + y * 13) % 256).toInt,
            mono = id % 2 == 0)
          (id, bytes)
        }
      }
      .toDF("id", "content")
  }

  /** Decoded-video statistics over an (id, content) frame: REAL y4m
    * decode, integer outputs only (bit-exact for an oracle): (id, width,
    * height, n_frames, luma_sum, frame_weighted_sum) — the weighted sum
    * (Σ (f+1)·luma) catches frame-order permutations the plain sum would
    * miss, the decode twin of q70's position-weighted checksum.
    * Undecodable payloads are dropped, as in [[imageStats]].
    */
  def videoStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeY4m(bytes).map { case (w, h, frames) =>
            var sum = 0L
            var weighted = 0L
            var f = 0
            while (f < frames.length) {
              val plane = frames(f)
              var i = 0
              var fs = 0L
              while (i < plane.length) { fs += plane(i) & 0xff; i += 1 }
              sum += fs
              weighted += (f + 1) * fs
              f += 1
            }
            (id, w.toLong, h.toLong, frames.length.toLong, sum, weighted)
          }
        }
      }
      .toDF("id", "width", "height", "n_frames", "luma_sum", "frame_weighted_sum")
  }

  /** Decode + per-frame nearest-neighbor resize to side×side + flatten +
    * /255 normalize — video bytes in, (id, frame_idx, vector) rows out,
    * the video twin of [[imageVectors]]: each sampled frame becomes an
    * indexable embedding (frame-level similarity search / near-dup over
    * video). `stride` keeps every stride-th frame ([[sampleFrames]]'s
    * dial, applied inside the decode so skipped frames never allocate).
    * Same pure-integer source indexing as [[imageVectors]] —
    * platform-exact.
    */
  def videoVectors(media: DataFrame, side: Int = 8, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"videoVectors: stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeY4m(bytes).toSeq.flatMap { case (w, h, frames) =>
            frames.iterator.zipWithIndex.collect {
              case (plane, f) if f % stride == 0 =>
                (id, f, resizeNormalize(plane, w, h, side))
            }
          }
        }
      }
      .toDF("id", "frame_idx", "vector")
  }

  // ---- MJPEG-in-AVI (the COMPRESSED-video front door): Motion JPEG —
  //      every frame a complete baseline JPEG — inside the RIFF/AVI
  //      container, decodable per-frame by javax.imageio on a bare JVM.
  //      This retires the compressed-video byte-hash stand-in
  //      ([[fakeDecode]] remains the documented slot for inter-frame
  //      codecs like H.264, which still have no JVM decoder).
  //
  //      Oracle exactness despite a LOSSY codec: the synthetic frames are
  //      8×8-BLOCK-CONSTANT grayscale at compression quality 1.0 — each
  //      block is DC-only after the DCT, the quality-1.0 quantization
  //      table is all ones, and DC differencing/Huffman are integer-
  //      lossless, so the decoded pixels equal the closed form EXACTLY
  //      (verified bit-for-bit by MediaSpec). The q67 trick, made safe
  //      for a lossy format by synthesizing inputs in its lossless corner.

  /** Encode one grayscale baseline JPEG whose 8×8 block (bx, by) is the
    * CONSTANT `block(bx, by)` (0..255), at compression quality 1.0.
    * Dimensions must be multiples of 8 (block-aligned — the lossless
    * corner; see the section comment).
    */
  def encodeGrayJpeg(width: Int, height: Int, block: (Int, Int) => Int): Array[Byte] = {
    require(width % 8 == 0 && height % 8 == 0,
      s"encodeGrayJpeg: dims must be multiples of 8, got ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, block(x / 8, y / 8)); x += 1 }
      y += 1
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def leInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
    out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
  }
  private def leShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** Encode an MJPEG AVI: RIFF('AVI ') with the standard hdrl (avih +
    * strl/strh/strf) and a movi LIST of one '00dc' JPEG chunk per frame
    * (frame f's 8×8 block (bx, by) = `block(f, bx, by)`). Chunks are
    * even-padded per RIFF. The classic `ffmpeg -c:v mjpeg out.avi`
    * layout, written from first principles.
    */
  def encodeMjpegAvi(width: Int, height: Int, nFrames: Int,
                     block: (Int, Int, Int) => Int, fps: Int = 25): Array[Byte] = {
    val jpegs = (0 until nFrames).map(f => encodeGrayJpeg(width, height, block(f, _, _)))
    val maxJpeg = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max
    def chunk(fcc: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(8 + body.length + 1)
      fourcc(out, fcc); leInt(out, body.length); out.write(body)
      if (body.length % 2 == 1) out.write(0) // RIFF even padding
      out.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream(12 + body.length)
      fourcc(out, "LIST"); leInt(out, 4 + body.length); fourcc(out, listType)
      out.write(body)
      out.toByteArray
    }
    val avih = { // MainAVIHeader (56 bytes)
      val o = new java.io.ByteArrayOutputStream(56)
      leInt(o, 1000000 / fps); leInt(o, 0); leInt(o, 0); leInt(o, 0)
      leInt(o, nFrames); leInt(o, 0); leInt(o, 1); leInt(o, maxJpeg)
      leInt(o, width); leInt(o, height)
      (0 until 4).foreach(_ => leInt(o, 0))
      o.toByteArray
    }
    val strh = { // AVIStreamHeader (56 bytes): 'vids'/'MJPG', rate/scale = fps/1
      val o = new java.io.ByteArrayOutputStream(56)
      fourcc(o, "vids"); fourcc(o, "MJPG"); leInt(o, 0)
      leShort(o, 0); leShort(o, 0) // priority, language
      leInt(o, 0); leInt(o, 1); leInt(o, fps) // initialFrames, scale, rate
      leInt(o, 0); leInt(o, nFrames); leInt(o, maxJpeg)
      leInt(o, -1); leInt(o, 0) // quality (default), sampleSize
      leShort(o, 0); leShort(o, 0); leShort(o, width); leShort(o, height)
      o.toByteArray
    }
    val strf = { // BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
      val o = new java.io.ByteArrayOutputStream(40)
      leInt(o, 40); leInt(o, width); leInt(o, height)
      leShort(o, 1); leShort(o, 24); fourcc(o, "MJPG")
      leInt(o, width * height * 3); leInt(o, 0); leInt(o, 0); leInt(o, 0); leInt(o, 0)
      o.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val out = new java.io.ByteArrayOutputStream(12 + hdrl.length + movi.length)
    fourcc(out, "RIFF"); leInt(out, 4 + hdrl.length + movi.length); fourcc(out, "AVI ")
    out.write(hdrl); out.write(movi)
    out.toByteArray
  }

  /** Decode MJPEG-AVI bytes to (width, height, one gray plane per frame):
    * walk the RIFF chunk tree to the movi LIST, decode every '00dc'/
    * '00db' chunk with `javax.imageio` (a REAL JPEG decode per frame).
    * Non-AVI bytes, truncated chunks, undecodable frames or mixed frame
    * sizes return None (corrupt rows must not kill a 100 TB scan),
    * mirroring [[decodeY4m]].
    */
  def decodeMjpegAvi(content: Array[Byte]): Option[(Int, Int, Vector[Array[Byte]])] = {
    def le(at: Int): Int =
      (content(at) & 0xff) | ((content(at + 1) & 0xff) << 8) |
        ((content(at + 2) & 0xff) << 16) | ((content(at + 3) & 0xff) << 24)
    def fcc(at: Int): String = new String(content, at, 4, "US-ASCII")
    if (content.length < 12 || fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
    val frames = Vector.newBuilder[Array[Byte]]
    var w = -1
    var h = -1
    // (start, end) scan ranges; LISTs we care about are pushed back on
    var stack = List((12, math.min(content.length, 8 + le(4))))
    while (stack.nonEmpty) {
      val (pos, end) = stack.head
      stack = stack.tail
      if (pos + 8 <= end) {
        val id = fcc(pos)
        val size = le(pos + 4)
        if (size < 0 || pos + 8 + size > end) return None // truncated chunk
        val next = pos + 8 + size + (size & 1)
        if (id == "LIST" && size >= 4) {
          // descend into the list body (movi holds the frames; hdrl and
          // unknown lists scan cheaply), then resume the current level
          stack = (pos + 12, pos + 8 + size) :: (next, end) :: stack
        } else {
          if (id == "00dc" || id == "00db") {
            val img =
              try javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(content, pos + 8, size))
              catch { case _: Exception => null }
            if (img == null) return None
            if (w < 0) { w = img.getWidth; h = img.getHeight }
            else if (img.getWidth != w || img.getHeight != h) return None
            val plane = new Array[Byte](w * h)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { plane(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1 }
              y += 1
            }
            frames += plane
          }
          stack = (next, end) :: stack
        }
      }
    }
    val fs = frames.result()
    if (w <= 0 || fs.isEmpty) None else Some((w, h, fs))
  }

  /** Deterministic synthetic MJPEG-AVI table over an id column:
    * w = 8·(1 + id%2), h = 8·(1 + id%3), 2 + id%4 frames, block
    * (f, bx, by) = (id·31 + f·29 + bx·7 + by·13) % 256 — every pixel of a
    * block carries the block value, so a SQL oracle re-derives every
    * decoded statistic from (id, f, bx, by) alone ([[syntheticY4ms]]'s
    * closed form at block granularity). Output: (id, content).
    */
  def syntheticMjpegAvis(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(ids.columns.head).cast("long").as("id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val w = (8 * (1 + id % 2)).toInt
          val h = (8 * (1 + id % 3)).toInt
          val nf = (2 + id % 4).toInt
          (id, encodeMjpegAvi(w, h, nf,
            (f, bx, by) => ((id * 31 + f * 29 + bx * 7 + by * 13) % 256).toInt))
        }
      }
      .toDF("id", "content")
  }

  /** Decoded-MJPEG statistics — [[videoStats]]'s schema over the REAL
    * per-frame JPEG decode: (id, width, height, n_frames, luma_sum,
    * frame_weighted_sum); undecodable payloads drop.
    */
  def mjpegStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeMjpegAvi(bytes).map { case (w, h, frames) =>
            var sum = 0L
            var weighted = 0L
            var f = 0
            while (f < frames.length) {
              val plane = frames(f)
              var i = 0
              var fs = 0L
              while (i < plane.length) { fs += plane(i) & 0xff; i += 1 }
              sum += fs
              weighted += (f + 1) * fs
              f += 1
            }
            (id, w.toLong, h.toLong, frames.length.toLong, sum, weighted)
          }
        }
      }
      .toDF("id", "width", "height", "n_frames", "luma_sum", "frame_weighted_sum")
  }

  /** [[videoVectors]] over MJPEG-AVI payloads: real JPEG decode →
    * nearest-neighbor resize to side×side → flatten → /255 normalize,
    * one indexable embedding per sampled frame.
    */
  def mjpegVectors(media: DataFrame, side: Int = 8, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"mjpegVectors: stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeMjpegAvi(bytes).toSeq.flatMap { case (w, h, frames) =>
            frames.iterator.zipWithIndex.collect {
              case (plane, f) if f % stride == 0 =>
                (id, f, resizeNormalize(plane, w, h, side))
            }
          }
        }
      }
      .toDF("id", "frame_idx", "vector")
  }

  /** Nearest-neighbor resize + /255 normalize of one gray plane — the
    * shared last mile of [[videoVectors]]/[[mjpegVectors]].
    */
  private def resizeNormalize(plane: Array[Byte], w: Int, h: Int, side: Int): Array[Float] = {
    val v = new Array[Float](side * side)
    var y = 0
    while (y < side) {
      val sy = y * h / side
      var x = 0
      while (x < side) {
        val sx = x * w / side
        v(y * side + x) = (plane(sy * w + sx) & 0xff) / 255.0f
        x += 1
      }
      y += 1
    }
    v
  }

  /** Feature extraction over a media Dataset: per-partition batch loop
    * (decoder init happens once per partition, not per row).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: initialize codec/model HERE, once per partition
      rows.map { r =>
        MediaFeatures(r.id, r.kind, r.content.length, fakeDecode(r.content, dim))
      }
    }
  }

  /** Frame sampling: split the payload into fixed-size frames and keep
    * every `stride`-th one — the video-frame-sampling shape (cheap
    * per-partition iteration, output exploded as its own table).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.content.grouped(FrameBytes).zipWithIndex.collect {
        case (frame, idx) if idx % stride == 0 => MediaFrame(r.id, idx, frame)
      }
    }
  }

  /** Metadata "resize": a pure projection on the typed columns (the binary
    * payload would be re-encoded by the real codec; the stub scales metadata
    * and keeps bytes opaque — the plumbing a resize stage needs).
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxSide.toDouble) / greatest(col("width"), col("height"), lit(1)))
    // round (truncation could zero a dimension at extreme aspect ratios)
    // and clamp to >= 1 — a real codec rejects zero-sized frames
    media
      .withColumn("width", greatest(round(col("width") * scale).cast("int"), lit(1)))
      .withColumn("height", greatest(round(col("height") * scale).cast("int"), lit(1)))
  }

  /** Fixture: wrap a text table as media rows (utf-8 payload bytes) —
    * exercises the binary plumbing end-to-end with deterministic content.
    */
  def fromText(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"), // pmod: signed % never hits 0/1 for negative ids
      encode(col(textCol), "UTF-8").as("content"),
      (pmod(col(idCol), lit(640)) + 32).cast("int").as("width"),
      (pmod(col(idCol), lit(480)) + 32).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (length(col(textCol)) * 10).cast("int").as("duration_ms"))
}
