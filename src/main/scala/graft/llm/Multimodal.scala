package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature-extraction
  * runs per-partition over the raw bytes.
  *
  * Four formats decode for REAL in pure JVM — P6 PPM, P5 PGM, 24-bit BMP,
  * 16-bit PCM WAV — and [[decodeAny]]/[[resizeAny]] route payloads to them by
  * magic-byte sniffing. Only genuinely codec-bound formats (JPEG/MP3/MP4,
  * no codec libraries in this container) fall through to a clearly-marked
  * byte-stats STUB branch. The Spark-side plumbing is real throughout:
  * binary column in the schema, partition-wise iteration (executor-side,
  * no driver collect), typed case-class output schemas.
  */
object Multimodal {

  /** Deterministic byte stats — the DECLARED STUB branch for payloads whose
    * format needs a codec library this container doesn't have (JPEG, MP3,
    * MP4, ...): byte count and 0x20 count stand in for real features so the
    * distributed plumbing and the oracle contract stay testable. PPM, PGM,
    * BMP and PCM WAV never reach this — [[decodeAny]] routes them to the
    * real parsers below.
    */
  private def rawByteStats(payload: Array[Byte]): (Int, Long) = {
    var spaces = 0L
    var i = 0
    while (i < payload.length) {
      if (payload(i) == 0x20) spaces += 1
      i += 1
    }
    (payload.length, spaces)
  }

  /** A decoded P6 (binary RGB) PPM image. */
  final case class PpmImage(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** REAL P6 PPM decoder — no codec library needed, the format is a text
    * header (`P6`, width, height, maxval as ASCII decimals separated by
    * whitespace, `#` comments legal between tokens) followed by exactly
    * width*height*3 raw RGB bytes after the single whitespace that
    * terminates maxval. This replaces [[stubDecode]] for the one format a
    * pure JVM can decode byte-exactly offline; JPEG/WAV/MP4 remain
    * declared stubs.
    */
  def decodePpm(bytes: Array[Byte]): Either[String, PpmImage] =
    decodePnm(bytes, '6', 3, "P6 PPM").map {
      case (w, h, mv, pix) => PpmImage(w, h, mv, pix)
    }

  /** A decoded P5 (binary grayscale) PGM image — same header grammar as
    * P6 with magic `P5` and ONE byte per pixel.
    */
  final case class PgmImage(width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  def decodePgm(bytes: Array[Byte]): Either[String, PgmImage] =
    decodePnm(bytes, '5', 1, "P5 PGM").map {
      case (w, h, mv, pix) => PgmImage(w, h, mv, pix)
    }

  /** Shared binary-PNM parser (P5 grayscale / P6 RGB differ only in magic
    * digit and bytes-per-pixel; the header grammar is identical).
    */
  private def decodePnm(
      bytes: Array[Byte], digit: Char, channels: Int,
      what: String): Either[String, (Int, Int, Int, Array[Byte])] = {
    var i = 0
    def skipWsAndComments(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else go = false
      }
    }
    def token(): Either[String, Int] = {
      skipWsAndComments()
      val start = i
      var v = 0L
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
        if (v > Int.MaxValue) return Left("header value overflows")
      }
      if (i == start) Left(s"expected decimal at offset $start") else Right(v.toInt)
    }
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != digit)
      return Left(s"not a $what (bad magic)")
    i = 2
    for {
      w <- token()
      h <- token()
      mv <- token()
      img <- {
        if (w <= 0 || h <= 0) Left(s"non-positive dimensions ${w}x$h")
        else if (mv <= 0 || mv > 255) Left(s"unsupported maxval $mv (1-byte channels only)")
        else if (i >= bytes.length) Left("truncated after header")
        else if (bytes(i) != ' ' && bytes(i) != '\t' && bytes(i) != '\n' && bytes(i) != '\r')
          // the spec requires EXACTLY one whitespace byte after maxval; a
          // non-whitespace byte here is a malformed header, and consuming
          // it blindly would decode the pixel stream one byte off
          Left(s"expected whitespace after maxval, got byte ${bytes(i) & 0xff}")
        else {
          i += 1 // the single whitespace byte terminating maxval
          val need = w.toLong * h * channels
          if (bytes.length - i < need)
            Left(s"truncated pixel data: need $need, have ${bytes.length - i}")
          else Right((w, h, mv, java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
        }
      }
    } yield img
  }

  /** Per-image decode rollup (what the oracle can check byte-exactly):
    * dimensions, maxval, per-channel byte sums, first/last pixel bytes.
    */
  final case class PpmStats(
      doc_id: Long, width: Int, height: Int, maxval: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, px0: Int, pxn: Int)

  /** Per-image average-hash (aHash — the classic perceptual fingerprint a
    * large-scale image-dedup pass blocks on): integer grayscale
    * (r+g+b) DIV 3 per pixel, threshold at the integer mean, one bit per
    * pixel for the first min(npixels, 32) pixels in row-major order. All
    * arithmetic is integer floor-division — bit-identical to the oracle's
    * closed-form SQL replay by construction (no float anywhere).
    */
  final case class PHashRow(doc_id: Long, width: Int, height: Int, ahash: Long)

  /** Decode + hash a (doc_id, payload) binary column with the REAL PPM
    * parser, executor-side (the [[ppmStats]] plumbing, different rollup).
    */
  def ppmAHash(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePpm(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(img) =>
            val npix = img.width * img.height
            val gray = new Array[Long](npix)
            var sum = 0L
            var j = 0
            while (j < npix) {
              val r = img.pixels(3 * j) & 0xff
              val g = img.pixels(3 * j + 1) & 0xff
              val b = img.pixels(3 * j + 2) & 0xff
              gray(j) = (r + g + b) / 3
              sum += gray(j)
              j += 1
            }
            val mean = sum / npix
            var hash = 0L
            j = 0
            while (j < npix && j < 32) {
              if (gray(j) >= mean) hash |= 1L << j
              j += 1
            }
            PHashRow(id, img.width, img.height, hash)
        }
      })
      .toDF()
  }

  /** Decode a (doc_id, payload) binary column with the REAL PPM parser,
    * executor-side. A payload that fails to decode fails the job loudly —
    * a corrupt fixture must never pass as a parsed one.
    */
  def ppmStats(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePpm(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(img) =>
            var (r, g, b) = (0L, 0L, 0L)
            var i = 0
            while (i < img.pixels.length) {
              val v = img.pixels(i) & 0xff
              (i % 3: @annotation.switch) match {
                case 0 => r += v
                case 1 => g += v
                case 2 => b += v
              }
              i += 1
            }
            PpmStats(id, img.width, img.height, img.maxVal, r, g, b,
              img.pixels.head & 0xff, img.pixels.last & 0xff)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Per-image PGM decode rollup: dimensions, maxval, pixel-byte sum,
    * first/last pixels — everything the oracle reproduces closed-form.
    */
  final case class PgmStats(
      doc_id: Long, width: Int, height: Int, maxval: Int,
      sum_v: Long, px0: Int, pxn: Int)

  /** Decode a (doc_id, payload) binary column with the REAL P5 parser,
    * executor-side; corrupt payloads fail loudly (same contract as
    * [[ppmStats]]).
    */
  def pgmStats(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePgm(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(img) =>
            PgmStats(id, img.width, img.height, img.maxVal, sumBytes(img.pixels),
              img.pixels.head & 0xff, img.pixels.last & 0xff)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** 1-channel nearest-neighbor resample — [[resizePpmNearest]] for P5. */
  def resizePgmNearest(img: PgmImage, tw: Int, th: Int): PgmImage = {
    require(tw > 0 && th > 0, s"bad target ${tw}x$th")
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = img.pixels(sy * img.width + x * img.width / tw)
        x += 1
      }
      y += 1
    }
    PgmImage(tw, th, img.maxVal, out)
  }

  /** REAL nearest-neighbor resize over a decoded [[PpmImage]]: output
    * pixel (x, y) samples source pixel (x·sw div tw, y·sh div th) —
    * integer arithmetic, so the mapping is engine-reproducible exactly.
    * With [[decodePpm]] this replaces the resize STUB for PPM payloads;
    * formats needing a codec stay stubbed.
    */
  def resizePpmNearest(img: PpmImage, tw: Int, th: Int): PpmImage = {
    require(tw > 0 && th > 0, s"bad target ${tw}x$th")
    val out = new Array[Byte](tw * th * 3)
    var y = 0
    while (y < th) {
      val sy = y * img.height / th
      var x = 0
      while (x < tw) {
        val sx = x * img.width / tw
        val src = (sy * img.width + sx) * 3
        val dst = (y * tw + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    PpmImage(tw, th, img.maxVal, out)
  }

  /** Per-image REAL decode→resize rollup (dims + per-channel byte sums +
    * corner pixels of the RESIZED image, all oracle-checkable).
    */
  final case class PpmResizeStats(
      doc_id: Long, src_w: Int, src_h: Int, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, px0: Int, pxn: Int)

  /** Decode a (doc_id, payload) binary column, nearest-neighbor resize to
    * (tw, th), and report resized-image stats — the real image-preprocess
    * stage shape (decode → scale → stats), executor-side.
    */
  def ppmResizeStats(withPayload: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePpm(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(src) =>
            val img = resizePpmNearest(src, tw, th)
            var (r, g, b) = (0L, 0L, 0L)
            var i = 0
            while (i < img.pixels.length) {
              val v = img.pixels(i) & 0xff
              (i % 3: @annotation.switch) match {
                case 0 => r += v
                case 1 => g += v
                case 2 => b += v
              }
              i += 1
            }
            PpmResizeStats(id, src.width, src.height, tw, th, r, g, b,
              img.pixels.head & 0xff, img.pixels.last & 0xff)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** A decoded PCM WAV clip (16-bit samples, channel-interleaved). */
  final case class WavAudio(
      channels: Int, sampleRate: Int, bitsPerSample: Int, samples: Array[Short])

  /** REAL RIFF/WAVE decoder for 16-bit PCM — the audio sibling of
    * [[decodePpm]], pure JVM: RIFF header, generic chunk walk (unknown
    * chunks skipped, odd-size chunks padded per spec), `fmt ` must be
    * audio format 1 (PCM) with 16-bit samples, `data` holds
    * little-endian int16 frames. Compressed codecs stay declared stubs.
    */
  def decodeWav(bytes: Array[Byte]): Either[String, WavAudio] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = le16(i).toLong | (le16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(bytes, i, 4, "US-ASCII")
    if (bytes.length < 12) return Left("too short for a RIFF header")
    if (tag(0) != "RIFF") return Left("bad magic (not RIFF)")
    if (tag(8) != "WAVE") return Left("not a WAVE form")
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // channels, sampleRate, bits
    while (i + 8 <= bytes.length) {
      val id = tag(i)
      val size = le32(i + 4)
      val body = i + 8
      if (body + size > bytes.length) return Left(s"truncated $id chunk")
      id match {
        case "fmt " =>
          if (size < 16) return Left("fmt chunk too small")
          val audioFormat = le16(body)
          if (audioFormat != 1) return Left(s"unsupported audio format $audioFormat (PCM only)")
          val bits = le16(body + 14)
          if (bits != 16) return Left(s"unsupported bit depth $bits (16-bit only)")
          fmt = Some((le16(body + 2), le32(body + 4).toInt, bits))
        case "data" =>
          val (ch, rate, bits) = fmt.getOrElse(return Left("data chunk before fmt"))
          if (size % 2 != 0) return Left("odd data size for 16-bit samples")
          val samples = new Array[Short]((size / 2).toInt)
          var s = 0
          while (s < samples.length) { samples(s) = le16(body + 2 * s).toShort; s += 1 }
          return Right(WavAudio(ch, rate, bits, samples))
        case _ => () // unknown chunk: skip
      }
      i = body + size.toInt + (size % 2).toInt // chunks pad to even offsets
    }
    Left("no data chunk")
  }

  /** Per-clip audio fingerprint — the audio sibling of [[ppmAHash]]: the
    * clip's samples split into 16 equal windows (tail remainder ignored),
    * per-window absolute-amplitude energy, one bit per window thresholded
    * at the integer mean of the 16 energies. The energy-profile
    * fingerprint an audio-dedup pass blocks on, all integer arithmetic —
    * bit-identical to the closed-form SQL replay.
    */
  final case class AudioFpRow(doc_id: Long, n_samples: Int, afp: Long)

  def wavAFingerprint(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(wav) =>
            require(wav.channels == 1, s"doc $id: fingerprint fixture must be mono")
            val n = wav.samples.length
            require(n >= 16, s"doc $id: too short to window ($n samples)")
            val win = n / 16
            val en = new Array[Long](16)
            var total = 0L
            var w = 0
            while (w < 16) {
              var k = 0
              var e = 0L
              while (k < win) { e += math.abs(wav.samples(w * win + k).toLong); k += 1 }
              en(w) = e; total += e; w += 1
            }
            val mean = total / 16
            var fp = 0L
            w = 0
            while (w < 16) { if (en(w) >= mean) fp |= 1L << w; w += 1 }
            AudioFpRow(id, n, fp)
        }
      })
      .toDF()
  }

  /** Per-clip decode rollup for the oracle: format fields, frame count,
    * integer amplitude sums, first/last samples.
    */
  final case class WavStats(
      doc_id: Long, channels: Int, sample_rate: Int, n_samples: Int,
      sum_abs: Long, s0: Int, sn: Int)

  /** Decode a (doc_id, payload) binary column with the REAL WAV parser,
    * executor-side; corrupt payloads fail the job loudly.
    */
  def wavStats(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(wav) if wav.samples.isEmpty =>
            // a zero-size data chunk is structurally legal WAV; the stats
            // contract (first/last sample) is not defined for it — fail
            // with the doc id instead of an unlabeled NoSuchElementException
            throw new IllegalArgumentException(s"doc $id: empty data chunk (0 samples)")
          case Right(wav) =>
            var sumAbs = 0L
            var s = 0
            while (s < wav.samples.length) { sumAbs += math.abs(wav.samples(s).toLong); s += 1 }
            WavStats(id, wav.channels, wav.sampleRate, wav.samples.length,
              sumAbs, wav.samples.head.toInt, wav.samples.last.toInt)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Per-clip decimation rollup: in/out frame counts, the output rate,
    * integer amplitude sum and boundary samples of the KEPT stream.
    */
  final case class WavResampleStats(
      doc_id: Long, channels: Int, rate_in: Int, rate_out: Int,
      n_frames_in: Int, n_frames_out: Int, sum_abs_out: Long, f0: Int, fn: Int)

  /** REAL audio resample (integer decimation): decode 16-bit PCM with
    * [[decodeWav]], keep every `factor`-th FRAME (all channels of a kept
    * frame stay together — decimating raw samples would de-interleave
    * stereo), report stats of the decimated stream. Executor-side
    * mapPartitions like the other codecs; proper band-limited resampling
    * needs a filter kernel, so non-integer ratios stay out of scope — this
    * is the exact integer-arithmetic subset both engines can agree on.
    */
  def wavDecimateStats(withPayload: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"decimation factor must be >= 1, got $factor")
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeWav(bytes) match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(wav) if wav.samples.isEmpty ||
              wav.samples.length % wav.channels != 0 =>
            throw new IllegalArgumentException(
              s"doc $id: data chunk is empty or not frame-aligned " +
                s"(${wav.samples.length} samples, ${wav.channels} channels)")
          case Right(wav) =>
            val ch = wav.channels
            val framesIn = wav.samples.length / ch
            var sumAbs = 0L
            var outFrames = 0
            var f = 0
            while (f < framesIn) {
              var c = 0
              while (c < ch) { sumAbs += math.abs(wav.samples(f * ch + c).toLong); c += 1 }
              outFrames += 1
              f += factor
            }
            val lastKept = ((framesIn - 1) / factor) * factor
            WavResampleStats(id, ch, wav.sampleRate, wav.sampleRate / factor,
              framesIn, outFrames, sumAbs,
              wav.samples(0).toInt, wav.samples(lastKept * ch + ch - 1).toInt)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** REAL 24-bit BMP decoder (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * uncompressed BI_RGB) — the third pure-JVM format next to PPM and WAV:
    * rows are padded to 4-byte multiples, stored bottom-up (top-down when
    * the height field is negative) in BGR order. Returns the top-down RGB
    * raster in the same shape as [[decodePpm]] so the resize path is
    * shared. Palette/compressed/other-depth BMPs stay declared stubs.
    */
  def decodeBmp(bytes: Array[Byte]): Either[String, PpmImage] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
    if (bytes.length < 54) return Left("too short for BMP headers")
    if (bytes(0) != 'B' || bytes(1) != 'M') return Left("bad magic (not BM)")
    val pixelOff = le32(10)
    val dibSize = le32(14)
    if (dibSize < 40) return Left(s"unsupported DIB header size $dibSize")
    val w = le32(18)
    val hSigned = le32(22)
    val planes = le16(26)
    val bpp = le16(28)
    val compression = le32(30)
    if (planes != 1) return Left(s"bad plane count $planes")
    if (bpp != 24) return Left(s"unsupported bit depth $bpp (24-bit only)")
    if (compression != 0) return Left(s"unsupported compression $compression (BI_RGB only)")
    val topDown = hSigned < 0
    val h = math.abs(hSigned)
    if (w <= 0 || h <= 0) return Left(s"non-positive dimensions ${w}x$hSigned")
    if (w > (Int.MaxValue - 3) / 3 || h > Int.MaxValue / (((w * 3 + 3) / 4) * 4).max(1))
      return Left("dimensions overflow")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    if (pixelOff < 54 || pixelOff.toLong + rowBytes.toLong * h > bytes.length)
      return Left(s"truncated pixel data: need ${rowBytes.toLong * h}, " +
        s"have ${bytes.length - pixelOff}")
    val out = new Array[Byte](w * h * 3)
    var r = 0
    while (r < h) {
      val y = if (topDown) r else h - 1 - r // storage row r → image row y
      var x = 0
      while (x < w) {
        val src = pixelOff + r * rowBytes + x * 3 // B, G, R
        val dst = (y * w + x) * 3 // R, G, B
        out(dst) = bytes(src + 2)
        out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src)
        x += 1
      }
      r += 1
    }
    Right(PpmImage(w, h, 255, out))
  }

  private def isPpm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && b(1) == '6'
  private def isPgm(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'P' && b(1) == '5'
  private def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G'

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'
  private def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def sumBytes(a: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < a.length) { s += a(i) & 0xff; i += 1 }
    s
  }

  /** Unified decoded-media row: images report (width, height, 3 channels,
    * pixel count, pixel-byte sum); audio reports (channels, sample count,
    * absolute-amplitude sum); unrecognized formats report the declared-stub
    * byte stats with -1 dimensions.
    */
  final case class DecodedMedia(
      doc_id: Long, format: String, width: Int, height: Int, channels: Int,
      n_units: Long, payload_bytes: Int, checksum: Long)

  /** Generic decode over a (doc_id, payload) binary column: sniff the magic
    * bytes and route to the REAL parser ([[decodePpm]] / [[decodeBmp]] /
    * [[decodeWav]]); only genuinely codec-bound formats fall through to the
    * declared byte-stats stub. A payload that CLAIMS a decodable magic but
    * fails to parse fails the job loudly — corrupt media must never pass
    * silently as "raw".
    */
  def decodeAny(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        def orThrow[A](e: Either[String, A]): A = e match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(a) => a
        }
        if (isPpm(bytes)) {
          val img = orThrow(decodePpm(bytes))
          DecodedMedia(id, "ppm", img.width, img.height, 3,
            img.width.toLong * img.height, bytes.length, sumBytes(img.pixels))
        } else if (isPgm(bytes)) {
          val img = orThrow(decodePgm(bytes))
          DecodedMedia(id, "pgm", img.width, img.height, 1,
            img.width.toLong * img.height, bytes.length, sumBytes(img.pixels))
        } else if (isBmp(bytes)) {
          val img = orThrow(decodeBmp(bytes))
          DecodedMedia(id, "bmp", img.width, img.height, 3,
            img.width.toLong * img.height, bytes.length, sumBytes(img.pixels))
        } else if (isPng(bytes)) {
          val img = orThrow(decodePng(bytes))
          DecodedMedia(id, "png", img.width, img.height, 3,
            img.width.toLong * img.height, bytes.length, sumBytes(img.pixels))
        } else if (isWav(bytes)) {
          val wav = orThrow(decodeWav(bytes))
          var sumAbs = 0L
          var s = 0
          while (s < wav.samples.length) { sumAbs += math.abs(wav.samples(s).toLong); s += 1 }
          DecodedMedia(id, "wav", -1, -1, wav.channels, wav.samples.length.toLong,
            bytes.length, sumAbs)
        } else {
          val (n, spaces) = rawByteStats(bytes)
          DecodedMedia(id, "raw", -1, -1, -1, n.toLong, n, spaces)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** Unified resized-media row: for really-decodable images the byte length
    * of the re-encoded output and the resized raster's pixel-byte sum; for
    * everything else the declared-stub cost model with checksum -1.
    */
  final case class ResizedAny(
      doc_id: Long, format: String, src_bytes: Int, target_w: Int, target_h: Int,
      resized_bytes: Long, checksum: Long)

  /** Byte length of a P6 re-encode of a (tw × th, maxval 255) raster:
    * "P6\n{tw} {th}\n255\n" + 3 bytes/pixel.
    */
  def ppmEncodedLength(tw: Int, th: Int): Long =
    3L + tw.toString.length + 1 + th.toString.length + 5 + tw.toLong * th * 3

  /** Byte length of a P5 re-encode: same header shape, 1 byte/pixel. */
  def pgmEncodedLength(tw: Int, th: Int): Long =
    3L + tw.toString.length + 1 + th.toString.length + 5 + tw.toLong * th

  /** Byte length of a 24-bit BI_RGB BMP re-encode: 54-byte headers + 4-byte
    * padded rows.
    */
  def bmpEncodedLength(tw: Int, th: Int): Long =
    54L + (((tw * 3 + 3) / 4) * 4).toLong * th

  /** Byte length of a STORED-deflate truecolor PNG re-encode (the
    * deterministic encoding this engine emits): signature 8 + IHDR 25 +
    * IDAT (8 + 11 + scanline stream + 4) + IEND 12.
    */
  def pngEncodedLength(tw: Int, th: Int): Long =
    68L + th.toLong * (3L * tw + 1)

  /** Generic resize over a (doc_id, payload) binary column: PPM and BMP
    * payloads run the REAL decode → nearest-neighbor resample
    * ([[resizePpmNearest]]) → re-encode-length accounting; audio and
    * unrecognized formats keep the declared-stub cost model (output bytes
    * scale with target area, bounded by the source size).
    */
  def resizeAny(withPayload: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        def orThrow[A](e: Either[String, A]): A = e match {
          case Left(err) => throw new IllegalArgumentException(s"doc $id: $err")
          case Right(a) => a
        }
        def resized(img: PpmImage): PpmImage = resizePpmNearest(img, tw, th)
        if (isPpm(bytes)) {
          val out = resized(orThrow(decodePpm(bytes)))
          ResizedAny(id, "ppm", bytes.length, tw, th,
            ppmEncodedLength(tw, th), sumBytes(out.pixels))
        } else if (isPgm(bytes)) {
          val out = resizePgmNearest(orThrow(decodePgm(bytes)), tw, th)
          ResizedAny(id, "pgm", bytes.length, tw, th,
            pgmEncodedLength(tw, th), sumBytes(out.pixels))
        } else if (isBmp(bytes)) {
          val out = resized(orThrow(decodeBmp(bytes)))
          ResizedAny(id, "bmp", bytes.length, tw, th,
            bmpEncodedLength(tw, th), sumBytes(out.pixels))
        } else if (isPng(bytes)) {
          val png = orThrow(decodePng(bytes))
          val out = resized(PpmImage(png.width, png.height, 255, png.pixels))
          ResizedAny(id, "png", bytes.length, tw, th,
            pngEncodedLength(tw, th), sumBytes(out.pixels))
        } else {
          val fmt = if (isWav(bytes)) "wav" else "raw"
          ResizedAny(id, fmt, bytes.length, tw, th,
            math.min(bytes.length.toLong, (tw.toLong * th) / 64), -1L)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }

  /** A decoded 8-bit RGB (color type 2) PNG. */
  final case class PngImage(width: Int, height: Int, pixels: Array[Byte])

  /** REAL PNG decoder for the baseline still-image profile — 8-bit-depth
    * truecolor (color type 2), non-interlaced: signature check, chunk
    * walk (IHDR → IDAT* → IEND), zlib INFLATE of the concatenated IDAT
    * stream via java.util.zip.Inflater (a real zlib, including Adler-32
    * verification — a corrupted byte stream fails loudly), then FULL
    * scanline unfiltering: all five PNG filter types (None/Sub/Up/
    * Average/Paeth) with the spec's exact Paeth predictor. Chunk CRCs are
    * not verified (the common fast-path decoder trade-off — libpng's
    * CRC_QUIET_USE; integrity is already covered by zlib's Adler-32 over
    * the pixel stream). Palette/alpha/16-bit/interlaced images are
    * rejected with reasons, not mis-decoded.
    */
  def decodePng(bytes: Array[Byte]): Either[String, PngImage] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (bytes.length < 8 || !java.util.Arrays.equals(bytes.take(8), sig))
      Left("not a PNG: bad signature")
    else {
      var off = 8
      var w, h = 0
      var seenIhdr, seenIend = false
      var err: String = null
      val idat = new java.io.ByteArrayOutputStream()
      while (err == null && !seenIend) {
        if (off + 8 > bytes.length) err = "truncated chunk header"
        else {
          val len = be32(off)
          val ctype = new String(bytes, off + 4, 4, "US-ASCII")
          if (len > Int.MaxValue - 12 || off + 12 + len > bytes.length)
            err = s"truncated $ctype chunk"
          else {
            val data = off + 8
            ctype match {
              case "IHDR" =>
                if (len != 13) err = s"IHDR length $len"
                else {
                  w = be32(data).toInt; h = be32(data + 4).toInt
                  val (bd, ct, cm, fm, im) =
                    (bytes(data + 8), bytes(data + 9), bytes(data + 10),
                      bytes(data + 11), bytes(data + 12))
                  if (w <= 0 || h <= 0) err = s"bad dims ${w}x$h"
                  else if (w.toLong * h * 3 + h > Int.MaxValue)
                    // raster/scanline buffers are Int-indexed arrays; an
                    // oversized header must reject, not overflow into a
                    // NegativeArraySizeException or a multi-GB allocation
                    err = s"dims ${w}x$h exceed the decodable raster bound"
                  else if (bd != 8) err = s"unsupported bit depth $bd"
                  else if (ct != 2) err = s"unsupported color type $ct"
                  else if (cm != 0 || fm != 0) err = "bad compression/filter method"
                  else if (im != 0) err = "interlaced PNG unsupported"
                  else seenIhdr = true
                }
              case "IDAT" =>
                if (!seenIhdr) err = "IDAT before IHDR"
                else idat.write(bytes, data, len.toInt)
              case "IEND" => seenIend = true
              case _ => () // ancillary chunk: skip
            }
            off = data + len.toInt + 4 // data + CRC
          }
        }
      }
      if (err != null) Left(err)
      else if (!seenIhdr) Left("missing IHDR")
      else {
        val raw = new Array[Byte](h * (1 + 3 * w))
        val inf = new java.util.zip.Inflater()
        inf.setInput(idat.toByteArray)
        try {
          var got = 0
          val overflow = new Array[Byte](64)
          // Drain to the STREAM END, not just until the output buffer
          // fills: the Adler-32 trailer is only verified when the
          // inflater consumes it, so stopping at raw.length would skip
          // the integrity check the decoder's contract promises.
          while (!inf.finished()) {
            val n =
              if (got < raw.length) {
                val k = inf.inflate(raw, got, raw.length - got)
                got += k; k
              } else {
                val k = inf.inflate(overflow)
                if (k > 0) return Left(s"pixel stream long: more than ${raw.length}")
                k
              }
            if (n == 0 && !inf.finished()) {
              if (inf.needsInput()) return Left("zlib stream truncated")
              return Left(
                if (inf.needsDictionary()) "zlib preset dictionary unsupported"
                else "zlib stream stalled")
            }
          }
          if (got < raw.length)
            Left(s"pixel stream short: $got of ${raw.length}")
          else {
            // unfilter in place into the output raster
            val out = new Array[Byte](h * w * 3)
            val stride = 3 * w
            var r = 0
            while (r < h) {
              val f = raw(r * (stride + 1)) & 0xff
              var x = 0
              while (x < stride) {
                val cur = raw(r * (stride + 1) + 1 + x) & 0xff
                val a = if (x >= 3) out(r * stride + x - 3) & 0xff else 0
                val b = if (r > 0) out((r - 1) * stride + x) & 0xff else 0
                val c = if (r > 0 && x >= 3) out((r - 1) * stride + x - 3) & 0xff else 0
                val rec = f match {
                  case 0 => cur
                  case 1 => cur + a
                  case 2 => cur + b
                  case 3 => cur + (a + b) / 2
                  case 4 =>
                    val p = a + b - c
                    val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
                    val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
                    cur + pred
                  case other => return Left(s"unknown filter type $other on row $r")
                }
                out(r * stride + x) = (rec & 0xff).toByte
                x += 1
              }
              r += 1
            }
            Right(PngImage(w, h, out))
          }
        } catch {
          case e: java.util.zip.DataFormatException =>
            Left(s"zlib error: ${e.getMessage}")
        } finally inf.end()
      }
    }
  }

  /** Per-image PNG decode rollup, same contract as [[ppmStats]]: corrupt
    * payloads fail the job loudly.
    */
  final case class PngStats(
      doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, px0: Int, pxn: Int)

  def pngStats(withPayload: DataFrame): DataFrame = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodePng(bytes) match {
          case Left(e) => throw new IllegalArgumentException(s"doc $id: $e")
          case Right(img) =>
            var (r, g, b) = (0L, 0L, 0L)
            var i = 0
            while (i < img.pixels.length) {
              val v = img.pixels(i) & 0xff
              (i % 3: @annotation.switch) match {
                case 0 => r += v
                case 1 => g += v
                case 2 => b += v
              }
              i += 1
            }
            PngStats(id, img.width, img.height, r, g, b,
              img.pixels.head & 0xff, img.pixels.last & 0xff)
        }
      })
      .toDF()
      .orderBy("doc_id")
  }
}
