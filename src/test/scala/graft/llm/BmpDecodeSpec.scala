package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact pins for the REAL 24-bit BMP parser (Multimodal.decodeBmp)
  * and the magic-byte dispatch (Multimodal.decodeAny/resizeAny): bottom-up
  * BGR rows with 4-byte padding invert to the top-down RGB raster; the
  * negative-height (top-down) variant decodes without the row flip;
  * malformed inputs are rejected with a reason instead of mis-decoding; and
  * every sniffable format routes to its own parser.
  */
class BmpDecodeSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Hand-build a 24-bit BI_RGB BMP from a top-down RGB raster. */
  private def bmp(w: Int, h: Int, rgb: Array[Byte], topDown: Boolean = false): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val px = new Array[Byte](rowBytes * h)
    for (r <- 0 until h; x <- 0 until w) {
      val y = if (topDown) r else h - 1 - r
      val src = (y * w + x) * 3
      val dst = r * rowBytes + x * 3
      px(dst) = rgb(src + 2) // B
      px(dst + 1) = rgb(src + 1) // G
      px(dst + 2) = rgb(src) // R
    }
    "BM".getBytes("US-ASCII") ++ le32(54 + px.length) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(if (topDown) -h else h) ++
      le16(1) ++ le16(24) ++ le32(0) ++ le32(px.length) ++
      le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0) ++ px
  }

  private val rgb3x2 = Array.tabulate(3 * 2 * 3)(i => (i * 7 % 256).toByte)

  test("bottom-up padded rows invert to the top-down RGB raster byte-exactly") {
    // w=3: row stride 12 with 3 pad bytes — exactly the case that catches
    // a decoder indexing the pixel array without the stride
    val got = Multimodal.decodeBmp(bmp(3, 2, rgb3x2))
    assert(got.isRight, got)
    val img = got.toOption.get
    assert(img.width == 3 && img.height == 2 && img.maxVal == 255)
    assert(img.pixels.toSeq == rgb3x2.toSeq)
  }

  test("negative height decodes top-down without the row flip") {
    val got = Multimodal.decodeBmp(bmp(3, 2, rgb3x2, topDown = true))
    assert(got.toOption.get.pixels.toSeq == rgb3x2.toSeq)
  }

  test("pad-free width (w=4) also round-trips") {
    val rgb = Array.tabulate(4 * 2 * 3)(i => (i * 5 % 256).toByte)
    assert(Multimodal.decodeBmp(bmp(4, 2, rgb)).toOption.get.pixels.toSeq == rgb.toSeq)
  }

  test("malformed BMPs are rejected with a reason") {
    val ok = bmp(3, 2, rgb3x2)
    assert(Multimodal.decodeBmp("XX".getBytes ++ ok.drop(2)).left.exists(_.contains("magic")))
    assert(Multimodal.decodeBmp(ok.take(40)).left.exists(_.contains("too short")))
    assert(Multimodal.decodeBmp(ok.dropRight(1)).left.exists(_.contains("truncated")))
    val bpp8 = ok.clone; bpp8(28) = 8
    assert(Multimodal.decodeBmp(bpp8).left.exists(_.contains("bit depth")))
    val rle = ok.clone; rle(30) = 1
    assert(Multimodal.decodeBmp(rle).left.exists(_.contains("compression")))
  }

  test("decodeAny dispatches each magic to its own parser") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val ppm = "P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 20, 30)
    val wav = "RIFF".getBytes ++ le32(36 + 4) ++ "WAVEfmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(8000) ++ le32(32000) ++ le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(4) ++ le16(100) ++ le16(65536 - 50) // +100, -50
    val pgm = "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](7, 9)
    val rows = Multimodal.decodeAny(Seq(
      (1L, bmp(3, 2, rgb3x2)), (2L, ppm), (3L, wav), (4L, "just text".getBytes),
      (5L, pgm))
      .toDF("doc_id", "payload")).collect()
    def row(id: Long) = rows.find(_.getLong(0) == id).get
    assert(row(1L).getString(1) == "bmp" && row(1L).getInt(2) == 3 && row(1L).getInt(3) == 2)
    assert(row(1L).getLong(7) == rgb3x2.map(_ & 0xff).sum.toLong)
    assert(row(2L).getString(1) == "ppm" && row(2L).getLong(7) == 60L)
    assert(row(3L).getString(1) == "wav" && row(3L).getInt(4) == 2
      && row(3L).getLong(5) == 2L && row(3L).getLong(7) == 150L)
    assert(row(4L).getString(1) == "raw" && row(4L).getLong(7) == 1L)
    assert(row(5L).getString(1) == "pgm" && row(5L).getInt(2) == 2
      && row(5L).getInt(4) == 1 && row(5L).getLong(7) == 16L)
  }

  test("resizeAny really resamples images and cost-models the rest") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // 2x1 source: pixels A=(1,2,3), B=(200,201,202); upscale to 4x2 tiles
    // each source pixel 2x2 -> checksum = 4*(1+2+3) + 4*(600+3) offsets
    val rgb = Array[Byte](1, 2, 3, 200.toByte, 201.toByte, 202.toByte)
    val expected = 4L * (1 + 2 + 3) + 4L * (200 + 201 + 202)
    val rows = Multimodal.resizeAny(Seq(
      (1L, bmp(2, 1, rgb)),
      (2L, "P6\n2 1\n255\n".getBytes("US-ASCII") ++ rgb),
      (3L, "just text".getBytes),
      (4L, "P5\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](10, 40)))
      .toDF("doc_id", "payload"), tw = 4, th = 2).collect()
    def row(id: Long) = rows.find(_.getLong(0) == id).get
    assert(row(1L).getString(1) == "bmp" && row(1L).getLong(6) == expected)
    assert(row(1L).getLong(5) == Multimodal.bmpEncodedLength(4, 2))
    assert(row(2L).getString(1) == "ppm" && row(2L).getLong(6) == expected)
    assert(row(2L).getLong(5) == Multimodal.ppmEncodedLength(4, 2))
    assert(row(3L).getString(1) == "raw" && row(3L).getLong(6) == -1L)
    assert(row(3L).getLong(5) == math.min(9L, 4L * 2 / 64))
    // 2x1 gray upscaled to 4x2: each source pixel tiles 2x2
    assert(row(4L).getString(1) == "pgm" && row(4L).getLong(6) == 4L * 10 + 4L * 40)
    assert(row(4L).getLong(5) == Multimodal.pgmEncodedLength(4, 2))
  }
}
