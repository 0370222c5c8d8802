package graft.llm

import java.nio.charset.StandardCharsets.US_ASCII

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact pins for the REAL P6 PPM parser (Multimodal.decodePpm):
  * well-formed images round-trip exactly; header comments, arbitrary
  * whitespace runs, and non-255 maxvals parse; malformed inputs are
  * rejected with a reason instead of mis-decoding.
  */
class PpmDecodeSpec extends AnyFunSuite {

  private def ppm(header: String, pixels: Array[Byte]): Array[Byte] =
    header.getBytes(US_ASCII) ++ pixels

  test("decodes a minimal 2x2 image byte-exactly") {
    val px = Array.tabulate(12)(i => (i * 11 % 256).toByte)
    val got = Multimodal.decodePpm(ppm("P6\n2 2\n255\n", px))
    assert(got.isRight)
    val img = got.toOption.get
    assert(img.width == 2 && img.height == 2 && img.maxVal == 255)
    assert(img.pixels.toSeq == px.toSeq, "pixel payload must round-trip byte-exactly")
  }

  test("skips header comments and tolerates whitespace runs") {
    val px = Array.fill(3)(0x7f.toByte)
    val got = Multimodal.decodePpm(
      ppm("P6\n# made by a test\n# second comment\n  1\t1 \n# between dims and maxval\n17\n", px))
    assert(got.isRight)
    val img = got.toOption.get
    assert(img.width == 1 && img.height == 1 && img.maxVal == 17)
    assert(img.pixels.toSeq == px.toSeq)
  }

  test("a pixel byte that looks like whitespace is data, not separator") {
    // first pixel byte 0x0a (newline): the parser must consume exactly ONE
    // whitespace byte after maxval and treat the rest as pixels
    val px = Array[Byte](0x0a, 0x20, 0x23)
    val got = Multimodal.decodePpm(ppm("P6 1 1 255\n", px))
    assert(got.toOption.get.pixels.toSeq == px.toSeq)
  }

  test("nearest-neighbor resize picks the hand-computable source pixels") {
    // 2x2 source, channels encode position: pixel (sx, sy) = (10*sx+sy)*3+{0,1,2}
    val src = Multimodal.PpmImage(2, 2, 255,
      Array.tabulate(12) { i => val p = i / 3; ((p % 2) * 10 + p / 2) * 3 + i % 3 }
        .map(_.toByte))
    // upscale 2x2 -> 4x4: sx = x*2/4 = x/2 — each source pixel tiles 2x2
    val up = Multimodal.resizePpmNearest(src, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val expected = ((x / 2) * 10 + y / 2) * 3 + c
      assert((up.pixels(((y * 4) + x) * 3 + c) & 0xff) == expected, s"up ($x,$y,$c)")
    }
    // downscale 2x2 -> 1x1: picks (0, 0) exactly
    val down = Multimodal.resizePpmNearest(src, 1, 1)
    assert(down.pixels.toSeq == src.pixels.take(3).toSeq)
  }

  test("P5 grayscale shares the grammar: comments parse, one byte per pixel, errors reject") {
    val px = Array[Byte](1, 2, 3, 4, 5, 6)
    val got = Multimodal.decodePgm(ppm("P5\n# gray\n3 2\n255\n", px))
    assert(got.isRight)
    val img = got.toOption.get
    assert(img.width == 3 && img.height == 2 && img.maxVal == 255)
    assert(img.pixels.toSeq == px.toSeq)
    // a P6 fed to the P5 decoder is a magic error, not a mis-decode
    assert(Multimodal.decodePgm(ppm("P6\n1 1\n255\n", Array[Byte](1, 2, 3)))
      .left.exists(_.contains("magic")))
    // pixel budget is w*h, not w*h*3 — one byte short must reject
    assert(Multimodal.decodePgm(ppm("P5\n3 2\n255\n", px.take(5)))
      .left.exists(_.contains("truncated")))
    // 1-channel nearest resize: 2x1 -> 4x2 tiles each pixel 2x2
    val r = Multimodal.resizePgmNearest(Multimodal.PgmImage(2, 1, 255, Array[Byte](10, 40)), 4, 2)
    assert(r.pixels.toSeq == Seq[Byte](10, 10, 40, 40, 10, 10, 40, 40))
  }

  test("rejects malformed inputs with reasons") {
    val ok = ppm("P6\n1 1\n255\n", Array.fill(3)(1.toByte))
    assert(Multimodal.decodePpm(ok).isRight)
    assert(Multimodal.decodePpm("P5\n1 1\n255\n".getBytes(US_ASCII)).isLeft, "bad magic")
    assert(Multimodal.decodePpm(ok.dropRight(1)).isLeft, "truncated pixels")
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n65535\n", Array.fill(6)(1.toByte))).isLeft,
      "2-byte maxval unsupported, must be rejected not mis-sliced")
    assert(Multimodal.decodePpm(ppm("P6\n0 1\n255\n", Array.empty)).isLeft, "zero width")
    assert(Multimodal.decodePpm("P6\n1 1\n255".getBytes(US_ASCII)).isLeft,
      "header without trailing separator")
    assert(Multimodal.decodePpm(ppm("P6\nx 1\n255\n", Array.fill(3)(1.toByte))).isLeft,
      "non-decimal dimension")
    assert(Multimodal.decodePpm(ppm("P6 1 1 255X", Array.fill(3)(1.toByte))).isLeft,
      "non-whitespace after maxval must be rejected, not consumed as the separator")
  }
}
