package graft.llm

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** Byte-exact pins for the REAL RIFF/WAVE PCM parser
  * (Multimodal.decodeWav): well-formed clips round-trip sample-exactly,
  * unknown chunks (with the spec's odd-size pad byte) are skipped, and
  * malformed / unsupported payloads are rejected with reasons.
  */
class WavDecodeSpec extends AnyFunSuite {

  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def fmtChunk(ch: Int, rate: Int, bits: Int, audioFormat: Int = 1): Array[Byte] =
    ascii("fmt ") ++ le32(16) ++ le16(audioFormat) ++ le16(ch) ++ le32(rate) ++
      le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)

  private def wav(chunks: Array[Byte]*): Array[Byte] = {
    val body = ascii("WAVE") ++ chunks.flatten
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  test("decodes PCM samples byte-exactly, including negative amplitudes") {
    val samples = Seq(0, -1, 32767, -32768, 12345)
    val data = ascii("data") ++ le32(samples.length * 2) ++
      samples.flatMap(s => le16(s & 0xffff))
    val got = Multimodal.decodeWav(wav(fmtChunk(1, 8000, 16), data))
    assert(got.isRight)
    val clip = got.toOption.get
    assert(clip.channels == 1 && clip.sampleRate == 8000 && clip.bitsPerSample == 16)
    assert(clip.samples.toSeq == samples.map(_.toShort))
  }

  test("skips unknown chunks and honors the odd-size pad byte") {
    val data = ascii("data") ++ le32(2) ++ le16(7)
    // 3-byte LIST chunk: spec pads chunks to even offsets, so one pad byte
    // follows; a parser that forgets the pad mis-aligns every later chunk
    val odd = ascii("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3) ++ Array[Byte](0)
    val got = Multimodal.decodeWav(wav(fmtChunk(2, 44100, 16), odd, data))
    assert(got.isRight)
    assert(got.toOption.get.channels == 2)
    assert(got.toOption.get.samples.toSeq == Seq(7.toShort))
  }

  test("decimation keeps whole frames: stereo stays interleaved") {
    // Stereo, 5 frames: (L0,R0) (L1,R1) (L2,R2) (L3,R3) (L4,R4).
    // Factor 2 keeps frames 0, 2, 4 — BOTH channels of each kept frame.
    // A sample-wise decimator would instead keep L0,L1,L2,... (all left),
    // which this fixture distinguishes: rights are negative.
    val frames = Seq((10, -10), (20, -20), (30, -30), (40, -40), (50, -50))
    val data = ascii("data") ++ le32(frames.length * 4) ++
      frames.flatMap { case (l, r) => le16(l & 0xffff) ++ le16(r & 0xffff) }
    val payload = wav(fmtChunk(2, 8000, 16), data)
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val row = Multimodal.wavDecimateStats(df, factor = 2).collect().head
    assert(row.getInt(1) == 2, "channels")
    assert(row.getInt(2) == 8000 && row.getInt(3) == 4000, "rates")
    assert(row.getInt(4) == 5 && row.getInt(5) == 3, "5 frames in, 3 kept")
    // kept: (10,-10) (30,-30) (50,-50) → sum_abs 180
    assert(row.getLong(6) == 180L, "sum_abs over kept frames only")
    assert(row.getInt(7) == 10 && row.getInt(8) == -50, "boundary samples")
  }

  test("rejects malformed and unsupported payloads with reasons") {
    val ok = wav(fmtChunk(1, 8000, 16), ascii("data") ++ le32(2) ++ le16(1))
    assert(Multimodal.decodeWav(ok).isRight)
    assert(Multimodal.decodeWav(ascii("RIFX") ++ ok.drop(4)).isLeft, "bad magic")
    assert(Multimodal.decodeWav(ok.dropRight(1)).isLeft, "truncated data chunk")
    assert(Multimodal.decodeWav(
      wav(fmtChunk(1, 8000, 16, audioFormat = 3), ascii("data") ++ le32(0))).isLeft,
      "non-PCM format must be rejected")
    assert(Multimodal.decodeWav(
      wav(ascii("data") ++ le32(2) ++ le16(1), fmtChunk(1, 8000, 16))).isLeft,
      "data before fmt")
    assert(Multimodal.decodeWav(wav(fmtChunk(1, 8000, 16))).isLeft, "no data chunk")
    // a ZERO-size data chunk is structurally legal: it decodes (empty
    // samples) rather than erroring — the stats layer is what rejects it
    // with a labeled failure (wavStats doc)
    val empty = Multimodal.decodeWav(wav(fmtChunk(1, 8000, 16), ascii("data") ++ le32(0)))
    assert(empty.toOption.exists(_.samples.isEmpty))
  }
}
