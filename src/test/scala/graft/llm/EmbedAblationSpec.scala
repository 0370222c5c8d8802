package graft.llm

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Independent JVM replay of the quantization ablation: re-derives the
  * max-abs quantization, integer dot products, per-level top-10 and the
  * reference overlap — pinning the formula independently of the engines'
  * agreement with each other.
  */
class EmbedAblationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("q_embed_quant_ablation: JVM replay; reference level overlaps itself fully") {
    val sess = spark.newSession()
    val emb = graft.queries.Tables.embeddings(sess, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val qe = emb(7L)

    def quant(v: Array[Float], s: Long): Array[Long] = {
      val ma = v.map(x => math.abs(x.toDouble)).max
      v.map(x => math.floor(x.toDouble * s / ma + 0.5).toLong)
    }
    val levels = Seq(32767L, 127L, 7L, 1L)
    val tops = levels.map { s =>
      val qq = quant(qe, s)
      val scored = emb.toSeq.collect { case (id, v) if id != 7L =>
        (id, qq.zip(quant(v, s)).map { case (a, b) => a * b }.sum)
      }
      s -> scored.sortBy { case (id, d) => (-d, id) }.take(10)
    }.toMap
    val ref = tops(32767L).map(_._1).toSet
    val exp = levels.map { s =>
      val t = tops(s)
      (s.toInt, t.count(x => ref(x._1)).toLong, t.head._1, t.head._2)
    }

    val got = graft.SparkEntry.queries("q_embed_quant_ablation")(sess, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
    assert(exp.head._2 == 10L, "reference level must overlap itself 10/10")
    // the study is non-vacuous: SOME level loses SOME of the reference set
    assert(exp.exists(_._2 < 10L), "no degradation anywhere — study is vacuous")
  }
}
