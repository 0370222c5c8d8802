package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: 32-bit simhash over the document's
  * word set, candidate generation by 8-bit band equality, exact Hamming
  * verification.
  *
  * With 4 bands and maxHamming ≤ 3, the pigeonhole principle guarantees any
  * qualifying pair shares at least one identical band — so the banded
  * candidate set provably contains every answer and the output EQUALS the
  * all-pairs result (which is what the DuckDB oracle computes).
  *
  * The per-word hash is md5-derived (first 8 hex chars → int) rather than
  * xxhash64 so the oracle can reproduce it exactly in SQL.
  */
object SimHashDedup {
  val bits = 32
  val bands = 4
  val maxHamming = 3

  /** 32-bit simhash per document. One hash aggregation with 32 per-bit
    * tally columns over the word rows — NOT an explode to (word × 32)
    * rows: the blown-up form shuffles 32× the data and aggregates twice,
    * while 32 sum buffers combine map-side in a single pass (the same
    * reshape the winsorize histogram uses: wide aggregation state instead
    * of tall row multiplication).
    */
  def simhashes(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word")).distinct()
    val hashed =
      words.withColumn("hv", expr("CAST(conv(substr(md5(word), 1, 8), 16, 10) AS BIGINT)"))
    val tallies = (0 until bits).map(b =>
      sum(expr(s"CASE WHEN (shiftright(hv, $b) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$b"))
    val recombine = (0 until bits)
      .map(b => s"CASE WHEN s$b >= 0 THEN shiftleft(CAST(1 AS BIGINT), $b) ELSE CAST(0 AS BIGINT) END")
      .mkString(" + ")
    hashed
      .groupBy("doc_id")
      .agg(tallies.head, tallies.tail: _*)
      .select(col("doc_id"), expr(recombine).as("simhash"))
  }

  /** Pairs within Hamming distance maxHamming, via band-bucket equi-join. */
  def nearDuplicates(docs: DataFrame): DataFrame = {
    val banded = simhashes(docs)
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("j"))
      .withColumn("bandval", expr("shiftright(simhash, 8 * j) & 255"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.j") === col("b.j") && col("a.bandval") === col("b.bandval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.simhash").as("sh1"), col("b.simhash").as("sh2"))
      .distinct()
      .filter(expr(s"bit_count(sh1 ^ sh2) <= $maxHamming"))
      .select(col("id1"), col("id2"),
        expr("CAST(bit_count(sh1 ^ sh2) AS INT)").as("hd"))
      .orderBy("id1", "id2")
  }
}
