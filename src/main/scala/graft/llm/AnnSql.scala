package graft.llm

/** Embedding similarity SQL, generated for both dialects from shared
  * constants so Spark and the DuckDB oracle compute bit-identical doubles.
  *
  * Cosine determinism: float32 elements are cast to DOUBLE before any
  * arithmetic (exact), and both engines fold the 64 products left-to-right
  * (Spark `aggregate`, DuckDB `list_dot_product`) — identical IEEE results,
  * so rankings and ROUNDed values agree exactly.
  *
  * Scale notes: the brute-force form is the correctness baseline (query set
  * broadcast against the corpus — a broadcast hash join, no shuffle of the
  * big side; per-query top-k via partitioned window). The LSH form is the
  * 100 TB path: random-hyperplane sign buckets turn the candidate join into
  * an equi-join on bucket id, so each query only scores its own bucket.
  */
object AnnSql {
  val dim = 64
  val numPlanes = 8

  /** Deterministic hyperplanes, embedded as literals in BOTH dialects (the
    * same decimal text parses to the same double everywhere).
    */
  val planes: Seq[Seq[String]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(numPlanes)(Seq.fill(dim)(f"${rnd.nextGaussian()}%.6f"))
  }

  // ---- Spark dialect ----
  private def sparkDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"

  private def sparkNorm(a: String): String =
    s"SQRT(aggregate($a, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"

  private def sparkCos(a: String, b: String): String =
    s"${sparkDot(a, b)} / (${sparkNorm(a)} * ${sparkNorm(b)})"

  private def sparkPlaneLit(p: Seq[String]): String =
    p.map(v => s"${v}D").mkString("array(", ", ", ")")

  /** bucket = bitmask of hyperplane-side signs. */
  private def sparkBucket(e: String): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${sparkDot(e, sparkPlaneLit(p))} >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  // ---- DuckDB dialect ----
  private def duckD(a: String): String =
    s"list_transform($a, x -> CAST(x AS DOUBLE))"

  private def duckDot(a: String, b: String): String =
    s"list_dot_product(${duckD(a)}, ${duckD(b)})"

  private def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (SQRT(${duckDot(a, a)}) * SQRT(${duckDot(b, b)}))"

  private def duckPlaneLit(p: Seq[String]): String =
    p.mkString("[", ", ", "]")

  private def duckBucket(e: String): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_dot_product(${duckD(e)}, ${duckPlaneLit(p)}) >= 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

  // ---- queries ----

  /** Brute-force cosine top-k for the query subset (vec_id % 50 = 0). */
  def bruteTopKSpark(k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
       |sims AS (SELECT qid, c.vec_id AS cid, ${sparkCos("qe", "c.embedding")} AS cos
       |         FROM q JOIN embeddings c ON c.vec_id != qid)
       |SELECT qid, cid, ROUND(cos, 6) AS cos FROM (
       |  SELECT qid, cid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, cid""".stripMargin

  def bruteTopKDuck(k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
       |sims AS (SELECT qid, c.vec_id AS cid, ${duckCos("qe", "c.embedding")} AS cos
       |         FROM q JOIN embeddings c ON c.vec_id != qid)
       |SELECT qid, cid, ROUND(cos, 6) AS cos FROM (
       |  SELECT qid, cid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, cid""".stripMargin

  /** Brute-force top-k via the native graft_cosine Catalyst expression
    * (same math, single-pass, whole-stage-codegen friendly) — the scale
    * path for the scoring side.
    */
  def nativeTopKSpark(k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
       |sims AS (SELECT qid, c.vec_id AS cid, graft_cosine(qe, c.embedding) AS cos
       |         FROM q JOIN embeddings c ON c.vec_id != qid)
       |SELECT qid, cid, ROUND(cos, 6) AS cos FROM (
       |  SELECT qid, cid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, cid""".stripMargin

  /** LSH-bucketed top-k: candidates restricted to the query's sign bucket. */
  def lshTopKSpark(k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding, ${sparkBucket("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM e WHERE vec_id % 50 = 0),
       |sims AS (SELECT qid, c.vec_id AS cid, ${sparkCos("qe", "c.embedding")} AS cos
       |         FROM q JOIN e c ON c.bucket = q.bucket AND c.vec_id != qid)
       |SELECT qid, cid, ROUND(cos, 6) AS cos FROM (
       |  SELECT qid, cid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, cid""".stripMargin

  def lshTopKDuck(k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding, ${duckBucket("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, bucket FROM e WHERE vec_id % 50 = 0),
       |sims AS (SELECT qid, c.vec_id AS cid, ${duckCos("qe", "c.embedding")} AS cos
       |         FROM q JOIN e c ON c.bucket = q.bucket AND c.vec_id != qid)
       |SELECT qid, cid, ROUND(cos, 6) AS cos FROM (
       |  SELECT qid, cid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
       |  FROM sims) t
       |WHERE rn <= $k ORDER BY qid, cid""".stripMargin

  /** Near-duplicate pairs by cosine ≥ threshold, blocked by label (standard
    * blocking: only same-label pairs are compared — bounded block sizes).
    * Scoring uses the native graft_cosine expression (single pass, stays in
    * whole-stage codegen); the pure-SQL lambda fold lives on in
    * bruteTopKSpark as the no-extension formulation.
    */
  def nearDupSpark(threshold: String): String =
    s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, graft_cosine(a.embedding, b.embedding) AS cos
       |           FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT id1, id2, ROUND(cos, 6) AS cos FROM p WHERE cos >= $threshold
       |ORDER BY id1, id2""".stripMargin

  def nearDupDuck(threshold: String): String =
    s"""WITH p AS (SELECT a.vec_id AS id1, b.vec_id AS id2, ${duckCos("a.embedding", "b.embedding")} AS cos
       |           FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT id1, id2, ROUND(cos, 6) AS cos FROM p WHERE cos >= $threshold
       |ORDER BY id1, id2""".stripMargin
}
