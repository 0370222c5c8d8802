package graft.llm

import graft.queries.QuerySpec

/** Embedding-quantization ablation — the sizing study a pipeline runs
  * before committing its vector store to a precision: score the SAME
  * query at int16 / int8 / int4 / ternary component precision and
  * measure how the retrieved top-10 degrades vs the highest-precision
  * ranking (the scalar-quantization recall curve every vector-DB
  * capacity plan starts from; complements q_ann_recall_curve, which
  * ablates the IVF probe count at FIXED precision, and
  * q_embed_quantize, which ships the int8 codes themselves).
  *
  * Quantization is the q_embed_quantize convention — per-vector max-abs
  * scaling, explicit FLOOR(x·s/ma + 0.5) so both engines round
  * identically — at scales s ∈ {32767, 127, 7, 1} (int16 / int8 / int4 /
  * ternary). Scores are dot products of the INTEGER code vectors: every
  * product ≤ 64·32767² ≈ 6.9e10, exactly representable in BIGINT and in
  * DuckDB's double accumulator, so the two engines' sums are
  * bit-identical integers and ranking ties break on vec_id.
  *
  * 100 TB shape: one scoring pass over levels × corpus (the ablation IS
  * a 4× pass — an offline study, the q_ann_recall_curve precedent);
  * per-level top-10 is TWO-PHASE (per-(level, shard) window then a
  * ≤ levels·shards·10-row merge — the KMV top-k discipline, never one
  * reducer per level), and the reference-overlap comparison rides a
  * per-vec_id window over the ≤ 40 surviving rows, keeping the whole
  * tail a SINGLE-consumer chain so CTE re-inlining cannot replay the
  * scoring pass (the kcore/DSIR/MMR staging lesson, solved here by
  * linearization instead of materialization).
  */
object EmbedAblation {

  private val qid = 7
  private val scales = "32767, 127, 7, 1"

  /** Dialect-shared tail over `lv(s)`, `e(vec_id, embedding, ma)`,
    * `q(qe, qma)` and a dialect `DOT(qq, qc)` splice.
    */
  private def tail(dot: String): String =
    s"""qv AS (SELECT lv.s, QUANT(qe, qma) AS qq FROM lv CROSS JOIN q),
       |cv AS (SELECT lv.s, e.vec_id, QUANT(embedding, ma) AS qc
       |       FROM lv CROSS JOIN e WHERE e.vec_id != $qid),
       |sc AS (SELECT cv.s, cv.vec_id, CAST($dot AS BIGINT) AS dot
       |       FROM cv JOIN qv ON cv.s = qv.s),
       |r1 AS (SELECT s, vec_id, dot,
       |              row_number() OVER (PARTITION BY s, vec_id % 16
       |                                 ORDER BY dot DESC, vec_id) AS srn
       |       FROM sc),
       |rk AS (SELECT s, vec_id, dot,
       |              row_number() OVER (PARTITION BY s ORDER BY dot DESC, vec_id) AS rn
       |       FROM r1 WHERE srn <= 10),
       |topf AS (SELECT s, vec_id, dot, rn,
       |                MAX(CASE WHEN s = 32767 THEN 1 ELSE 0 END)
       |                  OVER (PARTITION BY vec_id) AS in_ref
       |         FROM rk WHERE rn <= 10)
       |SELECT CAST(s AS INT) AS q_scale,
       |       CAST(SUM(CASE WHEN in_ref = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap_at10,
       |       CAST(MAX(CASE WHEN rn = 1 THEN vec_id END) AS BIGINT) AS top1_id,
       |       CAST(MAX(CASE WHEN rn = 1 THEN dot END) AS BIGINT) AS top1_dot
       |FROM topf GROUP BY s ORDER BY q_scale DESC""".stripMargin

  private def sparkSql: String =
    s"""WITH lv AS (SELECT explode(array($scales)) AS s),
       |e AS (SELECT vec_id, embedding,
       |             array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
       |      FROM embeddings),
       |q AS (SELECT embedding AS qe, ma AS qma FROM e WHERE vec_id = $qid),
       |${tail("aggregate(zip_with(qv.qq, cv.qc, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)")}"""
      .stripMargin
      .replace("QUANT(qe, qma)",
        "transform(qe, x -> CAST(FLOOR(CAST(x AS DOUBLE) * lv.s / qma + 0.5) AS BIGINT))")
      .replace("QUANT(embedding, ma)",
        "transform(e.embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * lv.s / e.ma + 0.5) AS BIGINT))")

  private def duckSql: String =
    s"""WITH lv AS (SELECT unnest([$scales]) AS s),
       |e AS (SELECT vec_id, embedding,
       |             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS ma
       |      FROM embeddings),
       |q AS (SELECT embedding AS qe, ma AS qma FROM e WHERE vec_id = $qid),
       |${tail("list_dot_product(list_transform(qv.qq, x -> CAST(x AS DOUBLE)), list_transform(cv.qc, x -> CAST(x AS DOUBLE)))")}"""
      .stripMargin
      .replace("QUANT(qe, qma)",
        "list_transform(qe, x -> CAST(FLOOR(CAST(x AS DOUBLE) * lv.s / qma + 0.5) AS BIGINT))")
      .replace("QUANT(embedding, ma)",
        "list_transform(e.embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * lv.s / e.ma + 0.5) AS BIGINT))")

  val specs: Map[String, QuerySpec] = Map(
    "q_embed_quant_ablation" -> QuerySpec.sql2(sparkSql, duckSql)
  )
}
