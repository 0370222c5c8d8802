package graft.llm

import graft.queries.QuerySpec

/** Token-level generative quality classifier — the Naive Bayes filter a
  * curation pipeline trains to separate "looks like the curated
  * reference" from "looks like raw crawl" (the GPT-3 Appendix A / CCNet /
  * fastText quality-filter pattern: a LINEAR model over text features,
  * trained reference-vs-raw and applied to every incoming document; the
  * reference engine's SQL surface has no learned operator — this belongs
  * to the LLM-pipeline extension set).
  *
  * Unlike q_embed_probe_train (a discriminative perceptron over
  * EMBEDDINGS), this trains directly on token statistics, so it runs
  * before any embedding model exists — the first quality gate of a
  * pipeline. Multinomial NB with add-one smoothing over word-type
  * features (the model is VOCABULARY-BOUNDED — the q_text_unigram_logprob
  * broadcast contract; at web scale the vocabulary is capped by hashing
  * into 2^18+ buckets, the fastText trick, which changes only the feature
  * definition, not this plan):
  *
  *   llr(w)   = ln( (c⁺(w)+1)/(N⁺+V) · (N⁻+V)/(c⁻(w)+1) )   per word type
  *   score(d) = Σ_{tokens t∈d, t∈vocab} llr(t)
  *
  * computed as ONE neutral-log call per word type on the exact integer
  * ratio (c⁺+1)(N⁻+V) / (c⁻+1)(N⁺+V) — integer micro-nats, so the
  * per-doc sum is an exact BIGINT fold (order-independent) and both
  * engines agree bit-for-bit. Products stay inside BIGINT while the
  * train-token count is < ~3·10⁹ (the shipped fixtures top out near 10⁶
  * tokens; at real scale the counts pass runs over a bounded sample, the
  * q_ann_kmeans_sampled contract). The decision threshold is 0 on token
  * evidence alone — uniform-prior NB, the operating point a production
  * filter tunes on validation data (the crawl-mix class prior would only
  * shift every score by one constant); out-of-vocabulary eval tokens drop
  * out of the scoring join, the standard ignore-OOV convention.
  *
  * Train/eval protocol: docs with doc_id % 3 != 0 train, % 3 = 0 are
  * scored (held out); the positive class is the DSIR target-source slice
  * (source ∈ src0..src3) so the learned filter and the importance sampler
  * see the same notion of "curated".
  *
  * 100 TB shape: the corpus is tokenized exactly TWICE — (1) the count
  * pass map-side combines the train-token stream into vocabulary-bounded
  * partial rows per task (GROUP BY word), (2) the scoring pass equi-joins
  * the eval stream to the broadcast model and aggregates per doc_id. The
  * model-derivation chain (counts → window totals → log kernel) is
  * strictly LINEAR — every CTE has one consumer, so Catalyst's SQL-text
  * CTE re-inlining cannot multiply corpus scans (the round-8 DSIR ×5
  * lesson); the only 2-consumer CTE is the token stream itself, and its
  * two consumers ARE the two intended passes. Totals ride
  * vocabulary-bounded unpartitioned windows (like the calendar-bounded
  * seasonal spine).
  */
object TextClassify {

  private val posSrc = "('src0', 'src1', 'src2', 'src3')"

  /** Dialect-shared tail over a token CTE `tok(doc_id, source, word)`. */
  private def nbTail(k: NeutralMath.KernelSplice): String =
    s"""bc AS (SELECT word,
       |              CAST(SUM(CASE WHEN source IN $posSrc THEN 1 ELSE 0 END) AS BIGINT) AS cp,
       |              CAST(SUM(CASE WHEN source IN $posSrc THEN 0 ELSE 1 END) AS BIGINT) AS cn
       |       FROM tok WHERE doc_id % 3 != 0 GROUP BY word),
       |bt AS (SELECT word, cp, cn,
       |              SUM(cp) OVER () AS np, SUM(cn) OVER () AS nn,
       |              COUNT(*) OVER () AS v
       |       FROM bc),
       |l0 AS (SELECT word, CAST((cp + 1) * (nn + v) AS BIGINT) AS num,
       |              CAST((cn + 1) * (np + v) AS BIGINT) AS den
       |       FROM bt),
       |${k.ln("llr", "l0", "word, num, den", "word", "num", "den", "llr_u", "1.0E6")},
       |sc AS (SELECT tok.doc_id, tok.source,
       |              CAST(SUM(llr.llr_u) AS BIGINT) AS score_u,
       |              CAST(COUNT(*) AS BIGINT) AS n_tok
       |       FROM tok JOIN llr ON tok.word = llr.word
       |       WHERE tok.doc_id % 3 = 0
       |       GROUP BY tok.doc_id, tok.source)
       |SELECT source,
       |       CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(CASE WHEN score_u > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_hi,
       |       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |       CAST(SUM(score_u) AS BIGINT) AS sum_score_u,
       |       CAST(MIN(score_u) AS BIGINT) AS min_score_u,
       |       CAST(MAX(score_u) AS BIGINT) AS max_score_u
       |FROM sc GROUP BY source ORDER BY source""".stripMargin

  private def nbSpark: String =
    s"""WITH tok AS (SELECT doc_id, source, word
       |             FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word),
       |${nbTail(NeutralMath.SparkKernel)}""".stripMargin

  private def nbDuck: String =
    s"""WITH tok AS (SELECT doc_id, source,
       |                    unnest(string_split(text, ' ')) AS word
       |             FROM documents),
       |${nbTail(NeutralMath.OracleKernel)}""".stripMargin

  val specs: Map[String, QuerySpec] = Map(
    "q_text_nb_quality" -> QuerySpec.sql2(nbSpark, nbDuck)
  )
}
