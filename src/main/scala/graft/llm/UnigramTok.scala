package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QuerySpec
import graft.Staging.StagedDataFrame

/** Unigram-LM tokenizer training step (Kudo, "Subword regularization:
  * improving neural network translation models with multiple subword
  * candidates", ACL 2018 — the SentencePiece unigram model): seed a
  * candidate piece inventory with every ≤4-char substring of the word
  * types (frequency-scored), Viterbi-segment every word type under the
  * seed piece costs, and emit the hard-EM piece counts — the E-step
  * count table whose renormalization IS the unigram-LM training
  * iteration. The tokenizer-training complement to q_text_bpe_train
  * (greedy merges) — unigram-LM prunes a rich inventory instead of
  * growing one.
  *
  * Determinism: piece costs are integer micro-nats from the
  * engine-neutral log kernel on exact count ratios (cost = ln(T/c));
  * Viterbi is min-plus DP over those integers with total order
  * (cost, piece, prev-position) at every argmin — bit-identical across
  * engines; counts/shares are integer folds and divisions.
  *
  * 100 TB shape: ONE corpus tokenize pass map-side combines to the
  * word-TYPE table (hash-capped at web scale — the fastText trick);
  * everything after is vocabulary-bounded: the ≤4·L-substring explode,
  * the DP (16 unrolled rounds — one row per (word type, position),
  * argmin via a PARTITION BY word window), and the 16-round backtrace
  * are all joins between type-bounded tables. On the Spark side every
  * DP/backtrace round is localCheckpointed (staged-iteration contract;
  * the accumulator is read by the next round AND the backtrace) and the
  * DuckDB oracle MATERIALIZEs each round — an un-materialized
  * accumulator re-inlines 2^16 ways (the kcore lesson). Words longer
  * than 16 chars fall out of the segmentation (junk at that length —
  * the gopher-rules cut — and the cap is one more unrolled round per
  * +1 char if a deployment raises it).
  */
object UnigramTok {

  private val MaxLen = 16
  private val MaxPiece = 4
  private val TopK = 20

  /** Word-type relation: the Spark side composes TextIndex's MEMOIZED
    * word-type artifact (one tokenize+count scan shared with the whole
    * BPE family — a second definition here would both re-pay the scan
    * and risk tokenization drift), projected to this module's column
    * names with empty tokens dropped: an empty word makes Spark's
    * `sequence(1, 0)` emit a descending [1, 0] while DuckDB's
    * `range(1, 1)` emits nothing — a latent engine split the guard
    * closes on both sides (no empty token exists in today's fixture;
    * this pins the behavior against fixture drift).
    */
  private val wtFromBpe =
    """SELECT w AS word, CAST(c AS BIGINT) AS cnt
      |FROM bpe_wt WHERE length(w) >= 1""".stripMargin

  private val wtDuck =
    """SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) z
      |WHERE length(word) >= 1
      |GROUP BY word""".stripMargin

  /** Candidate piece inventory + micro-nat costs over a word-type
    * relation `WT`: every substring of length 1..MaxPiece, occurrence
    * count weighted by word frequency, cost = ln(T/c).
    */
  private def ctTail(wt: String, posExplode: String,
      k: NeutralMath.KernelSplice): String =
    s"""ps AS (SELECT word, cnt, substr(word, j, l) AS piece
       |       FROM $posExplode
       |       WHERE j + l - 1 <= length(word)),
       |cd AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS c FROM ps GROUP BY piece),
       |ctot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM cd),
       |${k.ln("ctf", "cd CROSS JOIN ctot", "cd.piece AS piece, cd.c AS c", "piece, c",
          "ctot.t", "cd.c", "cost_micro", "1.0E6")}""".stripMargin

  private def posExplodeSpark(wt: String): String =
    s"""$wt LATERAL VIEW explode(sequence(1, length(word))) t1 AS j
       |    LATERAL VIEW explode(sequence(1, $MaxPiece)) t2 AS l""".stripMargin

  private def posExplodeDuck(wt: String): String =
    s"""(SELECT word, cnt, j, unnest(range(1, ${MaxPiece + 1})) AS l
       | FROM (SELECT word, cnt, unnest(range(1, length(word) + 1)) AS j FROM $wt) zz) zl""".stripMargin

  /** One Viterbi round: extend every path ending at pos ∈ [j−4, j−1)
    * by the piece covering (pos+1 .. j); keep the argmin per word. */
  private def roundSql(b: String, ct: String, j: Int): String =
    s"""SELECT word, pos, cost, prev, piece FROM (
       |  SELECT b.word AS word, $j AS pos, b.cost + ct.cost_micro AS cost,
       |         b.pos AS prev, ct.piece AS piece,
       |         row_number() OVER (PARTITION BY b.word
       |                            ORDER BY b.cost + ct.cost_micro, ct.piece, b.pos) AS rn
       |  FROM $b b JOIN $ct ct
       |    ON ct.piece = substr(b.word, b.pos + 1, $j - b.pos)
       |  WHERE b.pos >= $j - $MaxPiece AND b.pos < $j AND length(b.word) >= $j) z
       |WHERE rn = 1""".stripMargin

  private def b0Sql(wt: String): String =
    s"""SELECT word, CAST(0 AS INT) AS pos, CAST(0 AS BIGINT) AS cost,
       |       CAST(-1 AS INT) AS prev, '' AS piece
       |FROM $wt""".stripMargin

  /** Final rollup over the emitted segmentation steps `SEG(word, piece)`
    * (with multiplicity) joined back to word counts. */
  private def finTail(seg: String, wt: String, intDiv: String): String =
    s"""pc AS (SELECT sg.piece, CAST(COUNT(DISTINCT sg.word) AS BIGINT) AS n_words,
       |              CAST(SUM(w.cnt) AS BIGINT) AS tok_count
       |       FROM $seg sg JOIN $wt w ON sg.word = w.word
       |       GROUP BY sg.piece),
       |pt AS (SELECT piece, n_words, tok_count,
       |              CAST(SUM(tok_count) OVER () AS BIGINT) AS total
       |       FROM pc)
       |SELECT rk, piece, n_words, tok_count,
       |       CAST((tok_count * 10000) $intDiv total AS BIGINT) AS share_bp
       |FROM (SELECT piece, n_words, tok_count, total,
       |             CAST(row_number() OVER (ORDER BY tok_count DESC, piece) AS INT) AS rk
       |      FROM pt) z
       |WHERE rk <= $TopK ORDER BY rk""".stripMargin

  private def tokSpark(s: SparkSession, d: String): DataFrame = {
    graft.queries.Tables.registerAll(s, d)
    TextIndex.stageWtCached(s, d) // memoized (w, c) artifact -> view bpe_wt
    s.sql(wtFromBpe).createOrReplaceTempView("ut_wt")
    s.sql(s"""WITH ${ctTail("ut_wt", posExplodeSpark("ut_wt"), NeutralMath.SparkKernel)}
             |SELECT piece, c, cost_micro FROM ctf""".stripMargin)
      .staged().createOrReplaceTempView("ut_ct")
    var b = s.sql(b0Sql("ut_wt")).staged()
    for (j <- 1 to MaxLen) {
      b.createOrReplaceTempView("ut_b")
      b = b.union(s.sql(roundSql("ut_b", "ut_ct", j))).staged()
    }
    b.createOrReplaceTempView("ut_b")
    var st = s.sql(
      """SELECT word, pos, prev, piece FROM ut_b
        |WHERE pos = length(word) AND pos > 0""".stripMargin).staged()
    var seg = st
    for (_ <- 1 until MaxLen) {
      st.createOrReplaceTempView("ut_s")
      st = s.sql(
        """SELECT b.word AS word, b.pos AS pos, b.prev AS prev, b.piece AS piece
          |FROM ut_b b JOIN ut_s s ON b.word = s.word AND b.pos = s.prev
          |WHERE s.prev > 0""".stripMargin).staged()
      seg = seg.union(st)
    }
    seg.select("word", "piece").createOrReplaceTempView("ut_seg")
    s.sql(s"""WITH ${finTail("ut_seg", "ut_wt", "DIV")}""".stripMargin)
  }

  private def tokDuck: String = {
    val rounds = (1 to MaxLen).map { j =>
      s"""b$j AS MATERIALIZED (SELECT * FROM b${j - 1}
         |  UNION ALL ${roundSql(s"b${j - 1}", "ctf", j)})""".stripMargin
    }.mkString(",\n")
    val walks = (1 until MaxLen).map { k =>
      s"""s$k AS MATERIALIZED (SELECT b.word AS word, b.pos AS pos, b.prev AS prev, b.piece AS piece
         |  FROM b$MaxLen b JOIN s${k - 1} s ON b.word = s.word AND b.pos = s.prev
         |  WHERE s.prev > 0)""".stripMargin
    }.mkString(",\n")
    val segUnion = (0 until MaxLen).map(k => s"SELECT word, piece FROM s$k").mkString("\n  UNION ALL ")
    s"""WITH wt AS MATERIALIZED ($wtDuck),
       |${ctTail("wt", posExplodeDuck("wt"), NeutralMath.OracleKernel)},
       |b0 AS (${b0Sql("wt")}),
       |$rounds,
       |s0 AS MATERIALIZED (SELECT word, pos, prev, piece FROM b$MaxLen
       |                    WHERE pos = length(word) AND pos > 0),
       |$walks,
       |seg AS ($segUnion),
       |${finTail("seg", "wt", "//")}""".stripMargin
  }

  val specs: Map[String, QuerySpec] = Map(
    "q_text_unigram_tok_em" -> QuerySpec.df(tokSpark, tokDuck))
}
