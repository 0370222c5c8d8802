package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.TestSpark

/** Global physical-plan sweep: EVERY query in the inventory is audited for
  * the two unbounded-at-scale join shapes. CartesianProduct is forbidden
  * everywhere; BroadcastNestedLoopJoin is allowed ONLY where the broadcast
  * side is constant-bounded by construction — the brute-force ANN scoring
  * joins (query-vector side), centroid-assignment joins (<= sqrt(N)
  * centroids), single-row aggregate joins, and the two deliberate
  * non-equi parity forms. A new query that accidentally plans an
  * unbounded nested-loop join fails here, not at 100 TB.
  */
class GlobalPlanSweepSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** BNLJ-allowed: every entry must broadcast a side whose size is bounded
    * by construction (documented per query at its definition site).
    */
  private val bnljBounded = Set(
    "q_join_cross",          // the CROSS JOIN operator itself (parity row)
    "q_join_theta",          // non-equi parity form (banded twin is the scale path)
    "q_join_theta_banded",   // residual band-local non-equi over a dimension side
    "q_ann_topk",            // brute-force baseline: broadcast query vectors
    "q_embed_matryoshka_eval", // same brute harness shape: bounded query-vector broadcast x2
    "q_ann_topk_native",     // same shape, native kernel
    "q_ann_ivf",             // broadcast centroid table (nlist ~ sqrt(N))
    "q_ann_recall_curve",    // brute ground-truth branch (bounded query sample) + 3-row level table
    "q_search_ndcg",         // same recall-harness shape: centroid broadcast + bounded brute gt branch
    "q_ann_ivf_hier",        // broadcast CELL table only (nlist1 ~ N^(1/4); centroids equi-join)
    "q_ann_ivfpq",           // broadcast CELL table only (two-level quantizer assignment)
    "q_ann_ivfpq_residual",  // broadcast CELL table only (two-level quantizer assignment)
    "q_ann_kmeans",          // broadcast CELL table only (two-level quantizer assignment)
    "q_ann_kmeans_sampled",  // broadcast centroid table; probe side is the bounded training sample
    "q_dedup_semantic",      // broadcast CELL table only (two-level quantizer assignment)
    "q_ann_list_rebalance",  // broadcast CELL table only (two-level quantizer assignment)
    "q_sample_coreset",      // broadcast CELL table only (two-level quantizer assignment)
    "q_agg_hll_merge",       // single-row sketch-union join
    "q_stats_kmv_sketch",    // single-row merged-kth-min x single-row exact-count join
    "q_stats_kmv_intersect", // T-row (event-type domain) pair table x <=T*128-row sketch rows
    "q_stats_chi2",          // single-row test-statistic join onto the <=|S|x|P| bounded cell table
    "q_stats_kendall",       // domain-bounded grid self-join + single-row pair/tie-total crossJoins
    "q_stats_spearman",      // single-row rank-quantization factor (sf) crossJoins onto the bounded margins
    "q_stats_bh_fdr",        // |types|x64 grid densifier (the chi2-style bounded cross join)
    "q_text_isotonic_calibrate", // single-row score-extremes broadcast (the nb_auc/reliability ext shape)
    "q_graph_assortativity", // single-row node-count join builds the synthetic edge table (hits shape)
    "q_graph_betweenness",   // single-row node-count join builds the synthetic edge table; BFS/Brandes rounds equi
    "q_events_markov_attribution", // <=T+1-row scenario table x <=(T+1)^2 transition matrix; 1-row base join
    "q_events_lateness_audit", // 3-row delay-level table x the shard-windowed stream
    "q_events_next_pred",    // single-row train/test cut broadcast; model join is equi
    "q_events_cuped",        // single-row midpoint-cut broadcast (next_pred shape); moments chain is 2-row windows
    "q_events_next_pred2",   // single-row train/test cut broadcast; both model joins are equi on context
    "q_ts_autocorr",         // 3-row lag table x the calendar-bounded dense hourly series
    "q_ts_ewma",             // 20-row dyadic-weight lag table x the calendar-bounded dense hourly series
    "q_ts_holt",             // same 20-row lag-table shape + 1-row tap-weight-total join
    "q_ts_changepoint",      // single-row series-total join onto the dense hourly series
    "q_ts_theil_sen",        // calendar-bounded dense-series self-pairs (~720 rows; autocorr contract)
    "q_stats_bootstrap_ci",  // 32-row replica-index table x the scan (poissonized bootstrap explode)
    "q_stats_quantile_merge", // 3-row target-rank table x the N/64 merged summary + audit probe
    "q_dedup_band_tuning",   // single-row truth-count join onto the 3-row config rollup
    "q_embed_probe_train",   // 1-row weight-array broadcast per training round
    "q_graph_pagerank",      // single-row teleport-quantum join; rank x edges is equi (GraphRankSpec pins)
    "q_search_hybrid_rrf",   // single-row query-vector broadcast (1 x N scoring branch)
    "q_search_rerank_probe", // 1-row query-vector + 1-row packed-weight broadcasts; candidates join equi
    "q_search_hybrid_ivf",   // broadcast CELL table only (two-level quantizer vector branch)
    "q_search_hybrid_batch", // |Q|=10-row query side x the N^(1/4) staged cell table only
    "q_text_unigram_logprob", // broadcast unigram LM (vocabulary-bounded)
    "q_select_dsir",         // single-row corpus-total joins + <=128-row score table
    "q_select_dsir_cluster", // same DSIR body over the dedup pool; pool join itself is equi
    "q_mix_temperature",     // single-row weight-total join; rate table joins equi on source
    "q_select_doremi",       // single-row vocab/total joins + K-domain-row weight table
    "q_text_ppl_bucket",     // single-row vocabulary-size join onto the bigram TYPE table
    "q_text_kn_ppl",         // single-row bigram-type-total join onto the bigram TYPE table
    "q_text_ppl_loo",        // same single-row vocabulary-size join, both LM branches
    "q_select_rho",          // single-row bigram-type-total joins onto the bigram TYPE table (kn_ppl shape)
    "q_text_unigram_tok_em", // single-row piece-total join onto the vocabulary-bounded candidate table
    "q_text_burstiness",     // single-row doc-count join onto the vocabulary-bounded word table
    "q_events_stickiness",   // single-row span join onto the calendar-bounded day table
    "q_stats_mad",           // single-row bin-total joins onto the bounded bin tables (both passes)
    "q_embed_pca_project",   // iterate-chain joins are d^2-sized, never N (norms are now 8-row windows)
    "q_layout_range_partition", // single-row (k-1)-cut boundary-array broadcast — the RangePartitioner shape
    "q_ann_graph_search",    // single-row query-vector broadcast; hops are frontier-edge equi-joins
    "q_ann_hnsw_search",     // single-row query-vector broadcast; both layers' hops are frontier-edge equi-joins
    "q_ann_hnsw_l2",         // single-row query-vector broadcast; all three layers' hops are frontier-edge equi-joins
    "q_graph_ppr",           // single-row teleport-quantum join (pagerank shape); seed flag joins equi on id
    "q_graph_hits",          // single-row node-count join builds the synthetic edge table; both half-steps equi
    "q_graph_seed_distance", // single-row node-count join builds the synthetic edge table; rounds are equi+MIN
    "q_graph_mst_boruvka",   // census rows: single-row aggregate x single-row aggregate crossJoins; rounds equi
    "q_cluster_single_linkage", // same Borůvka rounds; histogram/singleton branches are equi/anti joins
    "q_cluster_purity",      // N^(1/4)-row cell-table nested loop (hierAsnCtes invariant) + 1-row totals
    "q_text_js_divergence",  // K-row per-source totals theta-self-join (source domain); KL branches equi on word
    "q_text_textrank",       // single-row teleport-quantum cross joins (pagerank shape) over the staged word graph
    "q_ann_graph_connectivity", // census: single-row aggregate crossJoins; CC rounds are equi joins
    "q_text_nb_auc",         // single-row score-extremes broadcast; histogram is 256 bins
    "q_text_nb_reliability", // single-row score-extremes broadcast; histogram is 10 bins
    "q_text_good_turing",    // single-row token/singleton-total join onto the freq-of-freq table
    "q_text_label_noise",    // single-row class-threshold broadcast onto the staged score artifact
    "q_sample_pps_systematic", // single-row (total, step) broadcast; prefix-sum levels join equi on block keys
    "q_sample_ht_estimate",  // same PPS hit chain: single-row (total, step) broadcast only
    "q_search_mmr",          // 12-row staged candidate table self-pairs; zero corpus scans in-plan (PlanAuditSpec)
    "q_embed_quant_ablation", // 4-row precision-level table x corpus + 1-row query broadcast (recall-curve shape)
    "q_events_rfm",          // domain-bounded bin-offset self-joins (~40/170-row bin tables) + 1-row n/anchor
    "q_graph_modularity",    // single-row edge-count m cross join; edge x label scoring is equi
    "q_cluster_silhouette",  // N^(1/4)-row cell-table nested loop (hierAsnCtes invariant, q_cluster_purity shape)
    "q_stats_gini",          // domain-bounded bin-offset self-joins + 10-row decile probe + 1-row totals
    "q_text_heaps_fit"       // 8-row cutoff-table theta join (bootstrap-spine shape) + 1-row fit broadcast
  )

  /** Unpartitioned-window allowlist: every entry must feed the window a
    * DOMAIN-BOUNDED input (bin/category/cell tables whose size is fixed by
    * construction, never by N) — a global window over a corpus-sized input
    * single-threads the whole dataset through one task at 100 TB. Entries
    * are justified line-by-line; WindowGroupLimit-bounded windows (rank
    * filters Spark pushes a global limit under) pass without listing.
    */
  private val unpartitionedWindowBounded = Set(
    // two-level quantizer family: windows run on the staged CELL /
    // centroid tables (nlist1 ~ N^(1/4), nlist ~ sqrt(N) — sublinear by
    // construction; the corpus-sized assignment join is equi and carries
    // no window)
    "q_ann_ivf_hier",        // 4: cell-table cut/rank windows
    "q_ann_ivfpq",           // 4: cell table + per-subspace codebook (256 rows)
    "q_ann_ivfpq_residual",  // 10: cell table + residual codebooks (256 rows each)
    "q_ann_kmeans",          // 2: centroid-table convergence windows
    "q_ann_list_rebalance",  // 2: cell-occupancy table windows
    "q_cluster_purity",      // 24: hierAsnCtes cell-table label/majority windows
    "q_cluster_silhouette",  // 4: same hierAsnCtes cell-table shape
    "q_dedup_semantic",      // 4: SemDeDup cell-table windows
    "q_sample_coreset",      // 2: cell-table sensitivity windows
    // sampling/mix designs: windows over the SOURCE/STRATA domain tables
    // (|sources| rows — categorical domain, never N)
    "q_mix_unimax",          // 4: per-source budget waterfilling windows
    "q_sample_neyman",       // 4: per-stratum allocation windows
    "q_sample_ht_estimate",  // 1: prefix-sum LEVEL table (N/4096 block keys; doc'd PPS chain)
    "q_sample_pps_systematic", // 1: same prefix-sum level-table shape
    // graph walk serving: windows rank the per-hop frontier (<= |labels|
    // x beam-width rows by construction; the hop join is equi)
    "q_ann_graph_search",    // 1: final beam ranking
    "q_ann_hnsw_search",     // 1: final beam ranking
    "q_ann_hnsw_l2",         // 1: final beam ranking
    // iterate-chain linear algebra: d^2-sized iterates (d = 8 embedding dims)
    "q_embed_pca_project",   // 8: per-iteration norm/deflation windows (8-row)
    // events: windows over domain-bounded derived tables
    "q_events_cuped",        // 1: 2-row moments table (midpoint cut)
    "q_events_markov_attribution", // 2: <=(T+1)^2 transition matrix (T = event types)
    "q_events_survival_km",  // 3: distinct event-DAY risk table (calendar-bounded)
    "q_events_nelson_aalen", // 3: same calendar-bounded risk-set table
    // test statistics: windows over bounded grids / bin / group tables
    "q_stats_anova",         // 1: K-row group-moment table (K = event types)
    "q_stats_benford",       // 2: 9-row first-digit table
    "q_stats_bootstrap_ci",  // 1: 32-row replica table
    "q_stats_chi2",          // 2: <=|S|x|P| dense contingency cells
    "q_stats_ks_test",       // 2: value-bin grid (2^20-cent bins; domain-bounded)
    "q_stats_mannwhitney",   // 2: same binned-grid midrank margins
    "q_stats_spearman",      // 2: bounded-grid rank margins (mx/my)
    "q_stats_bh_fdr",        // 3: m-row per-type p/rank/step-up windows (m = event-type domain)
    "q_text_isotonic_calibrate", // 2: prefix-sum windows over the <=32-row occupied-bin table
    // time series: calendar-bounded dense hourly series (~720 rows)
    "q_ts_changepoint",      // 1: prefix-moment window over the hourly series
    "q_ts_seasonal_decompose", // 1: same dense-series shape
    "q_ts_theil_sen",        // 2: dense-series pair ranks (autocorr contract)
    // text/tokenizer: windows over vocabulary-bounded TYPE tables (word/
    // bigram/merge/piece types — the repo-wide "vocabulary-bounded"
    // convention the BNLJ allowlist documents; corpus TOKEN streams never
    // carry a global window)
    "q_text_bpe_encode",     // 1: merge-rule table (fixed merge budget)
    "q_text_good_turing",    // 1: freq-of-freq table (<= max count rows)
    "q_text_label_noise",    // 1: class-threshold table (class domain)
    "q_text_nb_auc",         // 1: 256-bin score histogram
    "q_text_nb_quality",     // 1: vocabulary-bounded model table
    "q_text_pmi_collocations", // 1: bigram TYPE total (SUM OVER () on the type table)
    "q_text_textrank",       // 47: word-graph pagerank iterations (vocabulary-bounded nodes)
    "q_text_unigram_tok_em", // 1: piece-candidate TYPE table
    // retrieval serving: windows over the per-query candidate tables
    // (posting-intersection bounded; PlanAuditSpec pins zero corpus scans)
    "q_search_rag_pack",     // 1: packed-candidate ranking
    "q_search_rerank_probe"  // 1: candidate-feature ranking
  )

  test("unpartitioned windows are group-limit-bounded or run on domain-bounded inputs") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow, WindowGroupLimit => LWindowGroupLimit}
    val spark = TestSpark.spark.newSession()
    val skip = (n: String) => n.startsWith("q_stream_")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => Nil
      case (name, fn) =>
        val lp = fn(spark, sf)
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.optimizedPlan
        val unpartitioned = lp.collectWithSubqueries {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        // bounded-by-optimizer: a rank predicate Spark pushed DIRECTLY
        // under the window as WindowGroupLimit or GlobalLimit
        // (empty-partition windows get the Limit+Sort form — a
        // distributed top-k; only <= K rows reach the single-partition
        // window). Direct child only: a limit deep on another branch
        // does not bound this window's input.
        def bounded(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
          p match {
            case _: LWindowGroupLimit | _: GlobalLimit => true
            case pr: org.apache.spark.sql.catalyst.plans.logical.Project => bounded(pr.child)
            case _ => false
          }
        val unbounded = unpartitioned.filterNot(w => bounded(w.child))
        if (unbounded.nonEmpty && !unpartitionedWindowBounded(name))
          Seq(s"$name: ${unbounded.size} unpartitioned window(s) without group limit")
        else Nil
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("no cartesian anywhere; nested-loop joins only with constant-bounded broadcast sides") {
    // own session: temp views are a per-session namespace, and the
    // reference-replay suites register their own in-memory `orders` on the
    // shared session (registerAll's per-(session, dir) guard would then
    // skip re-pointing it — the view-shadowing hazard its doc calls out)
    val spark = TestSpark.spark.newSession()
    val skip = (n: String) => n.startsWith("q_stream_") // sink-scan plans, not stream plans
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => Nil
      case (name, fn) =>
        val p = fn(spark, sf)
          .asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
          .queryExecution.executedPlan.toString
        val cart = if (p.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
        val bnlj = if (p.contains("BroadcastNestedLoopJoin") && !bnljBounded(name))
          Seq(s"$name: unlisted BroadcastNestedLoopJoin") else Nil
        cart ++ bnlj
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
