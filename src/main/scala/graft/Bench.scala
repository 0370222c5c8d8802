package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main. Times every SparkEntry query at SPARK_GRAFT_SF_DIR with a
  * fully materializing action (noop-format write — nothing survives to be
  * optimized away, unlike count() which let Catalyst eliminate sorts and
  * projections), after an untimed warm-up pass that pays JIT/codegen/footer
  * costs once.
  *
  * Output: ONE JSON line on stdout AND in ./bench_out.json. Failures are
  * recorded per-query (`null` timing + name in `errors`) and exit nonzero —
  * a broken query can never read as a fast query.
  *
  * Noise self-diagnosis: any query regressing >1.5x vs the
  * CALIB-ADJUSTED previous-round record (prev · calibNow/calibPrev —
  * uniform machine drift between boots must not flag every query) is
  * re-timed in one fresh flags-only child JVM; entries whose isolated
  * time is within 1.3x of adjusted prev move to `noise_suppressed` (with
  * both numbers), the rest stay in `regressions_vs_prev` with their
  * `isolated` datum. Round-9: EVERY flagged entry gets the isolation
  * datum (one batched child, not a top-8 budget — the round-8 record
  * left 46 flags unadjudicated and the harness could no longer
  * adjudicate itself); `n_flagged`/`n_isolated` in the JSON prove the
  * coverage. Round-11: staging steps are individually timed and
  * success-recorded (`staging` = {step: {sec, ok}}, `warmup_failed`), and
  * an isolation child whose own staging/warm-up threw is an INVALID
  * adjudicator (`isolation_valid:false`, suppresses nothing) — an
  * unrecorded staging failure used to shift artifact builds into the
  * first in-matrix consumer and produce flags nobody could adjudicate.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up + staging run UNTIMED relative to the query matrix, but each
    // step is itself timed and its success recorded (r10 verdict #2: an
    // unrecorded staging failure shifts the artifact build into the first
    // in-matrix consumer, producing regression flags no one can
    // adjudicate). The JSON carries `staging` = {step: {sec, ok}} and
    // `warmup_failed`; the isolation protocol refuses a child datum whose
    // own staging/warm-up failed.
    var stagingEntries = List.empty[(String, Double, Boolean)]
    var warmupFailed = List.empty[String]
    def staged(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      val ok = try { body; true } catch { case _: Throwable => false }
      stagingEntries ::= ((name, (System.nanoTime() - t0) / 1e9, ok))
    }

    // Warm-up: a scan+join+agg+sort covers the batch codegen paths the
    // matrix reuses (round-1 showed the first query absorbing ~4s of JIT);
    // one streaming query warms the micro-batch engine + state store the
    // same way (the first streaming query otherwise pays ~10s of one-off
    // JIT that is engine setup, not query cost), and one window query
    // warms WindowExec + the broadcast-build path (otherwise the
    // alphabetically-first window consumer absorbs that JIT).
    Seq("q_agg_q1", "q_join_inner", "q_scan_project", "q_stream_window", "q_win_rank")
      .filter(SparkEntry.queries.contains)
      .foreach(n => try materialize(n) catch { case _: Throwable => warmupFailed ::= n })

    // Fixture staging: these write on-disk fixtures once per (session,
    // dir); staging them here means the timed region measures stream
    // execution / the shuffle-free join, not fixture rewrites.
    staged("events_stream")(graft.streaming.EventStream.stageAll(spark, sfDir))
    staged("bucketed_tables")(graft.queries.ExtraQueries.ensureBucketed(spark, sfDir))
    // Serving-index staging: the BM25 posting/length tables and the
    // two-level IVF assignment are build-once serve-many artifacts (in
    // production, batch index jobs); the retrieval queries time the PROBE
    // path. The build cost itself stays measured — q_ann_ivf_hier derives
    // the same quantizer inline, and the text family pays its own corpus
    // explodes.
    staged("bm25_index")(graft.llm.SearchRank.stageBm25(spark, sfDir))
    staged("ivf_hier_index")(graft.llm.AnnSql.stageHierIndex(spark, sfDir))
    // graph-index artifacts for the walk-serving queries (the kNN edge
    // BUILD cost stays measured by q_ann_knn_graph itself)
    staged("knn_edges")(graft.llm.LlmQueries.knnEdgesCached(spark, sfDir))
    staged("hnsw_edges")(graft.llm.HnswSearch.stageEdgesL2(spark, sfDir)) // also stages layer 1
    staged("probe_weights")(graft.llm.SearchRank.stageProbeWeights(spark, sfDir))

    // Dev-only: SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the timed matrix
    // (isolating one query from cross-query JVM state is the first step of
    // any regression bisect). The driver's invocation sets nothing and
    // times everything.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty) // an empty/blank env var means "time everything"
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown bench query name(s): ${unknown.mkString(", ")}")
    }
    // In a restricted (isolation-child) run, ALSO warm the target queries
    // themselves once untimed: the generic warm-up covers shared codegen
    // paths, but a fresh JVM still pays the target's own JIT/codegen on
    // first execution — which made isolated times read WORSE than
    // in-matrix ones (the matrix amortizes that across 190 predecessors)
    // and poisoned the isolated-vs-prev verdict. Steady-state is what the
    // prev record captures, so steady-state is what isolation must time.
    only.foreach(_.toSeq.sorted.foreach(n =>
      try { Staging.releaseTransient(); materialize(n) }
      catch { case _: Throwable => () }))

    // Machine-speed calibration: a fixed data-independent multicore
    // workload (hash + aggregate over an in-memory range), timed after
    // warm-up and emitted as calib_sec. Two benches on different VM boots
    // of "the same" box have differed by 1.5x uniformly across all ~190
    // queries; a per-record denominator lets any reader (and the
    // regression gate's consumers) separate machine drift from real
    // slowdowns before burning a round chasing phantoms.
    val calibSec: Double = {
      import org.apache.spark.sql.functions.{sum => fsum, xxhash64, col}
      def run(): Unit = spark.range(0, 1000000000L, 1, cpus.toInt)
        .select(fsum(xxhash64(col("id")).cast("double"))) // double: a long SUM of hashes overflows under ANSI
        .write.format("noop").mode("overwrite").save()
      try {
        run() // untimed JIT pass
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      } catch { case _: Throwable => -1.0 }
    }

    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcMillis(): Long = {
      var t = 0L; gcBeans.forEach(b => t += math.max(0L, b.getCollectionTime)); t
    }

    var failures = List.empty[String]
    // Per-query bookkeeping beyond the time: gc seconds, and memo-build
    // seconds (family artifacts built inside this query's timing — the
    // r11 finding-#3 attribution: without it the record cannot
    // distinguish "operator got faster" from "operator's cost moved to
    // its first-consumer sibling"). Transient staged frames of the
    // PREVIOUS query are unpersisted before the timer starts (guide §5;
    // r11 finding #1: orphaned localCheckpoint block sets accumulated
    // across 357 queries and slowed the whole matrix).
    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .map { name =>
      Staging.releaseTransient()
      val m0 = Staging.memoLedgerNanos
      val g0 = gcMillis()
      val t0 = System.nanoTime()
      val ok =
        try { materialize(name); true }
        catch {
          case e: Throwable =>
            failures ::= s"$name: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}"
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok, (gcMillis() - g0) / 1e3,
        (Staging.memoLedgerNanos - m0) / 1e9)
    }

    val qs = results
      .map { case (k, v, ok, _, _) => s""""$k":${if (ok) f"$v%.3f" else "null"}""" }
      .mkString("{", ",", "}")
    val gcs = results
      .map { case (k, _, _, g, _) => s""""$k":${f"$g%.3f"}""" }
      .mkString("{", ",", "}")
    val memos = results
      .collect { case (k, _, _, _, m) if m > 0.0005 => s""""$k":${f"$m%.3f"}""" }
      .mkString("{", ",", "}")
    val errs = results.filterNot(_._3).map(r => "\"" + r._1 + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v, true, _, _) => v }.sum
    // Per-query deltas vs the committed previous-round record, so the
    // round's JSON carries its own regression report (a total-only gate
    // let a 10-query 2-6x cluster hide inside an improved total in r4).
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREV", "BENCH_PREV.json")
    val (prev: Map[String, Double], prevCalib: Double) =
      if (!Files.exists(Paths.get(prevPath))) (Map.empty[String, Double], -1.0)
      else try {
        val txt = Files.readString(Paths.get(prevPath))
        // parse ONLY the "queries" object — the record also carries
        // per-query gc_sec entries under the same q_* names, which would
        // otherwise shadow the times and report nonsense ratios
        val qObj = txt.indexOf("\"queries\":{") match {
          case -1 => ""
          case i => txt.substring(i + 11, txt.indexOf('}', i))
        }
        val entry = """"(q_[a-z0-9_]+)":([0-9.]+)""".r
        val cal = """"calib_sec":([0-9.]+)""".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble).getOrElse(-1.0)
        (entry.findAllMatchIn(qObj).map(m => m.group(1) -> m.group(2).toDouble).toMap, cal)
      } catch { case _: Throwable => (Map.empty[String, Double], -1.0) }
    // Machine-drift normalization (r8 verdict #3): two boots of "the same"
    // box have timed the identical code 1.5x apart uniformly. When both
    // rounds carry a calibration time, ratios are judged against the
    // calib-adjusted prev (prev · calibNow/calibPrev); the raw ratio
    // stays in the report so nothing is hidden.
    val calibFactor =
      if (calibSec > 0 && prevCalib > 0) calibSec / prevCalib else 1.0
    // 0.3 s absolute floor: sub-second blips on a shared box are
    // measurement noise, not regressions (see the r4 cluster diagnosis).
    // Memo-build seconds are subtracted before flagging: a family
    // artifact's one-time build landing in a different first consumer
    // than last round is cost ATTRIBUTION moving, not a regression (the
    // raw time stays in `queries`; the build seconds in `memo_sec`).
    val memoByName = results.map { case (n, _, _, _, m) => n -> m }.toMap
    val candidates = results.collect {
      case (n, v, true, _, m) if prev.get(n).exists(p =>
        p > 0 && (v - m) / (p * calibFactor) > 1.5 && (v - m) - p * calibFactor > 0.3) =>
        (n, v)
    }

    /** Isolation protocol (the r4/r5 noise lesson made executable; r8
      * verdict #3 made it TOTAL): EVERY in-matrix "regression" is re-timed
      * in ONE fresh child JVM — same classpath, module flags and heap as
      * this (forked) process — whose matrix is the flagged set only, each
      * target warmed untimed before timing. That distinguishes a real
      * slowdown from 289-matrix context (GC pressure, state-store
      * maintenance, catalog growth, staged-artifact memory) and
      * shared-box scheduling noise, for ALL flags instead of a top-8
      * budget — the round-8 record left 46 flags unadjudicated and lost
      * its evidentiary value. One batched child costs one ~30 s JVM setup
      * regardless of flag count; per-query cross-talk inside the small
      * flags-only matrix is second-order next to what it removes. Child
      * output goes to a temp file, so the parent's stdout stays the
      * driver's single JSON line.
      */
    def isolatedTimes(names: Seq[String]): (Map[String, Double], Boolean) =
      if (names.isEmpty) (Map.empty, true)
      else try {
        val tmp = Files.createTempFile("bench_iso_", ".json")
        val log = Files.createTempFile("bench_iso_", ".log")
        val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
        val rt = java.lang.management.ManagementFactory.getRuntimeMXBean
        val cmd = new java.util.ArrayList[String]()
        cmd.add(javaBin)
        rt.getInputArguments.forEach(a => cmd.add(a))
        cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
        cmd.add("graft.Bench")
        val pb = new ProcessBuilder(cmd)
        pb.environment().put("SPARK_GRAFT_BENCH_ONLY", names.mkString(","))
        pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
        pb.environment().put("SPARK_GRAFT_CPUS", cpus)
        pb.environment().put("SPARK_GRAFT_BENCH_PREV", "/nonexistent")
        pb.environment().put("SPARK_GRAFT_BENCH_OUT", tmp.toString)
        pb.redirectOutput(log.toFile)
        pb.redirectErrorStream(true)
        val p = pb.start()
        // generous: warm+time two passes over the flagged set
        val done = p.waitFor(30, java.util.concurrent.TimeUnit.MINUTES)
        if (!done) { p.destroyForcibly(); (Map.empty, false) }
        else {
          // parse whatever the child recorded even on nonzero exit (a
          // single failing query must not discard the other adjudications)
          val childJson = Files.readString(tmp)
          val qObj = childJson.indexOf("\"queries\":{") match {
            case -1 => ""
            case i => childJson.substring(i + 11, childJson.indexOf('}', i))
          }
          val entry = """"(q_[a-z0-9_]+)":([0-9.]+)""".r
          // adjudication validity: a child whose own staging or warm-up
          // threw timed artifact BUILDS inside the flagged queries — its
          // datum must not suppress (or confirm) anything
          val childClean = !childJson.contains("\"ok\":false") &&
            childJson.contains("\"warmup_failed\":[]")
          (entry.findAllMatchIn(qObj).map(m => m.group(1) -> m.group(2).toDouble).toMap,
            childClean)
        }
      } catch { case scala.util.control.NonFatal(_) => (Map.empty, false) }

    // A restricted (BENCH_ONLY) run never isolates — it IS the isolation
    // child.
    val (isolated: Map[String, Option[Double]], isoValid: Boolean) =
      if (only.nonEmpty) (Map.empty[String, Option[Double]], true)
      else {
        val (times, clean) = isolatedTimes(candidates.map(_._1).sorted)
        (candidates.map { case (n, _) => n -> times.get(n) }.toMap, clean)
      }

    def entryJson(n: String, v: Double): String = {
      val iso = isolated.get(n).flatten
      val isoTxt = iso.map(d => f"$d%.3f").getOrElse("null")
      val memo = memoByName.getOrElse(n, 0.0)
      f""""$n":{"prev":${prev(n)}%.3f,"now":$v%.3f,"memo_s":$memo%.3f,"ratio":${v / prev(n)}%.2f,"adj_ratio":${v / (prev(n) * calibFactor)}%.2f,"isolated":$isoTxt}"""
    }
    // confirmed = still >1.3x calib-adjusted prev when re-timed in the
    // fresh flags-only JVM (or no isolation datum); within 1.3x isolated
    // = matrix/noise, suppressed into its own object so the evidence
    // stays in the record. An INVALID isolation run (child staging or
    // warm-up threw) suppresses nothing — every flag stays confirmed with
    // its datum visible, and `isolation_valid:false` says why.
    val (noise, confirmed) = candidates.partition { case (n, _) =>
      isoValid && isolated.get(n).flatten.exists(iso =>
        prev.get(n).exists(p => iso / (p * calibFactor) <= 1.3))
    }
    val regressions = confirmed.map { case (n, v) => entryJson(n, v) }.mkString("{", ",", "}")
    val suppressed = noise.map { case (n, v) => entryJson(n, v) }.mkString("{", ",", "}")
    // The 33-query round-1 matrix (all names unchanged) — reported separately
    // so matrix growth isn't mistaken for a slowdown.
    val r1Names = Set(
      "q_scan_project", "q_filter_pred", "q_filter_in_like", "q_filter_null_distinct",
      "q_case_cast", "q_values_inline", "q_unnest", "q_agg_q1", "q_agg_ungrouped",
      "q_agg_having", "q_agg_stats", "q_agg_filter_clause", "q_join_inner",
      "q_join_left", "q_join_right", "q_join_full", "q_join_semi", "q_join_anti",
      "q_join_cross", "q_join_theta", "q_join_range", "q_join_using",
      "q_join_derived", "q_sort_nulls", "q_sort_multi_desc", "q_limit_offset",
      "q_union_all", "q_union_distinct", "q_intersect", "q_intersect_all",
      "q_except", "q_except_all", "q_distinct")
    val r1Total = results.collect { case (n, v, true, _, _) if r1Names.contains(n) => v }.sum
    val note = "r2 re-baseline: materializing noop-write action + warm-up " +
      "(r1 used count(), which let Catalyst drop sorts/projections); " +
      "r1_queries_total covers the original 33-query matrix under the new harness"
    val stagingJson = stagingEntries.reverse
      .map { case (n, s, ok) => s""""$n":{"sec":${f"$s%.3f"},"ok":$ok}""" }
      .mkString("{", ",", "}")
    val warmupJson = warmupFailed.reverse.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Two renderings of one record (r11 verdict #2: the driver failed to
    // parse the bench stdout two rounds running — only a 2000-char tail
    // of it survives, and the full line had grown to ~40 KB):
    //  - the FULL record (per-query gc/memo seconds, staging steps,
    //    regression adjudication) goes to bench_out.json — the stable
    //    mirror path; the isolation parent and the committed round
    //    evidence read this file;
    //  - stdout carries ONE LEAN JSON line with the contract fields
    //    (metric/value/unit/queries/sf) plus the scalar diagnostics —
    //    ~9 KB, printed AFTER spark.stop() via a single flushed write so
    //    no executor/log output can interleave and nothing follows it
    //    but the sbt footer. Same numbers in both; nothing is dropped.
    val shared =
      s""""metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","cpus":$cpus,"calib_sec":${f"$calibSec%.3f"},"prev_calib_sec":${f"$prevCalib%.3f"},"calib_factor":${f"$calibFactor%.3f"},"isolation_valid":$isoValid,"n_flagged":${candidates.size},"n_isolated":${isolated.count(_._2.nonEmpty)},"n_ok":${results.count(_._3)},"n":${results.size},"r1_queries_total":${f"$r1Total%.3f"}"""
    val fullJson =
      s"""{$shared,"gc_sec":$gcs,"memo_sec":$memos,"staging":$stagingJson,"warmup_failed":$warmupJson,"regressions_vs_prev":$regressions,"noise_suppressed":$suppressed,"note":"$note"}"""
    val leanJson = s"""{$shared,"full_record":"bench_out.json","note":"$note"}"""
    Files.writeString(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
      fullJson + "\n")
    failures.foreach(f => System.err.println(s"[bench] FAIL $f"))
    spark.stop()
    System.out.println(leanJson)
    System.out.flush()
    if (failures.nonEmpty) sys.exit(1)
  }
}
