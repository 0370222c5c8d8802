package graft.queries

import graft.queries.QuerySpec.{sql, sql2}
import graft.Staging.StagedDataFrame

/** Warehouse-maintenance operators a production deployment of the engine
  * runs alongside the query surface (the reference delegates this whole
  * class to its SQL engine; here each is a first-party, plan-audited
  * Spark query):
  *
  *  - SCD2 dimension reconstruction from a CDC change stream — the
  *    "merge a day of upserts into a slowly-changing dimension" primitive,
  *    expressed as ONE declarative pass (compaction, no-op-change collapse
  *    and validity-interval construction are three window functions over
  *    the SAME key partitioning, so Catalyst plans a single exchange);
  *  - range-partition boundary planning + balance audit — what Spark's
  *    RangePartitioner does before any global sort / sorted write, made
  *    explicit: a bounded deterministic sample picks k−1 cut points, the
  *    cuts broadcast to every row as ONE array literal (no per-boundary
  *    row expansion), and the output is the per-partition histogram a
  *    layout decision actually needs.
  */
object WarehouseQueries {

  /** SCD2 (type-2 slowly-changing dimension) reconstruction. The change
    * stream is `orders` read as CDC events: each order sets its customer's
    * current status; the operator emits the full validity-interval history
    * (valid_from/valid_to/is_current) after (a) per-(key, ts) compaction
    * (highest sequence number wins — CDC batches carry multiple updates
    * for one key at one timestamp) and (b) collapsing consecutive
    * identical values (no-op updates must not open a new version row —
    * the classic SCD2 bug).
    *
    * 100 TB shape: every window PARTITIONs BY key, so the whole
    * reconstruction is ONE hash exchange on the dimension key followed by
    * per-key sorts — no self-join against the history, no global sort.
    * The `% 10` slice only bounds the dumped output. (PlanAuditSpec pins
    * the single-exchange property.)
    */
  /** The SCD2 build chain (change stream → per-key validity intervals),
    * shared verbatim by [[scd2]] and the point-in-time join so the two
    * operators provably consume the same dimension.
    */
  private val scdChain =
    """ch AS (SELECT o_custkey AS key, o_orderdate AS ts,
      |                  o_orderkey AS seq, o_orderstatus AS attr
      |           FROM orders),
      |sel AS (SELECT key, ts, attr,
      |               lag(ts) OVER (PARTITION BY key ORDER BY ts, seq DESC) AS pts
      |        FROM ch),
      |ded AS (SELECT key, ts, attr FROM sel WHERE pts IS NULL OR pts <> ts),
      |runs AS (SELECT key, ts, attr,
      |                lag(attr) OVER (PARTITION BY key ORDER BY ts) AS prev
      |         FROM ded),
      |st AS (SELECT key, ts, attr FROM runs
      |       WHERE prev IS NULL OR prev <> attr),
      |scd AS (SELECT key, attr, ts AS valid_from,
      |               lead(ts) OVER (PARTITION BY key ORDER BY ts) AS valid_to
      |        FROM st)""".stripMargin

  private val scd2 =
    s"""WITH $scdChain
      |SELECT key, attr, valid_from, valid_to,
      |       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
      |FROM scd WHERE key % 10 = 0
      |ORDER BY key, valid_from""".stripMargin

  /** Range-partition planning for a sorted layout on l_extendedprice:
    * a bounded deterministic sample (1024 md5-smallest rows — the
    * reservoir Spark's RangePartitioner draws, made reproducible) is
    * ntile'd into 8 tiles whose upper edges become the k−1 cut points;
    * the cuts ship to the fact scan as ONE collected array (a single-row
    * broadcast — see the GlobalPlanSweepSpec allowlist) and each row's
    * partition id is the count of cuts below its value, computed by a
    * codegen'd array lambda with NO row expansion. Output: per-partition
    * row counts and min/max — the balance audit that decides whether the
    * boundaries are good enough to write.
    *
    * Determinism: prices quantize to integer cents before any comparison;
    * tile maxima are order-statistics of the sorted sample multiset, so
    * ties cannot shift a cut; the sample ranking tiebreaks on the row key
    * AND cents under the md5 draw ((l_orderkey, l_linenumber) is NOT
    * unique in this fixture, so the value itself must disambiguate rows
    * tied at the LIMIT edge or the two engines sample different
    * multisets).
    */
  private def rangePartSpark =
    """WITH v AS (SELECT l_orderkey, l_linenumber,
      |                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |          FROM lineitem),
      |samp AS (SELECT cents FROM v
      |         ORDER BY md5(CAST(l_orderkey * 16 + l_linenumber AS STRING)),
      |                  l_orderkey, l_linenumber, cents
      |         LIMIT 1024),
      |tiles AS (SELECT cents, ntile(8) OVER (ORDER BY cents) AS tile FROM samp),
      |bounds AS (SELECT tile, MAX(cents) AS cut FROM tiles WHERE tile < 8 GROUP BY tile),
      |cuts AS (SELECT sort_array(collect_list(cut)) AS cs FROM bounds),
      |asn AS (SELECT CAST(size(filter(cuts.cs, c -> v.cents > c)) AS INT) AS pid, v.cents
      |        FROM v CROSS JOIN cuts)
      |SELECT pid, COUNT(*) AS n_rows, MIN(cents) AS min_cents, MAX(cents) AS max_cents
      |FROM asn GROUP BY pid ORDER BY pid""".stripMargin

  private def rangePartDuck =
    """WITH v AS (SELECT l_orderkey, l_linenumber,
      |                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |          FROM lineitem),
      |samp AS (SELECT cents FROM v
      |         ORDER BY md5(CAST(l_orderkey * 16 + l_linenumber AS VARCHAR)),
      |                  l_orderkey, l_linenumber, cents
      |         LIMIT 1024),
      |tiles AS (SELECT cents, ntile(8) OVER (ORDER BY cents) AS tile FROM samp),
      |bounds AS (SELECT tile, MAX(cents) AS cut FROM tiles WHERE tile < 8 GROUP BY tile),
      |cuts AS (SELECT list_sort(list(cut)) AS cs FROM bounds),
      |asn AS (SELECT CAST(len(list_filter(cuts.cs, c -> v.cents > c)) AS INT) AS pid, v.cents
      |        FROM v CROSS JOIN cuts)
      |SELECT pid, COUNT(*) AS n_rows, MIN(cents) AS min_cents, MAX(cents) AS max_cents
      |FROM asn GROUP BY pid ORDER BY pid""".stripMargin

  /** Per-user hourly time-series resampling with forward fill: aggregate
    * purchases to hour bins, generate each user's COMPLETE hour spine
    * between their first and last active hour (the missing-bin
    * densification every feature/metrics pipeline needs before rolling
    * computations), left-join the actuals back and forward-fill the last
    * observed value across the gaps with an IGNORE NULLS running
    * last_value.
    *
    * 100 TB shape: the bin aggregate map-side combines to (user, hour)
    * cardinality; the spine generates at most span-hours rows per user
    * from the K-row per-user min/max table (no calendar cross join); the
    * fill window rides the same user_id partitioning as the spine join.
    * Money forward-fills as integer cents (exact in any fold order).
    */
  private def resampleSql(epochUs: String, lastValIgnoreNulls: String) =
    s"""WITH e AS (SELECT user_id,
       |                 CAST(FLOOR($epochUs / 3600000000) AS BIGINT) AS hr,
       |                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
       |          FROM events WHERE event_type = 'purchase'),
       |b AS (SELECT user_id, hr, SUM(cents) AS cents, COUNT(*) AS n
       |      FROM e GROUP BY user_id, hr),
       |sp AS (SELECT user_id, SPINE_EXPR AS hr
       |       FROM (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM b GROUP BY user_id) z),
       |f AS (SELECT sp.user_id, sp.hr, b.cents, b.n
       |      FROM sp LEFT JOIN b ON sp.user_id = b.user_id AND sp.hr = b.hr),
       |fill AS (SELECT user_id, hr, COALESCE(n, 0) AS n_events, cents,
       |                $lastValIgnoreNulls
       |                  OVER (PARTITION BY user_id ORDER BY hr
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
       |         FROM f)
       |SELECT user_id, hr, CAST(n_events AS BIGINT) AS n_events,
       |       CAST(COALESCE(cents, 0) AS BIGINT) AS cents,
       |       CAST(ff AS BIGINT) AS cents_ff
       |FROM fill WHERE user_id % 5 = 0 ORDER BY user_id, hr""".stripMargin

  private val resampleSpark =
    resampleSql("unix_micros(CAST(ts AS TIMESTAMP))", "last_value(cents) IGNORE NULLS")
      .replace("SPINE_EXPR", "explode(sequence(mn, mx))")

  private val resampleDuck =
    resampleSql("epoch_us(ts)", "last_value(cents IGNORE NULLS)")
      .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")

  /** Weekly cohort retention triangle: cohort = the user's first active
    * week; cell (cohort, offset) counts distinct users from that cohort
    * active offset weeks later, with retention in basis points against
    * the cohort's own week-0 size. Two shuffles total (user_id for the
    * cohort min, (cohort, offset) for the cell rollup); the week-0
    * denominator arrives by a window over the tiny cell table, not a
    * second scan.
    */
  private def retentionSql(epochUs: String) =
    s"""WITH e AS (SELECT user_id,
       |                 CAST(FLOOR($epochUs / 604800000000) AS BIGINT) AS wk
       |          FROM events),
       |coh AS (SELECT user_id, MIN(wk) AS cwk FROM e GROUP BY user_id),
       |act AS (SELECT DISTINCT e.user_id, c.cwk, e.wk - c.cwk AS off
       |        FROM e JOIN coh c ON e.user_id = c.user_id),
       |g AS (SELECT cwk, off, COUNT(*) AS n_users FROM act GROUP BY cwk, off),
       |r AS (SELECT cwk, off, n_users,
       |             MAX(CASE WHEN off = 0 THEN n_users END) OVER (PARTITION BY cwk) AS n0
       |      FROM g)
       |SELECT cwk, CAST(off AS INT) AS wk_offset, CAST(n_users AS BIGINT) AS n_users,
       |       CAST(FLOOR(n_users * 10000.0 / n0 + 0.5) AS BIGINT) AS retention_bp
       |FROM r ORDER BY cwk, wk_offset""".stripMargin

  /** Rolling z-score anomaly detection over the per-user hourly purchase
    * series: each bin scores against the mean/std of its TRAILING 24
    * observed bins (current row excluded — the classic self-exclusion that
    * keeps a spike from masking itself), flagged at |z| >= 3 with an
    * 8-observation warm-up and a zero-variance guard.
    *
    * Determinism: the window maintains integer COUNT/SUM/SUM-of-squares in
    * cents (exact in any fold order; cents² stays far under 2^53); the
    * z-score numerator n·x − s is integer; only the final
    * SQRT/divide/FLOOR run in doubles — the same IEEE ops in the same
    * order in both engines (the q_embed_snapshot_drift discipline). All
    * three windows ride ONE user_id exchange.
    */
  private def anomalySql(epochUs: String) =
    s"""WITH e AS (SELECT user_id,
       |                 CAST(FLOOR($epochUs / 3600000000) AS BIGINT) AS hr,
       |                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
       |          FROM events WHERE event_type = 'purchase'),
       |b AS (SELECT user_id, hr, SUM(cents) AS cents FROM e GROUP BY user_id, hr),
       |w AS (SELECT user_id, hr, cents,
       |             COUNT(*) OVER wnd AS n,
       |             SUM(cents) OVER wnd AS s,
       |             SUM(cents * cents) OVER wnd AS s2
       |      FROM b
       |      WINDOW wnd AS (PARTITION BY user_id ORDER BY hr
       |                     ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
       |z AS (SELECT user_id, hr, cents, n,
       |             CASE WHEN n >= 8 AND n * s2 - s * s > 0
       |                  THEN CAST(FLOOR(CAST(n * cents - s AS DOUBLE)
       |                                  / (n * SQRT(CAST(n * s2 - s * s AS DOUBLE)
       |                                              / (n * (n - 1.0)))) * 100 + 0.5) AS BIGINT)
       |                  END AS z_bp
       |      FROM w)
       |SELECT user_id, hr, CAST(cents AS BIGINT) AS cents,
       |       CAST(n AS BIGINT) AS n_window, z_bp,
       |       CAST(CASE WHEN z_bp IS NOT NULL AND ABS(z_bp) >= 300 THEN 1 ELSE 0 END AS INT) AS is_anomaly
       |FROM z WHERE user_id % 5 = 0 ORDER BY user_id, hr""".stripMargin

  /** Linear (multi-touch) attribution: every purchase splits one unit of
    * credit equally across the SAME user's clicks in the trailing hour;
    * the output rolls credit up per click event. The interval predicate
    * is executed as a BANDED equi-join — each purchase probes its two
    * covering hour buckets (the q_join_theta_banded discipline applied to
    * time), so the plan is hash joins with bounded fan-out, never a range
    * nested loop. Credit is FLOOR(10000/k) bp per click (integer-exact in
    * any fold order; the residue stays unassigned, as published
    * attribution models round).
    */
  private def attributionSql(epochUs: String) =
    s"""WITH c AS (SELECT event_id AS click_id, user_id, $epochUs AS cus
       |          FROM events WHERE event_type = 'click'),
       |p AS (SELECT event_id AS purchase_id, user_id, $epochUs AS pus
       |      FROM events WHERE event_type = 'purchase'),
       |pb AS (SELECT purchase_id, user_id, pus,
       |              CAST(FLOOR(pus / 3600000000) AS BIGINT) - b AS bkt
       |       FROM p LATERAL_B),
       |cand AS (SELECT p.purchase_id, p.pus, c.click_id, c.cus
       |         FROM pb p JOIN c
       |           ON p.user_id = c.user_id
       |          AND p.bkt = CAST(FLOOR(c.cus / 3600000000) AS BIGINT)
       |         WHERE c.cus >= p.pus - 3600000000 AND c.cus <= p.pus),
       |k AS (SELECT purchase_id, COUNT(*) AS n_clicks FROM cand GROUP BY purchase_id),
       |cr AS (SELECT cand.click_id,
       |              CAST(FLOOR(10000.0 / k.n_clicks) AS BIGINT) AS credit_bp
       |       FROM cand JOIN k ON cand.purchase_id = k.purchase_id)
       |SELECT click_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       |       CAST(SUM(credit_bp) AS BIGINT) AS credit_bp
       |FROM cr GROUP BY click_id ORDER BY click_id""".stripMargin

  private val attributionSpark =
    attributionSql("unix_micros(CAST(ts AS TIMESTAMP))")
      .replace("LATERAL_B", "LATERAL VIEW explode(sequence(0, 1)) t AS b")

  private val attributionDuck =
    attributionSql("epoch_us(ts)")
      .replace("FROM p LATERAL_B",
        "FROM (SELECT purchase_id, user_id, pus, unnest(range(0, 2)) AS b FROM p) z")

  /** Next-event transition matrix (the user-journey Markov model product
    * analytics fits): per user, order events by time and count (current →
    * next) event-type pairs, with row-normalized probabilities in basis
    * points. One lead() window rides a user_id exchange; the rollup is a
    * K²-row regroup; the row normalizer is a window over that K² table.
    * Ordering ties break on event_id, so the sequence — and therefore the
    * matrix — is deterministic.
    */
  private val transitions =
    """WITH s AS (SELECT user_id, event_type,
      |                 lead(event_type) OVER (PARTITION BY user_id
      |                                        ORDER BY ts, event_id) AS nxt
      |          FROM events)
      |SELECT event_type AS src, nxt AS dst, COUNT(*) AS n,
      |       CAST(FLOOR(COUNT(*) * 10000.0
      |                  / SUM(COUNT(*)) OVER (PARTITION BY event_type) + 0.5) AS BIGINT) AS p_bp
      |FROM s WHERE nxt IS NOT NULL
      |GROUP BY event_type, nxt ORDER BY src, dst""".stripMargin

  /** Sequential-pattern mining lite: the top contiguous 3-step behavior
    * sequences with occurrence and user-support counts — the
    * market-basket-over-time primitive (the first pass of PrefixSpan-style
    * mining restricted to contiguous windows, which is what clickstream
    * teams actually deploy). Two stacked lags over ONE (user, time)
    * window partitioning — Catalyst plans a single exchange, same
    * discipline as [[transitions]] — then a 5³-bounded group-by and a
    * TakeOrdered top-15. Integer counts only; (ts, event_id) ordering
    * makes the lag pair deterministic under timestamp ties.
    */
  private val seqTrigrams =
    """WITH w AS (SELECT user_id, event_type AS e3,
      |                 lag(event_type, 1) OVER (PARTITION BY user_id
      |                                          ORDER BY ts, event_id) AS e2,
      |                 lag(event_type, 2) OVER (PARTITION BY user_id
      |                                          ORDER BY ts, event_id) AS e1
      |          FROM events),
      |g AS (SELECT e1, e2, e3, COUNT(*) AS n_occur,
      |             COUNT(DISTINCT user_id) AS n_users
      |      FROM w WHERE e1 IS NOT NULL GROUP BY e1, e2, e3),
      |sel AS (SELECT e1, e2, e3, n_occur, n_users FROM g
      |        ORDER BY n_occur DESC, e1, e2, e3 LIMIT 15)
      |SELECT CAST(row_number() OVER (ORDER BY n_occur DESC, e1, e2, e3) AS INT) AS rk,
      |       e1, e2, e3, CAST(n_occur AS BIGINT) AS n_occur,
      |       CAST(n_users AS BIGINT) AS n_users
      |FROM sel ORDER BY rk""".stripMargin

  /** Watermark-lateness audit: before a streaming job fixes its watermark
    * delay, measure — per arrival shard — how many events would arrive
    * late at each candidate delay. The fixture's events land in event-time
    * order, so arrival is modeled as event time plus a deterministic
    * md5-keyed network delay in [0 s, 86400 s); the per-shard running max
    * event time over the rows that arrived STRICTLY EARLIER is the
    * watermark a source partition would have advanced, and an event is
    * late at delay W when its event time trails that watermark by more
    * than W. Because any inversion (tB − tA for B arriving before A) is
    * bounded by the delay spread, the W = 86400 row is provably zero —
    * the audit's self-check. One window pass partitioned by shard
    * (parallel — watermarks ARE per-source-partition before the global
    * min, so this is the honest shape), one 3-row delay-level join
    * (bounded broadcast), one rollup. Feeds q_stream_dedup_within_wm's
    * delay choice; pure integer microsecond arithmetic.
    */
  private def latenessSql(epochUs: String, h16: String, levels: String, intDiv: String) =
    s"""WITH e AS (SELECT event_id, event_id % 8 AS shard, $epochUs AS us,
       |                 $epochUs + ($h16 % 86400) * 1000000 AS arr_us
       |          FROM events),
       |arr AS (SELECT shard, us,
       |               MAX(us) OVER (PARTITION BY shard ORDER BY arr_us, event_id
       |                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
       |        FROM e),
       |lv AS ($levels),
       |d AS (SELECT lv.w_s, COUNT(*) AS n_events,
       |             CAST(SUM(CASE WHEN arr.wm_us IS NOT NULL
       |                            AND arr.us < arr.wm_us - CAST(lv.w_s AS BIGINT) * 1000000
       |                           THEN 1 ELSE 0 END) AS BIGINT) AS n_late
       |      FROM arr CROSS JOIN lv GROUP BY lv.w_s)
       |SELECT CAST(w_s AS BIGINT) AS w_s, CAST(n_events AS BIGINT) AS n_events, n_late,
       |       CAST(n_late * 10000 $intDiv n_events AS BIGINT) AS late_bp
       |FROM d ORDER BY w_s""".stripMargin

  /** ORDERED funnel (signup → later click → later purchase): each stage
    * must happen strictly after the previous stage's FIRST completion —
    * the sequence constraint a plain per-type count funnel cannot
    * express. Three per-user MIN aggregates chained by equi-joins (each
    * join keyed on user_id; the stage predicate rides the join's WHERE),
    * then one global rollup with conversion rates in basis points.
    */
  private val funnelOrdered =
    """WITH s AS (SELECT user_id, MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0
      |          FROM events GROUP BY user_id),
      |c AS (SELECT e.user_id, MIN(e.ts) AS t1
      |      FROM events e JOIN s ON e.user_id = s.user_id
      |      WHERE e.event_type = 'click' AND e.ts > s.t0
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, MIN(e.ts) AS t2
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t1
      |      GROUP BY e.user_id),
      |f AS (SELECT s.user_id,
      |             CASE WHEN s.t0 IS NOT NULL THEN 1 ELSE 0 END AS st0,
      |             CASE WHEN c.t1 IS NOT NULL THEN 1 ELSE 0 END AS st1,
      |             CASE WHEN p.t2 IS NOT NULL THEN 1 ELSE 0 END AS st2
      |      FROM s LEFT JOIN c ON s.user_id = c.user_id
      |             LEFT JOIN p ON s.user_id = p.user_id)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |       CAST(SUM(st0) AS BIGINT) AS n_signup,
      |       CAST(SUM(st1) AS BIGINT) AS n_click_after,
      |       CAST(SUM(st2) AS BIGINT) AS n_purchase_after,
      |       CAST(FLOOR(SUM(st1) * 10000.0 / GREATEST(SUM(st0), 1) + 0.5) AS BIGINT) AS conv1_bp,
      |       CAST(FLOOR(SUM(st2) * 10000.0 / GREATEST(SUM(st1), 1) + 0.5) AS BIGINT) AS conv2_bp
      |FROM f""".stripMargin

  /** Kaplan–Meier survival curve for time-to-first-purchase (hours from
    * each user's first event), right-censoring users who never purchase
    * at their last observed event — the retention/conversion estimator
    * that handles incomplete journeys correctly (a naive conversion rate
    * treats censored users as failures).
    *
    * S(t) = Π_{t_i <= t} (1 − d_i/n_i) folds in INTEGER log space:
    * each factor is ln((n−d)/n) — an integer ratio — rounded to micro-nats
    * by the engine-neutral kernel (round-8: the old libm LN here was the
    * same last-ulp exposure the DSIR family tripped over), the running
    * product is a window SUM over the bounded time axis (≤ span-hours
    * rows), and the display-edge exp rides the neutral Taylor kernel on
    * the NEGATED clamped sum: surv = 1e10 / (exp(−cum)·1e6) in basis
    * points, exact integer division semantics in both engines. At-risk
    * counts come from a prefix window over the grouped observation-time
    * table, NOT a correlated per-row rescan.
    */
  /** Shared survival risk-set chain (conversion-time table → per-event-
    * time deaths d and at-risk counts n) — consumed by both the
    * Kaplan-Meier product-limit estimator and the Nelson-Aalen
    * cumulative-hazard estimator.
    */
  private def survivalRiskCtes(epochUs: String) =
    s"""u AS (SELECT user_id, MIN($epochUs) AS t_first,
       |                 MIN(CASE WHEN event_type = 'purchase' THEN $epochUs END) AS t_conv,
       |                 MAX($epochUs) AS t_last
       |          FROM events GROUP BY user_id),
       |d AS (SELECT user_id,
       |             CAST(FLOOR((COALESCE(t_conv, t_last) - t_first) / 3600000000.0) AS BIGINT) AS t_obs,
       |             CASE WHEN t_conv IS NOT NULL THEN 1 ELSE 0 END AS conv
       |      FROM u),
       |g AS (SELECT t_obs AS t, SUM(conv) AS d, COUNT(*) AS c FROM d GROUP BY t_obs),
       |pre AS (SELECT t, d,
       |               SUM(c) OVER (ORDER BY t
       |                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS n_before,
       |               SUM(c) OVER () AS total
       |        FROM g),
       |risk AS (SELECT t, d, total - COALESCE(n_before, 0) AS n
       |         FROM pre WHERE d > 0)""".stripMargin

  private def kmSurvivalSql(epochUs: String, k: graft.llm.NeutralMath.KernelSplice) =
    s"""WITH ${survivalRiskCtes(epochUs)},
       |lr0 AS (SELECT t, d, n,
       |               CAST(GREATEST(n - d, 1) AS BIGINT) AS fnum, CAST(n AS BIGINT) AS fden
       |        FROM risk),
       |${k.ln("lrk", "lr0", "t, d, n, GREATEST(n - d, 0) AS nd, fnum, fden",
          "t, d, n, nd", "fnum", "fden", "lfac", "1.0E6")},
       |km AS (SELECT t, d, n,
       |              SUM(CASE WHEN nd > 0 THEN lfac ELSE CAST(0 AS BIGINT) END)
       |                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_log,
       |              MAX(CASE WHEN nd = 0 THEN 1 ELSE 0 END)
       |                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS extinct
       |       FROM lrk),
       |km2 AS (SELECT t, d, n, extinct,
       |               LEAST(CAST(29000000 AS BIGINT), 0 - cum_log) AS negcum
       |        FROM km),
       |${k.exp("kmx", "km2", "t, d, n, extinct, negcum",
          "t, d, n, extinct", "negcum", "einv")}
       |SELECT t AS hours, CAST(d AS BIGINT) AS n_conv, CAST(n AS BIGINT) AS n_risk,
       |       CASE WHEN extinct = 1 THEN CAST(0 AS BIGINT)
       |            ELSE CAST(FLOOR(1.0E10 / CAST(einv AS DOUBLE) + 0.5E0) AS BIGINT) END AS surv_bp
       |FROM kmx ORDER BY hours""".stripMargin

  /** Nelson-Aalen cumulative hazard (Nelson 1972; Aalen, Ann. Stat.
    * 1978): H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ over the SAME risk-set chain as
    * q_events_survival_km, plus the Fleming-Harrington survival read-off
    * exp(−H) — the estimator pair a reliability/conversion analysis
    * reports together (NA's hazard INCREMENTS are what a monitoring
    * alert thresholds on; KM's product limit is what a survival curve
    * plots — near-identical survival when increments are small, and the
    * divergence itself is the small-risk-set warning).
    *
    * Determinism: each increment dᵢ·10⁶/nᵢ quantizes through the shared
    * FLOOR(double + 0.5) text (one IEEE division on exact integers);
    * the cumulative sum is an exact BIGINT window over event-time rows;
    * exp rides the engine-neutral kernel with the KM clamp. Shuffle
    * shape identical to KM: one user aggregate, event-time-bounded
    * windows.
    */
  private def nelsonAalenSql(epochUs: String, k: graft.llm.NeutralMath.KernelSplice) =
    s"""WITH ${survivalRiskCtes(epochUs)},
       |na0 AS (SELECT t, d, n,
       |               CAST(FLOOR(CAST(d AS DOUBLE) * 1.0E6 / n + 0.5E0) AS BIGINT) AS h_micro
       |        FROM risk),
       |na AS (SELECT t, d, n,
       |              CAST(SUM(h_micro) OVER (ORDER BY t
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_micro
       |       FROM na0),
       |na2 AS (SELECT t, d, n, cum_micro,
       |               LEAST(CAST(29000000 AS BIGINT), cum_micro) AS hcl
       |        FROM na),
       |${k.exp("nax", "na2", "t, d, n, cum_micro, hcl",
          "t, d, n, cum_micro", "hcl", "einv")}
       |SELECT t AS hours, CAST(d AS BIGINT) AS n_conv, CAST(n AS BIGINT) AS n_risk,
       |       cum_micro AS cumhaz_micro,
       |       CAST(FLOOR(1.0E10 / CAST(einv AS DOUBLE) + 0.5E0) AS BIGINT) AS fh_surv_bp
       |FROM nax ORDER BY hours""".stripMargin

  /** Event-type co-occurrence LIFT (market-basket association over user
    * baskets): lift(a,b) = P(a,b) / (P(a)·P(b)) across users, > 1 when
    * two behaviors attract. The per-user basket (DISTINCT types) is
    * aggregated ONCE and STAGED (localCheckpoint — SQL-text CTEs
    * re-inline per reference, which planned 5 events scans; the staged
    * form scans events once, the q_text_bpe_train discipline), then the
    * pair self-join runs over exploded baskets with per-user fan-out
    * bounded by |types|². Lift reports in bp with exact-integer operands
    * into one FLOORed division.
    */
  private val liftTail =
    """WITH e AS (SELECT user_id, t FROM lift_u LATERAL VIEW explode(ts) x AS t),
      |n AS (SELECT COUNT(*) AS total FROM lift_u),
      |per AS (SELECT t AS event_type, COUNT(*) AS c FROM e GROUP BY t),
      |pair AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS cab
      |         FROM e a JOIN e b ON a.user_id = b.user_id AND a.t < b.t
      |         GROUP BY a.t, b.t)
      |SELECT ta, tb, CAST(cab AS BIGINT) AS n_both,
      |       CAST(FLOOR(cab * 10000.0 * (SELECT total FROM n)
      |                  / (pa.c * pb.c) + 0.5) AS BIGINT) AS lift_bp
      |FROM pair JOIN per pa ON ta = pa.event_type
      |          JOIN per pb ON tb = pb.event_type
      |ORDER BY ta, tb""".stripMargin

  private val liftDuck =
    """WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
      |n AS (SELECT COUNT(DISTINCT user_id) AS total FROM events),
      |per AS (SELECT event_type, COUNT(*) AS c FROM u GROUP BY event_type),
      |pair AS (SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS cab
      |         FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
      |         GROUP BY a.event_type, b.event_type)
      |SELECT ta, tb, CAST(cab AS BIGINT) AS n_both,
      |       CAST(FLOOR(cab * 10000.0 * (SELECT total FROM n)
      |                  / (pa.c * pb.c) + 0.5) AS BIGINT) AS lift_bp
      |FROM pair JOIN per pa ON ta = pa.event_type
      |          JOIN per pb ON tb = pb.event_type
      |ORDER BY ta, tb""".stripMargin

  /** k-anonymous release with a two-level generalization ladder (Sweeney,
    * "k-Anonymity: a model for protecting privacy", IJUFKS 2002): the
    * quasi-identifier (event_type, hour-of-day, value bucket) must appear
    * in at least K = 5 rows to be released. Cells below K GENERALIZE the
    * value bucket tens → hundreds and re-test; still-small cells suppress.
    * This is the release audit a data-governance pass runs before handing
    * an event extract to a downstream team.
    *
    * 100 TB: two map-side-combined aggregates over the (pruned) event
    * scan build the level-1 and level-2 cell tables (bounded by
    * |types|·24·|buckets| — constants, broadcast back onto the rows), the
    * per-row level decision is a projection, and the rollup is
    * cell-bounded. Determinism: integer hour/bucket arithmetic, the
    * level-2 table counts ONLY level-1-failing rows (generalizing
    * already-released rows would double-count them into their wider
    * cell).
    */
  /** ε-differentially-private count release (Dwork-McSherry-Nissim-Smith,
    * TCC 2006: the Laplace mechanism; unit-count sensitivity 1, ε = 1 →
    * noise ~ Laplace(b = 1)) — the OTHER privacy primitive next to
    * q_events_k_anonymity's generalization ladder: k-anonymity coarsens
    * the rows, DP perturbs the aggregate. Released value = true per-type
    * count + Laplace noise via the exact inverse CDF,
    *
    *   noise = −b · sign(u − ½) · ln(1 − 2|u − ½|),
    *
    * with u drawn from a 24-bit md5 slice of the event type (a fixed
    * public seed keeps the fixture oracle-checkable; a production release
    * derives u from a SECRET per-release seed — same plan, one key
    * swap). With m = 2^24 and k = 2h+1 (odd, so k ≠ m and sign is
    * well-defined), 1 − 2|u − ½| = (m − |k − m|)/m exactly, so the log
    * rides the engine-neutral kernel on the integer ratio m/(m−|k−m|) —
    * no engine libm. Release clamps at 0; the audit columns (true count,
    * |noise|) exist because the fixture is closed — a real release drops
    * them.
    *
    * 100 TB shape: one map-side-combined count over the stream → T-row
    * type table; the noise kernel and release arithmetic run on those T
    * rows. Nothing else touches the corpus.
    */
  private def dpReleaseSql(md5big: String, k: graft.llm.NeutralMath.KernelSplice) =
    s"""WITH c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
       |          FROM events GROUP BY event_type),
       |sd AS (SELECT event_type, n, CAST(2 * ($md5big) + 1 AS BIGINT) AS kk
       |       FROM c),
       |s2 AS (SELECT event_type, n,
       |              CASE WHEN kk < 16777216 THEN -1 ELSE 1 END AS sgn,
       |              CAST(16777216 - ABS(kk - 16777216) AS BIGINT) AS dev
       |       FROM sd),
       |${k.ln("lp", "s2", "event_type, n, sgn", "event_type, n, sgn",
               "16777216", "dev", "l_micro", "1.0E6")},
       |rel AS (SELECT event_type, n, sgn * l_micro AS noise_micro FROM lp)
       |SELECT event_type,
       |       CAST(n AS BIGINT) AS true_n,
       |       CAST(noise_micro AS BIGINT) AS noise_micro,
       |       GREATEST(CAST(0 AS BIGINT),
       |         CAST(FLOOR((CAST(n AS DOUBLE) * 1.0E6 + CAST(noise_micro AS DOUBLE)) / 1.0E6 + 0.5E0) AS BIGINT)) AS released_n,
       |       CAST(ABS(noise_micro) AS BIGINT) AS abs_err_micro
       |FROM rel ORDER BY event_type""".stripMargin

  /** Poisson-bootstrap confidence interval for the mean order value
    * (Efron, Ann. Stat. 1979; the POISSONIZED per-row form — Chamandy et
    * al., "Estimating uncertainty for massive data streams", Google TR
    * 2012 — which is THE distributed bootstrap: no replica needs to see
    * the whole dataset, each row independently draws a Poisson(1)
    * multiplicity per replica, so the resample is one explode + one
    * map-side-combined aggregate). B = 32 replicas; the md5-uniform draw
    * inverts the Poisson(1) CDF through integer THRESHOLD LITERALS
    * (floor(2^24·cdf(k)) for k ≤ 5, tail collapsed to 6 — both engines
    * compare the same integers, no float CDF at query time); replica
    * means are non-negative integer division (exact both engines); the
    * 90% CI reads the 2nd and 31st order statistics of the 32 replica
    * means.
    *
    * 100 TB shape: one scan exploded ×B, map-side combined into B groups
    * (partial aggregation makes the explode a row-count multiplier, not
    * a shuffle multiplier); the CI window runs over B = 32 rows. The
    * true mean joins as one more single-row branch of the same scan
    * family (documented second scan — the bootstrap's own pass never
    * re-reads the corpus per replica, which is the whole point of
    * poissonization).
    */
  private def bootstrapSql(bseq: String, md5ub: String, intDiv: String) =
    s"""WITH v AS (SELECT o_orderkey,
       |                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |          FROM orders),
       |bseq AS ($bseq),
       |rep AS (SELECT v.o_orderkey, v.cents, b.b, $md5ub AS u
       |        FROM v CROSS JOIN bseq b),
       |w AS (SELECT b, cents,
       |             CASE WHEN u < 6171992 THEN 0
       |                  WHEN u < 12343985 THEN 1
       |                  WHEN u < 15429982 THEN 2
       |                  WHEN u < 16458647 THEN 3
       |                  WHEN u < 16715813 THEN 4
       |                  WHEN u < 16767247 THEN 5
       |                  ELSE 6 END AS wt
       |      FROM rep),
       |rm AS (SELECT b, CAST(SUM(wt * cents) AS BIGINT) AS s,
       |              CAST(SUM(wt) AS BIGINT) AS n
       |       FROM w GROUP BY b),
       |mu AS (SELECT b, s $intDiv GREATEST(1, n) AS m FROM rm),
       |rk AS (SELECT m, row_number() OVER (ORDER BY m, b) AS r FROM mu),
       |ci AS (SELECT MAX(CASE WHEN r = 2 THEN m END) AS lo,
       |              MAX(CASE WHEN r = 31 THEN m END) AS hi FROM rk),
       |tru AS (SELECT CAST(SUM(cents) AS BIGINT) $intDiv COUNT(*) AS m, COUNT(*) AS nn FROM v)
       |SELECT CAST(32 AS INT) AS n_replicas,
       |       CAST(tru.nn AS BIGINT) AS n_orders,
       |       CAST(tru.m AS BIGINT) AS mean_cents,
       |       CAST(ci.lo AS BIGINT) AS ci_lo_cents,
       |       CAST(ci.hi AS BIGINT) AS ci_hi_cents
       |FROM ci CROSS JOIN tru""".stripMargin

  /** Benford first-digit audit (Newcomb 1881 / Benford 1938; Nigrini's
    * fraud-audit use): the leading-digit distribution of order values
    * against the log₁₀(1+1/d) law, with the chi-squared distance as the
    * headline number. A conforming column (organic multi-scale amounts)
    * hugs the law; generated/capped/rounded data — like this synthetic
    * fixture — deviates LOUDLY, which is precisely what the audit is for
    * (detecting fabricated or truncated value columns before they enter
    * training features).
    *
    * Determinism: the first digit reads off the integer-cents STRING
    * (identical rendering of BIGINT in both engines); expected
    * probabilities are integer micro LITERALS (floor(10⁶·log₁₀(1+1/d)) —
    * no log at query time); expected counts quantize to integer
    * milli-counts by non-negative integer division; each chi² term is
    * FLOOR-quantized to integer micro before the 9-row sum (a double sum
    * would be fold-order-dependent). One scan, 9-group map-side-combined
    * aggregate, 9-row window. The squared milli-residual stays inside
    * BIGINT to n ≈ 3·10⁹ rows; past that the audit runs on digit SHARES
    * (divide counts by n first) — same plan, one extra division.
    */
  private def benfordSql(intDiv: String) =
    s"""WITH v AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |          FROM orders WHERE o_totalprice > 0),
       |fd AS (SELECT CAST(substr(CAST(cents AS ${if (intDiv == "DIV") "STRING" else "VARCHAR"}), 1, 1) AS INT) AS digit
       |       FROM v),
       |ob AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM fd GROUP BY digit),
       |bp AS (SELECT d.digit, d.p_micro, COALESCE(ob.n_obs, 0) AS n_obs,
       |              SUM(COALESCE(ob.n_obs, 0)) OVER () AS n
       |       FROM (SELECT 1 AS digit, 301029 AS p_micro UNION ALL
       |             SELECT 2, 176091 UNION ALL SELECT 3, 124938 UNION ALL
       |             SELECT 4, 96910 UNION ALL SELECT 5, 79181 UNION ALL
       |             SELECT 6, 66946 UNION ALL SELECT 7, 57991 UNION ALL
       |             SELECT 8, 51152 UNION ALL SELECT 9, 45757) d
       |       LEFT JOIN ob ON d.digit = ob.digit),
       |ex AS (SELECT digit, n_obs, n,
       |              GREATEST(CAST(1 AS BIGINT),
       |                CAST((n * p_micro) $intDiv 1000 AS BIGINT)) AS exp_milli
       |       FROM bp),
       |tm AS (SELECT digit, n_obs, exp_milli,
       |              CAST(FLOOR(CAST((n_obs * 1000 - exp_milli) * (n_obs * 1000 - exp_milli) AS DOUBLE)
       |                         / (CAST(exp_milli AS DOUBLE) * 1.0E3) * 1.0E6 + 0.5E0) AS BIGINT) AS t_micro
       |       FROM ex)
       |SELECT CAST(digit AS INT) AS digit, n_obs, exp_milli,
       |       CAST(SUM(t_micro) OVER () AS BIGINT) AS chi2_micro
       |FROM tm ORDER BY digit""".stripMargin

  /** Binned two-sample Kolmogorov-Smirnov test between the click and
    * purchase value distributions (Kolmogorov 1933 / Smirnov 1948; the
    * binned form every streaming/distributed implementation uses): D =
    * max over bins |F₁ − F₂| with both CDFs read off one shared 64-bin
    * histogram (the q_stream_drift_alert bucket quantization — same
    * 800-cent bins, so the two monitors agree on what a "bin" is). The
    * decision column compares against the large-sample α = 0.05 critical
    * value 1.358·√((n₁+n₂)/(n₁·n₂)).
    *
    * Determinism: D's numerator max|cum₁·n₂ − cum₂·n₁| is EXACT BIGINT
    * (cross-multiplied CDFs — no float division under the max), safe to
    * ~3·10⁹ rows per side (the Benford rescale note); only the final
    * display division and the critical value (one IEEE sqrt on exact
    * integers, shared text) touch doubles. One scan, 64-group map-side
    * aggregate, 64-row spine windows.
    */
  private def ksTestSql(spine: String, intDiv: String) =
    s"""WITH e AS (SELECT event_type,
       |                 LEAST(63, GREATEST(0, CAST(FLOOR(FLOOR(value * 100 + 0.5) / 800) AS BIGINT))) AS b
       |          FROM events WHERE event_type IN ('click', 'purchase')),
       |h AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY event_type, b),
       |gb AS (SELECT $spine AS b),
       |f AS (SELECT gb.b,
       |             COALESCE(h1.c, 0) AS c1, COALESCE(h2.c, 0) AS c2
       |      FROM gb LEFT JOIN h h1 ON gb.b = h1.b AND h1.event_type = 'click'
       |              LEFT JOIN h h2 ON gb.b = h2.b AND h2.event_type = 'purchase'),
       |cf AS (SELECT b,
       |              CAST(SUM(c1) OVER (ORDER BY b
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum1,
       |              CAST(SUM(c2) OVER (ORDER BY b
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
       |              CAST(SUM(c1) OVER () AS BIGINT) AS n1,
       |              CAST(SUM(c2) OVER () AS BIGINT) AS n2
       |       FROM f),
       |agg AS (SELECT MAX(ABS(cum1 * n2 - cum2 * n1)) AS dnum,
       |               MAX(n1) AS n1, MAX(n2) AS n2
       |        FROM cf)
       |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |       CAST((1000000 * dnum) $intDiv (n1 * n2) AS BIGINT) AS ks_micro,
       |       CAST(FLOOR(1.358E0 * SQRT(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) * 1.0E6 + 0.5E0) AS BIGINT) AS crit05_micro,
       |       CAST(CASE WHEN (1000000 * dnum) $intDiv (n1 * n2) >
       |                      FLOOR(1.358E0 * SQRT(CAST(n1 + n2 AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)) * 1.0E6 + 0.5E0)
       |                 THEN 1 ELSE 0 END AS INT) AS reject_05
       |FROM agg""".stripMargin

  /** Binned two-sample Mann-Whitney U (rank-sum) test between the click
    * and purchase value distributions — the nonparametric location test
    * that pairs with q_stats_ks_test's shape test over the SAME 64-bin
    * histogram (so the two monitors agree on the binning): U counts
    * cross-group "wins" with half-credit ties, the normal approximation
    * applies the standard tie correction var = n₁n₂/12·((n+1) −
    * Σ(t³−t)/(n(n−1))) (Mann & Whitney, Ann. Math. Stat. 1947; the
    * binned/grouped-tie form is the textbook large-sample treatment).
    *
    * Determinism: 2U = Σ_b c1·(2·cum2 − c2) is EXACT BIGINT (the ½-tie
    * credit is absorbed by carrying 2U), as are the centered numerator
    * A = 2U − n₁n₂ and the tie-corrected factor S = (n+1)n(n−1) − Σ(t³−t);
    * only the display z and common-language effect size U/(n₁n₂) divide,
    * as one shared double text over exact integers. t³ stays inside
    * BIGINT to ~2×10⁶ rows per bin (fixture max ~4×10⁴; the doc'd
    * rescale past that is counts→milli-shares, the q_cluster_purity
    * note). One scan, 64-group map-side aggregate, 64-row spine windows.
    */
  private def mannWhitneySql(spine: String): String =
    s"""WITH e AS (SELECT event_type,
       |                 LEAST(63, GREATEST(0, CAST(FLOOR(FLOOR(value * 100 + 0.5) / 800) AS BIGINT))) AS b
       |          FROM events WHERE event_type IN ('click', 'purchase')),
       |h AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY event_type, b),
       |gb AS (SELECT $spine AS b),
       |f AS (SELECT gb.b,
       |             COALESCE(h1.c, 0) AS c1, COALESCE(h2.c, 0) AS c2
       |      FROM gb LEFT JOIN h h1 ON gb.b = h1.b AND h1.event_type = 'click'
       |              LEFT JOIN h h2 ON gb.b = h2.b AND h2.event_type = 'purchase'),
       |cf AS (SELECT b, c1, c2,
       |              CAST(SUM(c2) OVER (ORDER BY b
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum2,
       |              CAST(SUM(c1) OVER () AS BIGINT) AS n1,
       |              CAST(SUM(c2) OVER () AS BIGINT) AS n2
       |       FROM f),
       |agg AS (SELECT CAST(SUM(c1 * (2 * cum2 - c2)) AS BIGINT) AS u2,
       |               CAST(SUM((c1 + c2) * (c1 + c2) * (c1 + c2) - (c1 + c2)) AS BIGINT) AS ties,
       |               MAX(n1) AS n1, MAX(n2) AS n2, MAX(n1) + MAX(n2) AS n
       |        FROM cf),
       |st AS (SELECT n1, n2, n, u2, ties,
       |              u2 - n1 * n2 AS a2,
       |              GREATEST(CAST(1 AS BIGINT), (n + 1) * n * (n - 1) - ties) AS s
       |       FROM agg)
       |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |       CAST(u2 AS BIGINT) AS u_times2, CAST(ties AS BIGINT) AS tie_cubes,
       |       CAST(a2 AS DOUBLE) / (2.0E0 * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       |         * CAST(s AS DOUBLE) / (12.0E0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))) AS z,
       |       CAST(u2 AS DOUBLE) / (2.0E0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS cles,
       |       CAST(CASE WHEN ABS(CAST(a2 AS DOUBLE) / (2.0E0 * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
       |         * CAST(s AS DOUBLE) / (12.0E0 * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))) > 1.96E0
       |                 THEN 1 ELSE 0 END AS INT) AS reject_05
       |FROM st""".stripMargin

  /** RFM customer segmentation (Hughes, "Strategic Database Marketing"
    * 1994 — the classic recency/frequency/monetary quintile scoring):
    * each customer's days-since-last-order, order count, and lifetime
    * spend are independently quintile-scored 1–5 (5 = most recent / most
    * frequent / highest spend) and customers roll up into the ≤125
    * (r,f,m) segments a marketing warehouse reports on.
    *
    * Quintiles WITHOUT a global sort: each metric's exact global rank
    * rides the value-binned hierarchical-rank idiom (q_stats_quantile_merge,
    * round-8 verdict #5) — per-bin counts map-side combine, bin offsets
    * come from a tiny bin-table self-join (recency days DIV 64 and spend
    * cents DIV 2²⁰ are DOMAIN-bounded; frequency is its own bin), and
    * every rank window is PARTITION BY bin. Global rank = bin offset +
    * within-bin rank (bin is a prefix of the sort key), quintile =
    * (rank−1)·5 DIV n + 1 — pure integer arithmetic, ties broken on
    * custkey, identical in both engines. 100 TB shape: one orders
    * groupBy(custkey), three co-partitioned equi-joins back on ck, a
    * 125-group final aggregate; no unpartitioned window anywhere.
    */
  private def rfmSql(dayDiff: (String, String) => String, intDiv: String): String =
    s"""WITH co AS (SELECT o_custkey AS ck,
       |                  MAX(CAST(o_orderdate AS DATE)) AS last_d,
       |                  CAST(COUNT(*) AS BIGINT) AS f,
       |                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |           FROM orders GROUP BY o_custkey),
       |anch AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS ad FROM orders),
       |base AS (SELECT ck, CAST(${dayDiff("anch.ad", "co.last_d")} AS BIGINT) AS rdays, f, cents
       |         FROM co CROSS JOIN anch),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
       |rb AS (SELECT ck, rdays, rdays $intDiv 64 AS bin FROM base),
       |rbc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM rb GROUP BY bin),
       |rbo AS (SELECT a.bin, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS off
       |        FROM rbc a LEFT JOIN rbc b ON b.bin < a.bin GROUP BY a.bin),
       |rr AS (SELECT rb.ck, ro.off + row_number() OVER (PARTITION BY rb.bin
       |                                                 ORDER BY rb.rdays, rb.ck) AS rnk
       |       FROM rb JOIN rbo ro ON rb.bin = ro.bin),
       |fc AS (SELECT f AS bin, CAST(COUNT(*) AS BIGINT) AS c FROM base GROUP BY f),
       |fo AS (SELECT a.bin, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS off
       |       FROM fc a LEFT JOIN fc b ON b.bin < a.bin GROUP BY a.bin),
       |fr AS (SELECT b.ck, fo.off + row_number() OVER (PARTITION BY b.f
       |                                                ORDER BY b.ck) AS rnk
       |       FROM base b JOIN fo ON b.f = fo.bin),
       |mb AS (SELECT ck, cents, cents $intDiv 1048576 AS bin FROM base),
       |mc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM mb GROUP BY bin),
       |mo AS (SELECT a.bin, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS off
       |       FROM mc a LEFT JOIN mc b ON b.bin < a.bin GROUP BY a.bin),
       |mr AS (SELECT mb.ck, mo.off + row_number() OVER (PARTITION BY mb.bin
       |                                                 ORDER BY mb.cents, mb.ck) AS rnk
       |       FROM mb JOIN mo ON mb.bin = mo.bin),
       |sc AS (SELECT b.ck, b.cents,
       |              CAST(6 - (((r.rnk - 1) * 5) $intDiv nt.n + 1) AS INT) AS r_score,
       |              CAST(((f2.rnk - 1) * 5) $intDiv nt.n + 1 AS INT) AS f_score,
       |              CAST(((m2.rnk - 1) * 5) $intDiv nt.n + 1 AS INT) AS m_score
       |       FROM base b JOIN rr r ON b.ck = r.ck
       |                   JOIN fr f2 ON b.ck = f2.ck
       |                   JOIN mr m2 ON b.ck = m2.ck
       |       CROSS JOIN nt)
       |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment,
       |       CAST(COUNT(*) AS BIGINT) AS n_customers,
       |       CAST(SUM(cents) AS BIGINT) AS monetary_cents,
       |       CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS avg_cents
       |FROM sc GROUP BY r_score, f_score, m_score ORDER BY segment""".stripMargin

  /** Gini concentration coefficient + 10-point Lorenz curve of customer
    * lifetime spend (Gini 1912; Lorenz 1905) — the revenue-concentration
    * readout every warehouse reports ("what share of revenue do the
    * bottom d deciles hold"); for a training-data warehouse the same
    * query over per-source token counts is the corpus-balance audit.
    *
    * Exact everywhere except two display divisions: ranks over spend
    * come from the value-binned hierarchical-rank idiom (q_events_rfm —
    * per-bin counts + offsets, windows PARTITION BY bin only), the
    * rank-weighted spend sum Σ i·xᵢ and the cumulative spend at each
    * decile boundary fold as BIGINTs (per-bin spend offsets + within-bin
    * running sums, same shape), and G = (2·Σ i·xᵢ − (n+1)·Σx)/(n·Σx)
    * ships its exact numerator alongside the double quotient. Σ i·xᵢ
    * stays in BIGINT to ~10⁹ customers at 10⁶-cent mean spend; past that
    * the doc'd rescale is cents→dollar-milli. The decile probe is a
    * 10-row equi-join on the exact global rank.
    */
  private def giniSql(spine: String, intDiv: String): String =
    s"""WITH cu AS (SELECT o_custkey AS ck,
       |                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
       |           FROM orders GROUP BY o_custkey),
       |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS tot FROM cu),
       |mb AS (SELECT ck, cents, cents $intDiv 1048576 AS bin FROM cu),
       |mc AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(cents) AS BIGINT) AS sc
       |       FROM mb GROUP BY bin),
       |mo AS (SELECT a.bin, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS off,
       |              CAST(COALESCE(SUM(b.sc), 0) AS BIGINT) AS soff
       |       FROM mc a LEFT JOIN mc b ON b.bin < a.bin GROUP BY a.bin),
       |mr AS (SELECT mb.ck, mb.cents,
       |              mo.off + row_number() OVER (PARTITION BY mb.bin
       |                                          ORDER BY mb.cents, mb.ck) AS rnk,
       |              mo.soff + SUM(mb.cents) OVER (PARTITION BY mb.bin
       |                                            ORDER BY mb.cents, mb.ck
       |                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
       |       FROM mb JOIN mo ON mb.bin = mo.bin),
       |gs AS (SELECT CAST(SUM(rnk * cents) AS BIGINT) AS s1 FROM mr),
       |gn AS (SELECT gs.s1, nt.n, nt.tot,
       |              CAST(2 * gs.s1 - (nt.n + 1) * nt.tot AS BIGINT) AS gnum
       |       FROM gs CROSS JOIN nt),
       |dec AS (SELECT $spine AS d),
       |dr AS (SELECT dec.d, (nt.n * dec.d) $intDiv 10 AS rd FROM dec CROSS JOIN nt)
       |SELECT CAST(dr.d AS INT) AS decile, CAST(dr.rd AS BIGINT) AS rank_at,
       |       CAST(mr.cum_cents AS BIGINT) AS cum_cents,
       |       CAST(mr.cum_cents AS DOUBLE) / CAST(gn.tot AS DOUBLE) AS lorenz_share,
       |       gn.gnum AS gini_num, CAST(gn.n AS BIGINT) AS n_cust,
       |       CAST(gn.tot AS BIGINT) AS total_cents,
       |       CAST(gn.gnum AS DOUBLE) / (CAST(gn.n AS DOUBLE) * CAST(gn.tot AS DOUBLE)) AS gini
       |FROM dr JOIN mr ON mr.rnk = dr.rd CROSS JOIN gn ORDER BY decile""".stripMargin

  /** Cohort lifetime-value matrix — the acquisition-month × age revenue
    * triangle a subscription/commerce warehouse plots as its core
    * retention economics (the q_events_retention shape, but accumulating
    * REVENUE instead of counting active users): cohort = month of the
    * customer's first order, age = months since, LTV(cohort, age) =
    * cumulative revenue per cohort member.
    *
    * All-integer: months are y·12+m ordinals, revenue is exact cents,
    * the cumulative sum is a window PARTITIONED BY cohort over ≤ the
    * calendar-bounded month count (the dense-hourly-series contract —
    * ages per cohort are bounded by the calendar, not by N), and the
    * per-member LTV ships as a full-precision quotient of exact
    * integers. Shape: one orders scan + one first-order aggregate on
    * custkey, one equi-join back on custkey, (cohort, age)-bounded rows
    * after.
    */
  private def cohortLtvSql(intDiv: String): String =
    s"""WITH om AS (SELECT o_custkey AS ck,
       |                  CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS BIGINT) AS m,
       |                  CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
       |           FROM orders),
       |co AS (SELECT ck, CAST(MIN(m) AS BIGINT) AS cm FROM om GROUP BY ck),
       |cs AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM co GROUP BY cm),
       |rev AS (SELECT co.cm, om.m - co.cm AS age, CAST(SUM(om.cents) AS BIGINT) AS rev
       |        FROM om JOIN co ON om.ck = co.ck GROUP BY co.cm, om.m - co.cm),
       |cum AS (SELECT cm, age, rev,
       |               CAST(SUM(rev) OVER (PARTITION BY cm ORDER BY age
       |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
       |        FROM rev)
       |SELECT CAST((c.cm $intDiv 12) * 100 + (c.cm % 12) + 1 AS INT) AS cohort_yyyymm,
       |       CAST(c.age AS INT) AS age_months,
       |       cs.cohort_n, c.rev AS rev_cents, c.cum_cents,
       |       CAST(c.cum_cents AS DOUBLE) / CAST(cs.cohort_n AS DOUBLE) AS ltv_cents
       |FROM cum c JOIN cs ON c.cm = cs.cm
       |ORDER BY cohort_yyyymm, age_months""".stripMargin

  private def kAnonSql(epochUs: String, intDiv: String) = {
    def dv(a: String, b: String) = s"$a $intDiv $b"
    s"""WITH e AS (SELECT event_type,
       |                 CAST(CAST(FLOOR($epochUs / 3600000000) AS BIGINT) % 24 AS INT) AS hh,
       |                 ${dv("CAST(FLOOR(value) AS BIGINT)", "10")} AS v10,
       |                 ${dv("CAST(FLOOR(value) AS BIGINT)", "100")} AS v100
       |          FROM events),
       |g1 AS (SELECT event_type, hh, v10, COUNT(*) AS n FROM e GROUP BY event_type, hh, v10),
       |u AS (SELECT e.event_type, e.hh, e.v100
       |      FROM e JOIN g1 ON e.event_type = g1.event_type AND e.hh = g1.hh AND e.v10 = g1.v10
       |      WHERE g1.n < 5),
       |g2 AS (SELECT event_type, hh, v100, COUNT(*) AS n FROM u GROUP BY event_type, hh, v100),
       |lv AS (SELECT e.event_type,
       |              CASE WHEN g1.n >= 5 THEN 1 WHEN g2.n >= 5 THEN 2 ELSE 3 END AS lvl
       |       FROM e JOIN g1 ON e.event_type = g1.event_type AND e.hh = g1.hh AND e.v10 = g1.v10
       |       LEFT JOIN g2 ON e.event_type = g2.event_type AND e.hh = g2.hh AND e.v100 = g2.v100)
       |SELECT event_type, CAST(lvl AS INT) AS level, COUNT(*) AS n_rows
       |FROM lv GROUP BY event_type, lvl
       |ORDER BY event_type, level""".stripMargin
  }

  /** Small-file compaction planning (the OPTIMIZE/bin-packing maintenance
    * pass every lakehouse runs): treat each document as a data file of
    * n_chars bytes, plan target-size (4096-byte) output bins PER
    * PARTITION (source) by the deterministic sorted-fill rule — order
    * files largest-first within the partition, running byte sum, bin id =
    * prefix DIV target. Sorted fill is the parallel-friendly next-fit-
    * decreasing: one window per partition key (never a global sort — the
    * q_text_ppl_bucket shuffle discipline), bin count within NFD's 2x
    * optimum bound, and the output is the manifest a rewrite job executes.
    * Reported per bin: file count, bytes, fill vs target in bp.
    */
  private def compactionSql(intDiv: String) =
    s"""WITH f AS (SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes FROM documents),
       |r AS (SELECT source, doc_id, bytes,
       |             SUM(bytes) OVER (PARTITION BY source ORDER BY bytes DESC, doc_id
       |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM f),
       |b AS (SELECT source, doc_id, bytes, (cum - 1) $intDiv 4096 AS bin FROM r)
       |SELECT source, CAST(bin AS BIGINT) AS bin, COUNT(*) AS n_files,
       |       CAST(SUM(bytes) AS BIGINT) AS bytes,
       |       CAST(FLOOR(CAST(SUM(bytes) AS DOUBLE) * 10000 / 4096 + 0.5) AS BIGINT) AS fill_bp
       |FROM b GROUP BY source, bin
       |ORDER BY source, bin""".stripMargin

  /** ANALYZE-style column statistics (the CBO inputs every at-scale
    * deployment maintains: Spark's `ANALYZE TABLE … COMPUTE STATISTICS FOR
    * COLUMNS`, the stats behind broadcast-vs-shuffle join choices and
    * `spark.sql.autoBroadcastJoinThreshold`): per column — row count, null
    * count, EXACT distinct count, min/max, and average width. Shaped as
    * ONE scan unpivoted to a (column, value) stream and the repo's
    * two-phase exact-distinct discipline (group by (col, value) first —
    * high cardinality, even shuffle; then a C-row rollup), instead of C
    * per-column COUNT(DISTINCT) funnels. Integer columns are zero-padded
    * to fixed width so min/max are numeric order AND plain string
    * comparisons (engine-identical); doubles/timestamps are profiled by a
    * real deployment too but excluded here because their string rendering
    * is engine-specific (the determinism contract, not a capability gap).
    */
  private def colProfileSql(unpivot: String): String =
    s"""WITH v AS ($unpivot),
       |c AS (SELECT col_name, val, COUNT(*) AS c FROM v GROUP BY col_name, val),
       |p AS (SELECT col_name,
       |             CAST(SUM(c) AS BIGINT) AS n_rows,
       |             CAST(SUM(CASE WHEN val IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_null,
       |             CAST(COUNT(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS ndv,
       |             MIN(val) AS min_val, MAX(val) AS max_val,
       |             CAST(FLOOR(CAST(SUM(CASE WHEN val IS NOT NULL THEN CAST(LENGTH(val) AS BIGINT) * c ELSE 0 END) AS DOUBLE)
       |                        * 100 / NULLIF(SUM(CASE WHEN val IS NOT NULL THEN c ELSE 0 END), 0)
       |                        + 0.5E0) AS BIGINT) AS avg_len_centi
       |      FROM c GROUP BY col_name)
       |SELECT col_name, n_rows, n_null, ndv, min_val, max_val, avg_len_centi
       |FROM p ORDER BY col_name""".stripMargin

  private val colProfileSpark = colProfileSql(
    """SELECT col_name, val FROM orders
      |       LATERAL VIEW stack(4,
      |         'o_orderkey', lpad(CAST(o_orderkey AS STRING), 12, '0'),
      |         'o_custkey', lpad(CAST(o_custkey AS STRING), 12, '0'),
      |         'o_orderstatus', o_orderstatus,
      |         'o_orderpriority', o_orderpriority) s AS col_name, val""".stripMargin)

  private val colProfileDuck = colProfileSql(
    """SELECT 'o_orderkey' AS col_name, lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS val FROM orders
      |       UNION ALL
      |       SELECT 'o_custkey', lpad(CAST(o_custkey AS VARCHAR), 12, '0') FROM orders
      |       UNION ALL
      |       SELECT 'o_orderstatus', o_orderstatus FROM orders
      |       UNION ALL
      |       SELECT 'o_orderpriority', o_orderpriority FROM orders""".stripMargin)

  /** Clustering-depth audit (the OPTIMIZE/Z-ORDER payoff diagnostic Delta
    * and Iceberg maintenance report): how many files OVERLAP on the query
    * predicate column. A predicate on l_shipdate must open every file
    * whose [min, max] shipdate interval covers it, so overlap depth =
    * files-per-point = the scan amplification data skipping cannot save.
    * Compares two layouts of the same rows: files written in INGEST order
    * (orderkey batches — each file spans almost the whole date range,
    * depth ≈ file count) vs files CLUSTERED on shipdate (30-day ranges —
    * depth ≈ 1). Depth comes from the classic boundary sweep: ±1 events
    * at each file's min/max day, one running-sum window PER LAYOUT over
    * the 2F-row manifest (never the data), starts ordered before ends at
    * the same day so touching files count as overlapping. Determinism:
    * integer day stats; within equal (day, delta) ties the prefix-sum
    * multiset at start rows is permutation-invariant, so AVG/MAX are
    * engine-exact; the mean is an integer-sum division, never a float
    * fold. 100 TB: the per-file min/max aggregate is the only data pass
    * (map-side combined, F groups); the sweep is manifest-sized.
    */
  private def clusterDepthSql(dayExpr: String, intDiv: String): String =
    s"""WITH rows0 AS (SELECT l_orderkey, $dayExpr AS day FROM lineitem),
       |fr AS (SELECT 'ingest' AS layout, l_orderkey $intDiv 128 AS fid, day FROM rows0
       |       UNION ALL
       |       SELECT 'clustered' AS layout, day $intDiv 30 AS fid, day FROM rows0),
       |f AS (SELECT layout, fid, MIN(day) AS mn, MAX(day) AS mx, COUNT(*) AS n_rows
       |      FROM fr GROUP BY layout, fid),
       |ev AS (SELECT layout, mn AS d, 1 AS delta FROM f
       |       UNION ALL
       |       SELECT layout, mx AS d, -1 AS delta FROM f),
       |sw AS (SELECT layout, d, delta,
       |              SUM(delta) OVER (PARTITION BY layout ORDER BY d, delta DESC
       |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
       |       FROM ev),
       |dep AS (SELECT layout, CAST(MAX(depth) AS BIGINT) AS max_depth,
       |               CAST(FLOOR(CAST(SUM(CASE WHEN delta = 1 THEN depth ELSE 0 END) AS DOUBLE) * 100
       |                          / SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) + 0.5E0) AS BIGINT) AS avg_depth_centi
       |        FROM sw GROUP BY layout),
       |fc AS (SELECT layout, COUNT(*) AS n_files,
       |              CAST(MIN(mx - mn) AS BIGINT) AS min_span_days,
       |              CAST(MAX(mx - mn) AS BIGINT) AS max_span_days
       |       FROM f GROUP BY layout)
       |SELECT fc.layout, CAST(fc.n_files AS BIGINT) AS n_files,
       |       fc.min_span_days, fc.max_span_days, dep.max_depth, dep.avg_depth_centi
       |FROM fc JOIN dep ON fc.layout = dep.layout
       |ORDER BY fc.layout""".stripMargin

  /** KMV (k-minimum-values) distinct sketch with lossless MERGE — the
    * other half of the sketch toolbox next to q_agg_hll_merge's HLL: keep
    * the k = 128 smallest 48-bit hashes per group; estimate distinct count
    * as (k−1)·2^48 / h_(k) (Bar-Yossef et al., RANDOM 2002), exact when
    * the group holds fewer than k distinct values. The union sketch is
    * just the k smallest of the concatenated per-group minima — no rescan
    * of the raw data, which is why a 100 TB deployment stores per-partition
    * sketches and answers cross-partition distinct queries from ~2 KiB
    * rollups. Every step is integer (md5-derived hashes, window row_number,
    * one BIGINT division), so both engines agree exactly; the accuracy
    * check against the exact distinct count is part of the output
    * (err_bp = |est − exact|·10⁴/exact).
    *
    * Round-9 two-phase top-k (round-8 verdict #4): a single
    * `PARTITION BY grp` window funnels EVERY distinct (grp, key) row into
    * one reducer per group — a skew-killer when the group domain is tiny
    * (T≈5 here). Phase 1 ranks within (grp, h % 16) shards — 16 parallel
    * reducers per group, each keeping its local top-128 — and phase 2
    * merges the ≤ 16·128 shard minima per group. Lossless: any global
    * top-128 row is in its shard's top-128. The distinct count moves to a
    * map-side-combined GROUP BY (it was the same one-reducer window).
    */
  private def kmvSketchSql(hash: String, intDiv: String): String =
    s"""WITH dv AS (SELECT DISTINCT o_orderpriority AS grp, o_custkey AS v FROM orders),
       |hx AS (SELECT grp, v, $hash AS h FROM dv),
       |cnt AS (SELECT grp, COUNT(*) AS nd FROM hx GROUP BY grp),
       |r1 AS (SELECT grp, h, v,
       |              row_number() OVER (PARTITION BY grp, h % 16
       |                                 ORDER BY h, v) AS srn
       |       FROM hx),
       |t1 AS (SELECT grp, h, v FROM r1 WHERE srn <= 128),
       |rk AS (SELECT grp, h,
       |              row_number() OVER (PARTITION BY grp ORDER BY h, v) AS rn
       |       FROM t1),
       |kth AS (SELECT rk.grp AS grp,
       |               MAX(CASE WHEN rn = 128 THEN h ELSE 0 END) AS hk,
       |               MAX(cnt.nd) AS nd
       |        FROM rk JOIN cnt ON rk.grp = cnt.grp
       |        WHERE rn <= 128 GROUP BY rk.grp),
       |est AS (SELECT grp, nd,
       |               CASE WHEN nd < 128 THEN nd
       |                    ELSE 127 * 281474976710656 $intDiv hk END AS kmv_nd
       |        FROM kth),
       |mgd AS (SELECT DISTINCT h FROM rk WHERE rn <= 128),
       |mgr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM mgd),
       |mk AS (SELECT MAX(CASE WHEN rn = 128 THEN h ELSE 0 END) AS hk, COUNT(*) AS nh
       |       FROM mgr WHERE rn <= 128),
       |ax AS (SELECT COUNT(DISTINCT o_custkey) AS nd FROM orders),
       |mest AS (SELECT ax.nd,
       |                CASE WHEN mk.nh < 128 THEN mk.nh
       |                     ELSE 127 * 281474976710656 $intDiv mk.hk END AS kmv_nd
       |         FROM mk CROSS JOIN ax)
       |SELECT grp, CAST(nd AS BIGINT) AS exact_nd, CAST(kmv_nd AS BIGINT) AS kmv_nd,
       |       CAST(abs(kmv_nd - nd) * 10000 $intDiv nd AS BIGINT) AS err_bp
       |FROM est
       |UNION ALL
       |SELECT 'ALL_MERGED' AS grp, CAST(nd AS BIGINT) AS exact_nd,
       |       CAST(kmv_nd AS BIGINT) AS kmv_nd,
       |       CAST(abs(kmv_nd - nd) * 10000 $intDiv nd AS BIGINT) AS err_bp
       |FROM mest
       |ORDER BY grp""".stripMargin

  /** MERGE INTO (CDC upsert apply) semantics as one declarative pass: the
    * base dimension (customer balances) full-outer-joins the day's change
    * set (per-customer urgent-order totals, with a deterministic slice of
    * keys shifted past the key domain to exercise the NOT MATCHED branch);
    * WHEN MATCHED → UPDATE (balance += delta), WHEN NOT MATCHED BY SOURCE →
    * KEEP, WHEN NOT MATCHED BY TARGET → INSERT. This is the exact plan
    * Delta/Iceberg MERGE lowers to — at 100 TB it is ONE shuffle join on
    * the dimension key (or an exchange-free sort-merge when both sides are
    * bucketed on k, the q_src_bucketed_join layout), never a per-row
    * driver loop. Money rides integer cents quantized per row BEFORE the
    * sum, so the fold is exact in any order; the `% 13` slice only bounds
    * the dumped output.
    *
    * The synthetic NOT-MATCHED keys shift by MAX(c_custkey)+1 DERIVED
    * FROM THE DATA (round-8 advice: a fixed +1000012 shift silently
    * collides with real customers once the fixture outgrows ~sf7, turning
    * intended INSERTs into wrong-row UPDATEs). The scalar-subquery max is
    * a one-row broadcast — free at any scale.
    */
  private val mergeUpsert =
    """WITH base AS (SELECT c_custkey AS k,
      |                    CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
      |             FROM customer),
      |delta AS (SELECT CASE WHEN o_custkey % 11 = 5
      |                      THEN o_custkey + (SELECT MAX(c_custkey) + 1 FROM customer)
      |                      ELSE o_custkey END AS k,
      |                 SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS d_c,
      |                 COUNT(*) AS n_ch
      |          FROM orders WHERE o_orderpriority = '1-URGENT'
      |          GROUP BY 1),
      |m AS (SELECT COALESCE(b.k, u.k) AS k,
      |             CASE WHEN b.k IS NULL THEN 'INSERT'
      |                  WHEN u.k IS NULL THEN 'KEEP'
      |                  ELSE 'UPDATE' END AS action,
      |             COALESCE(b.bal_c, 0) + COALESCE(u.d_c, 0) AS new_bal_c,
      |             COALESCE(u.n_ch, 0) AS n_changes
      |      FROM base b FULL JOIN delta u ON b.k = u.k)
      |SELECT k, action, CAST(new_bal_c AS BIGINT) AS new_bal_c,
      |       CAST(n_changes AS BIGINT) AS n_changes
      |FROM m WHERE k % 13 = 0 ORDER BY k""".stripMargin

  /** Point-in-time (temporal) join: enrich each shipment fact with the
    * customer-status dimension version that was CURRENT at ship time —
    * the AS OF lookup every warehouse needs once a dimension is SCD2
    * (Kimball's type-2 fact enrichment). Consumes the exact [[scdChain]]
    * the q_dim_scd2 operator publishes, so the two operators are provably
    * consistent.
    *
    * 100 TB shape: fact→orders is a key equi-join; fact→dimension is a
    * key EQUI-join with the validity interval as a residual predicate —
    * per-key version counts are bounded (one row per attribute change),
    * so the residual filters a bounded bucket, never a range nested loop.
    * Versions partition time per key, so each fact matches at most one
    * version and the row count is exactly the fact count (LEFT join keeps
    * pre-history facts with a NULL status). The `% 37` slice only bounds
    * the dumped output.
    */
  private val pitJoin =
    s"""WITH $scdChain,
       |f AS (SELECT l.l_orderkey AS okey, l.l_linenumber AS line,
       |             o.o_custkey AS key, CAST(l.l_shipdate AS DATE) AS ship_date
       |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |      WHERE l.l_orderkey % 37 = 0),
       |pit AS (SELECT f.okey, f.line, f.key, f.ship_date, s.attr, s.valid_from
       |        FROM f LEFT JOIN scd s ON f.key = s.key
       |          AND f.ship_date >= s.valid_from
       |          AND (s.valid_to IS NULL OR f.ship_date < s.valid_to))
       |SELECT okey, line, key, ship_date, attr AS status_asof, valid_from
       |FROM pit ORDER BY okey, line""".stripMargin

  /** Classical seasonal decomposition (trend / seasonal / remainder — the
    * moving-average core of STL without loess) over the hourly event-count
    * series: densify the hour spine with zero fill, take a centered
    * 24-hour moving average as trend, average the detrended values per
    * hour-of-day into the diurnal seasonal profile, and report each
    * profile cell with its remainder extremes.
    *
    * Determinism: the detrended value is kept as the INTEGER
    * 24·count − sum24 (24× the residual — no division until the final
    * per-cell average), and the per-cell average uses the offset trick
    * `(s + n·K) intdiv n − K` (K = 2·10⁹) so the integer division always
    * sees a positive numerator: Spark's DIV truncates toward zero while
    * DuckDB's // floors, and the two only agree on non-negative operands.
    * 100 TB shape: the hourly bin aggregate map-side combines to
    * span-hours rows; the spine explodes from a single global min/max row
    * (no calendar cross join); every window/group after that runs on the
    * BINNED series (span-hours rows, ~9k rows/year — driver-safe tiny),
    * so the single unpartitioned ORDER BY hr window is bounded by the
    * calendar, not the data.
    */
  /** Zero-filled dense hourly event-count series (CTEs e/b/sp/d ending in
    * d(hr, n)) — the shared head of the seasonal / autocorrelation /
    * changepoint family. Density comes from a single global min/max spine
    * row, never a calendar cross join.
    */
  private def hourlyDense(epochUs: String) =
    s"""e AS (SELECT CAST(FLOOR($epochUs / 3600000000) AS BIGINT) AS hr
       |          FROM events),
       |b AS (SELECT hr, COUNT(*) AS n FROM e GROUP BY hr),
       |sp AS (SELECT SPINE_EXPR AS hr
       |       FROM (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM b) z),
       |d AS (SELECT sp.hr, COALESCE(b.n, 0) AS n
       |      FROM sp LEFT JOIN b ON sp.hr = b.hr)""".stripMargin

  private def seasonalSql(epochUs: String, intDiv: String) =
    s"""WITH ${hourlyDense(epochUs)},
       |w AS (SELECT hr, n,
       |             SUM(n) OVER wnd AS s24, COUNT(*) OVER wnd AS n24
       |      FROM d
       |      WINDOW wnd AS (ORDER BY hr ROWS BETWEEN 11 PRECEDING AND 12 FOLLOWING)),
       |t AS (SELECT hr, n, n * 24 - s24 AS det24 FROM w WHERE n24 = 24),
       |hod AS (SELECT hr % 24 AS hod, COUNT(*) AS n_bins, SUM(det24) AS sdet,
       |               MIN(det24) AS mn_det, MAX(det24) AS mx_det
       |        FROM t GROUP BY hr % 24)
       |SELECT CAST(hod AS INT) AS hod, CAST(n_bins AS BIGINT) AS n_bins,
       |       CAST((sdet + n_bins * 2000000000) $intDiv n_bins - 2000000000 AS BIGINT)
       |         AS seasonal_det24,
       |       CAST(mn_det AS BIGINT) AS min_det24, CAST(mx_det AS BIGINT) AS max_det24
       |FROM hod ORDER BY hod""".stripMargin

  /** Sample autocorrelation of the hourly activity series at lags 1, 24
    * and 168 (hour / day / week) — the diagnostic that VALIDATES
    * q_ts_seasonal_decompose's 24-hour period choice before a pipeline
    * commits to it (Box & Jenkins' identification step): a real diurnal
    * cycle shows r(24) ≫ r(1)'s decay, a weekly one lifts r(168).
    *
    * Pearson r over the n−L aligned pairs per lag L, from exact INTEGER
    * moments (Σx, Σy, Σxy, Σx², Σy² on counts — fold-order exact); the
    * final r = cov/√(varx·vary) runs on doubles derived from those
    * integers — identical correctly-rounded op sequence in both engines
    * (the q_ts_anomaly_zscore discipline).
    *
    * 100 TB shape: the lag alignment is an EQUI-join of the dense series
    * to itself on hr+L (3 lag rows × span-hours rows — calendar-bounded,
    * tiny); the only data-sized pass is the hourly bin aggregate.
    */
  private def autocorrSql(epochUs: String, levels: String) =
    s"""WITH ${hourlyDense(epochUs)},
       |lv AS ($levels),
       |pr AS (SELECT lv.l, a.n AS x, b.n AS y
       |       FROM lv JOIN d a ON 1 = 1 JOIN d b ON b.hr = a.hr + lv.l),
       |mo AS (SELECT l, COUNT(*) AS np, SUM(x) AS sx, SUM(y) AS sy,
       |              SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
       |       FROM pr GROUP BY l),
       |r AS (SELECT l, np,
       |             CAST(np * sxy - sx * sy AS DOUBLE) AS cov,
       |             CAST(np * sxx - sx * sx AS DOUBLE) AS vx,
       |             CAST(np * syy - sy * sy AS DOUBLE) AS vy
       |      FROM mo)
       |SELECT CAST(l AS INT) AS lag_h, CAST(np AS BIGINT) AS n_pairs,
       |       CASE WHEN vx > 0 AND vy > 0
       |            THEN cov / SQRT(vx * vy) ELSE CAST(0 AS DOUBLE) END AS acf
       |FROM r ORDER BY lag_h""".stripMargin

  /** Theil-Sen robust trend over the hourly activity series (Theil 1950;
    * Sen, JASA 1968): the median of all pairwise slopes — the trend
    * estimator with a 29% breakdown point that monitoring uses where OLS
    * (q_text_zipf_fit's moment form) is wrecked by a single incident
    * spike. Pairwise slopes quantize to integer micro-events/hour via the
    * shared-text FLOOR(double + 0.5) idiom (Δn is SIGNED, so integer
    * division would split Spark-truncate vs DuckDB-floor; Δhr > 0 and
    * both operands are exact small integers, so the one IEEE division is
    * identical in both engines); the median reads the two middle order
    * statistics exactly (lo/hi reported, midpoint via the same shared
    * double idiom).
    *
    * 100 TB shape: the only data-sized pass is the hourly bin aggregate
    * (map-side combined); the all-pairs self-join and the ranking window
    * run on the CALENDAR-BOUNDED dense series (~720 hours → ~260k pairs
    * — the autocorr/changepoint contract: bounded by the time range, not
    * the event count). A multi-year deployment chunks the series or
    * samples pairs (Sen's estimator is valid on a pair subsample).
    */
  private def theilSenSql(epochUs: String, intDiv: String) =
    s"""WITH ${hourlyDense(epochUs)},
       |sl AS (SELECT CAST(FLOOR(CAST(b.n - a.n AS DOUBLE) * 1.0E6 / (b.hr - a.hr) + 0.5E0) AS BIGINT) AS s
       |       FROM d a JOIN d b ON b.hr > a.hr),
       |rk AS (SELECT s, row_number() OVER (ORDER BY s) AS r,
       |              COUNT(*) OVER () AS np
       |       FROM sl),
       |med AS (SELECT MAX(CASE WHEN r = (np + 1) $intDiv 2 THEN s END) AS lo,
       |               MAX(CASE WHEN r = np $intDiv 2 + 1 THEN s END) AS hi,
       |               MAX(np) AS np
       |        FROM rk)
       |SELECT CAST(np AS BIGINT) AS n_pairs,
       |       CAST(lo AS BIGINT) AS slope_lo_micro,
       |       CAST(hi AS BIGINT) AS slope_hi_micro,
       |       CAST(FLOOR((CAST(lo AS DOUBLE) + CAST(hi AS DOUBLE)) / 2.0E0 + 0.5E0) AS BIGINT) AS theilsen_micro
       |FROM med""".stripMargin

  /** CUSUM changepoint scan over the hourly activity series (Page,
    * Biometrika 1954; the max-|CUSUM| location estimator of Pettitt
    * 1979): the candidate changepoint maximizes |n·S_i − i·S_n| — the
    * integer-scaled deviation of the prefix sum from the no-change line —
    * and the report carries the before/after segment means so the caller
    * sees the level shift. Top-5 candidates, ties to the earlier hour.
    *
    * Pure integer statistic (n·S_i − i·S_n on BIGINT counts), ranked by
    * TakeOrdered; segment means quantize to centi-events via the
    * offset-free positive division (prefix sums and indices are
    * non-negative). The only data-sized pass is the hourly bin
    * aggregate; the prefix-sum window runs on the calendar-bounded dense
    * series.
    */
  private def changepointSql(epochUs: String, intDiv: String) =
    s"""WITH ${hourlyDense(epochUs)},
       |ix AS (SELECT hr, n,
       |              row_number() OVER (ORDER BY hr) AS i,
       |              SUM(n) OVER (ORDER BY hr
       |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
       |       FROM d),
       |tot AS (SELECT COUNT(*) AS nn, SUM(n) AS sn FROM d),
       |dv AS (SELECT ix.hr, ix.i, ix.s, tot.nn, tot.sn,
       |              abs(tot.nn * ix.s - ix.i * tot.sn) AS dev
       |       FROM ix CROSS JOIN tot WHERE ix.i < tot.nn),
       |sel AS (SELECT hr, i, s, nn, sn, dev FROM dv
       |        ORDER BY dev DESC, hr LIMIT 5)
       |SELECT CAST(row_number() OVER (ORDER BY dev DESC, hr) AS INT) AS rk,
       |       hr, CAST(dev AS BIGINT) AS cusum_dev,
       |       CAST(s * 100 $intDiv i AS BIGINT) AS mean_before_centi,
       |       CAST((sn - s) * 100 $intDiv (nn - i) AS BIGINT) AS mean_after_centi
       |FROM sel ORDER BY rk""".stripMargin

  /** KMV set-INTERSECTION estimation between per-event-type distinct-user
    * sets: the audience-overlap question ("how many users both click and
    * purchase") answered from ~2 KiB sketches instead of a rescan.
    * Per-type k=128 minimum-value sketches (the q_stats_kmv_sketch
    * primitive); the pair's union estimate comes from the k smallest of
    * the two sketches' merged minima (lossless KMV merge), and the
    * intersection by inclusion-exclusion |A∩B| = |A|+|B|−|A∪B| clamped at
    * zero (Bar-Yossef et al., RANDOM 2002; the standard theta-sketch
    * set-op recipe). Exact pair overlap rides along for the accuracy
    * audit (err_bp vs max(exact, 1)).
    *
    * 100 TB shape: the only data-sized passes are the distinct
    * (type, user) projection and the sharded two-phase top-128 (phase 1
    * ranks within (type, h % 16) — 16-way parallel per type — phase 2
    * merges the ≤ 16·128 shard minima; see q_stats_kmv_sketch's
    * two-phase note); everything pairwise runs
    * on ≤ T·128 sketch rows (T = event-type domain, 5 here) — the T×T
    * pair table is a constant-bounded broadcast. The exact-overlap audit
    * joins dv to itself on the USER key (fan-out ≤ T per user), never
    * all-pairs.
    */
  private def kmvIntersectSql(hash: String, intDiv: String): String =
    s"""WITH dv AS (SELECT DISTINCT event_type AS t, user_id AS v FROM events),
       |hx AS (SELECT t, v, $hash AS h FROM dv),
       |cnt AS (SELECT t, COUNT(*) AS nd FROM hx GROUP BY t),
       |r1 AS (SELECT t, h, v,
       |              row_number() OVER (PARTITION BY t, h % 16
       |                                 ORDER BY h, v) AS srn
       |       FROM hx),
       |t1 AS (SELECT t, h, v FROM r1 WHERE srn <= 128),
       |rk AS (SELECT t1.t AS t, h,
       |              row_number() OVER (PARTITION BY t1.t ORDER BY h, v) AS rn,
       |              cnt.nd AS nd
       |       FROM t1 JOIN cnt ON t1.t = cnt.t),
       |sk AS (SELECT t, h, rn, nd FROM rk WHERE rn <= 128),
       |est AS (SELECT t, MAX(nd) AS nd,
       |               CASE WHEN MAX(nd) < 128 THEN MAX(nd)
       |                    ELSE 127 * 281474976710656
       |                         $intDiv MAX(CASE WHEN rn = 128 THEN h ELSE 0 END) END AS e
       |        FROM sk GROUP BY t),
       |tt AS (SELECT DISTINCT t FROM dv),
       |pr AS (SELECT a.t AS ta, b.t AS tb FROM tt a JOIN tt b ON a.t < b.t),
       |uh AS (SELECT pr.ta, pr.tb, s.h FROM pr JOIN sk s ON s.t = pr.ta
       |       UNION
       |       SELECT pr.ta, pr.tb, s.h FROM pr JOIN sk s ON s.t = pr.tb),
       |ur AS (SELECT ta, tb, h,
       |              row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn,
       |              COUNT(*) OVER (PARTITION BY ta, tb) AS nu
       |       FROM uh),
       |uest AS (SELECT ta, tb,
       |                CASE WHEN MAX(nu) < 128 THEN MAX(nu)
       |                     ELSE 127 * 281474976710656
       |                          $intDiv MAX(CASE WHEN rn = 128 THEN h ELSE 0 END) END AS eu
       |         FROM ur WHERE rn <= 128 GROUP BY ta, tb),
       |ex AS (SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_exact
       |       FROM dv a JOIN dv b ON a.v = b.v AND a.t < b.t
       |       GROUP BY a.t, b.t),
       |j AS (SELECT pr.ta, pr.tb, ea.e + eb.e - u.eu AS raw_est,
       |             COALESCE(ex.n_exact, 0) AS n_exact
       |      FROM pr JOIN est ea ON pr.ta = ea.t
       |              JOIN est eb ON pr.tb = eb.t
       |              JOIN uest u ON pr.ta = u.ta AND pr.tb = u.tb
       |              LEFT JOIN ex ON pr.ta = ex.ta AND pr.tb = ex.tb)
       |SELECT ta, tb, CAST(n_exact AS BIGINT) AS exact_inter,
       |       CAST(GREATEST(raw_est, 0) AS BIGINT) AS kmv_inter,
       |       CAST(abs(GREATEST(raw_est, 0) - n_exact) * 10000
       |            $intDiv GREATEST(n_exact, 1) AS BIGINT) AS err_bp
       |FROM j ORDER BY ta, tb""".stripMargin

  /** Next-event prediction eval — the in-engine model-quality loop: train
    * a first-order Markov argmax predictor (most frequent successor per
    * event type) on the chronological FIRST half of the stream, evaluate
    * top-1 accuracy on the second half. The split keys on the CURRENT
    * event's timestamp (the standard protocol): a transition whose
    * current event precedes the cut trains the model even when its
    * successor lands after the cut, and one whose current event is at or
    * past the cut is evaluated. (Round-8 advice: an earlier version of
    * this doc claimed straddling transitions were held out — they are
    * not; strict isolation would additionally require the successor's
    * timestamp < cut in the training filter.)
    *
    * 100 TB shape: transitions come from ONE (user, time) window
    * partitioning (the q_events_transitions exchange); the model is a
    * T²-bounded count table reduced to T argmax rows (broadcast); the
    * eval join is equi on the current type. Accuracy is integer counts →
    * one basis-point division at the display edge.
    */
  private def nextPredSql(epochUs: String, intDiv: String) =
    s"""WITH e AS (SELECT user_id, event_id, event_type, $epochUs AS us FROM events),
       |sp AS (SELECT (MIN(us) + MAX(us)) $intDiv 2 AS cut FROM e),
       |s AS (SELECT user_id, event_type AS cur, us,
       |             lead(event_type) OVER (PARTITION BY user_id
       |                                    ORDER BY us, event_id) AS nxt
       |      FROM e),
       |tr AS (SELECT cur, nxt, COUNT(*) AS c
       |       FROM s CROSS JOIN sp WHERE nxt IS NOT NULL AND us < cut
       |       GROUP BY cur, nxt),
       |md AS (SELECT cur, nxt AS pred FROM (
       |         SELECT cur, nxt,
       |                row_number() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rn
       |         FROM tr) x WHERE rn = 1),
       |te AS (SELECT cur, nxt FROM s CROSS JOIN sp
       |       WHERE nxt IS NOT NULL AND us >= cut),
       |a AS (SELECT te.cur, md.pred, COUNT(*) AS n_eval,
       |             SUM(CASE WHEN te.nxt = md.pred THEN 1 ELSE 0 END) AS n_hit
       |      FROM te JOIN md ON te.cur = md.cur
       |      GROUP BY te.cur, md.pred)
       |SELECT cur, pred, CAST(n_eval AS BIGINT) AS n_eval,
       |       CAST(n_hit AS BIGINT) AS n_hit,
       |       CAST(n_hit * 10000 $intDiv n_eval AS BIGINT) AS acc_bp
       |FROM a ORDER BY cur""".stripMargin

  /** Second-order Markov next-event eval with first-order backoff — the
    * model-depth question asked of q_events_next_pred: does conditioning
    * on the PREVIOUS event too lift top-1 accuracy? Train both models on
    * the chronological first half (split keyed on the current event's
    * timestamp, the next_pred protocol); at eval, predict from the
    * (prev, cur) table when that context was seen in training, else back
    * off to the (cur) table (the katz-backoff shape q_text_kn_ppl applies
    * to language bigrams, here on event streams). Output rolls up per
    * current type with the backoff rate — the diagnostic that says
    * whether the second order is earning its T² state.
    *
    * 100 TB shape: transitions from ONE (user, time) window partitioning;
    * both models are ≤ T²/T³-bounded count tables reduced to argmax rows
    * (broadcast); eval joins are equi on the context columns. Integer
    * counts; one basis-point integer division at the display edge.
    */
  private def nextPred2Sql(epochUs: String, intDiv: String) =
    s"""WITH e AS (SELECT user_id, event_id, event_type, $epochUs AS us FROM events),
       |sp AS (SELECT (MIN(us) + MAX(us)) $intDiv 2 AS cut FROM e),
       |s AS (SELECT user_id, event_type AS cur, us,
       |             lag(event_type) OVER (PARTITION BY user_id
       |                                   ORDER BY us, event_id) AS prv,
       |             lead(event_type) OVER (PARTITION BY user_id
       |                                    ORDER BY us, event_id) AS nxt
       |      FROM e),
       |tr2 AS (SELECT prv, cur, nxt, COUNT(*) AS c
       |        FROM s CROSS JOIN sp
       |        WHERE nxt IS NOT NULL AND prv IS NOT NULL AND us < cut
       |        GROUP BY prv, cur, nxt),
       |md2 AS (SELECT prv, cur, nxt AS pred FROM (
       |          SELECT prv, cur, nxt,
       |                 row_number() OVER (PARTITION BY prv, cur
       |                                    ORDER BY c DESC, nxt) AS rn
       |          FROM tr2) x WHERE rn = 1),
       |tr1 AS (SELECT cur, nxt, COUNT(*) AS c
       |        FROM s CROSS JOIN sp WHERE nxt IS NOT NULL AND us < cut
       |        GROUP BY cur, nxt),
       |md1 AS (SELECT cur, nxt AS pred FROM (
       |          SELECT cur, nxt,
       |                 row_number() OVER (PARTITION BY cur ORDER BY c DESC, nxt) AS rn
       |          FROM tr1) x WHERE rn = 1),
       |te AS (SELECT prv, cur, nxt FROM s CROSS JOIN sp
       |       WHERE nxt IS NOT NULL AND us >= cut),
       |pr AS (SELECT te.cur, te.nxt,
       |              COALESCE(m2.pred, m1.pred) AS pred,
       |              CASE WHEN m2.pred IS NULL THEN 1 ELSE 0 END AS backoff
       |       FROM te LEFT JOIN md2 m2 ON te.prv = m2.prv AND te.cur = m2.cur
       |               LEFT JOIN md1 m1 ON te.cur = m1.cur),
       |a AS (SELECT cur, COUNT(*) AS n_eval,
       |             CAST(SUM(CASE WHEN nxt = pred THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |             CAST(SUM(backoff) AS BIGINT) AS n_backoff
       |      FROM pr GROUP BY cur)
       |SELECT cur, CAST(n_eval AS BIGINT) AS n_eval, n_hit, n_backoff,
       |       CAST(n_hit * 10000 $intDiv n_eval AS BIGINT) AS acc_bp,
       |       CAST(n_backoff * 10000 $intDiv n_eval AS BIGINT) AS backoff_bp
       |FROM a ORDER BY cur""".stripMargin

  /** Sample-ratio-mismatch check — the FIRST gate of any experiment
    * readout (a biased assignment invalidates q_events_cuped's means
    * before any variance math): under 50/50 hash assignment the arm
    * counts are binomial, and χ² = (n₀−n₁)²/(n₀+n₁) against 1 dof flags
    * at 3.84 (95%). Hash-parity assignment over distinct users, one
    * pruned scan + two-phase distinct, exact integer counts, one
    * identical-op-sequence double division at the display edge.
    */
  private def srmSql(md5user: String) =
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |a AS (SELECT ($md5user) % 2 AS arm FROM u),
       |c AS (SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
       |             CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
       |      FROM a)
       |SELECT n0, n1,
       |       CAST(FLOOR(CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
       |                  / (n0 + n1) * 100 + 0.5E0) AS BIGINT) AS chi2_centi,
       |       CAST(CASE WHEN CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1)
       |                      > 3.841E0 THEN 1 ELSE 0 END AS INT) AS srm_flag
       |FROM c""".stripMargin

  /** Two-level distributed quantile estimation — the mergeable-summary
    * pattern Spark's own RangePartitioner and AQE skew stats rely on:
    * each shard keeps every 64th order statistic (weight 64, plus its
    * remainder-weighted closing point), the merged summary re-ranks those
    * ~N/64 points by cumulative weight, and P50/P90/P99 read off the
    * first summary point whose cumulative weight reaches the target rank.
    * The exact quantiles ride along as the accuracy audit (rank error in
    * basis points) — audit-only, same contract as q_ann_recall_curve's
    * brute branch.
    *
    * 100 TB shape: the per-shard rank window parallelizes over shards and
    * is the ONLY data-sized pass; the merge runs on N/64 summary rows and
    * the 3-row target table broadcasts. Rank error is bounded by
    * shards·64/2 ABSOLUTE rows regardless of the value distribution —
    * the spec pins that bound. Everything is integer cents / ranks.
    *
    * Round-9 (round-8 verdict #5): the audit branch previously ran a
    * GLOBAL unpartitioned row_number over all of lineitem (one task) and
    * a theta-join rescan. Both now ride value-binned hierarchical ranks:
    * cents DIV 65536 buckets the FIXED price domain into ~170 bins
    * (domain-bounded — does not grow with N), per-bin counts/offsets come
    * from a map-side-combined GROUP BY plus a tiny bin-table self-join,
    * and every rank window is PARTITION BY bin (or shard). Global rank =
    * bin offset + within-bin rank — identical total order (bin is a
    * prefix of the cents sort key), so the output hash is unchanged; the
    * est_rank probe is an equi-join on the estimate's bin. PlanAuditSpec
    * pins zero unpartitioned WindowExec in this plan.
    */
  private def quantileMergeSql(levels: String, intDiv: String) =
    s"""WITH v AS (SELECT l_orderkey * 16 + l_linenumber AS id,
       |                 CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
       |                 l_orderkey % 16 AS shard
       |          FROM lineitem),
       |r AS (SELECT shard, cents, id,
       |             row_number() OVER (PARTITION BY shard ORDER BY cents, id) AS rn,
       |             COUNT(*) OVER (PARTITION BY shard) AS n
       |      FROM v),
       |s AS (SELECT shard, cents, rn,
       |             CASE WHEN rn % 64 = 0 THEN 64 ELSE n % 64 END AS w
       |      FROM r WHERE rn % 64 = 0 OR (rn = n AND n % 64 <> 0)),
       |sb AS (SELECT shard, cents, rn, w, cents $intDiv 65536 AS bin FROM s),
       |swb AS (SELECT bin, CAST(SUM(w) AS BIGINT) AS bw FROM sb GROUP BY bin),
       |sboff AS (SELECT a.bin, CAST(COALESCE(SUM(b.bw), 0) AS BIGINT) AS off
       |          FROM swb a LEFT JOIN swb b ON b.bin < a.bin GROUP BY a.bin),
       |m AS (SELECT sb.cents,
       |             so.off + SUM(sb.w) OVER (PARTITION BY sb.bin
       |                                      ORDER BY sb.cents, sb.shard, sb.rn
       |                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
       |      FROM sb JOIN sboff so ON sb.bin = so.bin),
       |nt AS (SELECT COUNT(*) AS n FROM v),
       |lv AS ($levels),
       |tgt AS (SELECT lv.q, nt.n, (nt.n * lv.q + 99) $intDiv 100 AS target_rank
       |        FROM lv CROSS JOIN nt),
       |est AS (SELECT t.q, t.n, t.target_rank, MIN(m.cents) AS est_cents
       |        FROM tgt t JOIN m ON m.cw >= t.target_rank
       |        GROUP BY t.q, t.n, t.target_rank),
       |vb AS (SELECT cents, id, cents $intDiv 65536 AS bin FROM v),
       |bcnt AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM vb GROUP BY bin),
       |boff AS (SELECT a.bin, CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS off
       |         FROM bcnt a LEFT JOIN bcnt b ON b.bin < a.bin GROUP BY a.bin),
       |vr AS (SELECT vb.cents,
       |              bo.off + row_number() OVER (PARTITION BY vb.bin
       |                                          ORDER BY vb.cents, vb.id) AS grn
       |       FROM vb JOIN boff bo ON vb.bin = bo.bin),
       |ex AS (SELECT t.q, MIN(x.cents) AS exact_cents
       |       FROM tgt t JOIN vr x ON x.grn = t.target_rank
       |       GROUP BY t.q),
       |gr0 AS (SELECT e.q, bo.off
       |        FROM est e JOIN boff bo ON bo.bin = e.est_cents $intDiv 65536),
       |grc AS (SELECT e.q, CAST(COUNT(*) AS BIGINT) AS inbin
       |        FROM est e JOIN vb ON vb.bin = e.est_cents $intDiv 65536
       |                          AND vb.cents <= e.est_cents
       |        GROUP BY e.q),
       |gr AS (SELECT g0.q, g0.off + COALESCE(gc.inbin, 0) AS est_rank
       |       FROM gr0 g0 LEFT JOIN grc gc ON g0.q = gc.q)
       |SELECT e.q, CAST(e.n AS BIGINT) AS n_total,
       |       CAST(e.target_rank AS BIGINT) AS target_rank,
       |       CAST(e.est_cents AS BIGINT) AS est_cents,
       |       CAST(ex.exact_cents AS BIGINT) AS exact_cents,
       |       CAST(g.est_rank AS BIGINT) AS est_rank,
       |       CAST(abs(g.est_rank - e.target_rank) * 10000 $intDiv e.n AS BIGINT) AS rank_err_bp
       |FROM est e JOIN ex ON e.q = ex.q JOIN gr g ON e.q = g.q
       |ORDER BY e.q""".stripMargin

  /** Exponentially-weighted moving average + one-step-ahead forecast
    * residual over the hourly activity series — the streaming-adjacent
    * smoother a monitoring pipeline runs next to the windowed z-score
    * (q_ts_anomaly_zscore): EWMA reacts geometrically (half-life 1 bin at
    * α = 1/2) where the flat 24-bin window reacts linearly, so level
    * shifts surface bins earlier.
    *
    * Arithmetic is EXACT by dyadic construction: α = 1/2 makes every EWMA
    * weight a power of two, and truncating at 20 taps bounds the dropped
    * tail below 2⁻²⁰ of the max count — so the smoothed level is carried
    * as the INTEGER lsc(t) = Σ_{i=0..19} n(t−i)·2^(19−i) (2²⁰ × EWMA, no
    * division anywhere — the value ships scaled and documented rather
    * than ROUNDed, the round-8 display-quotient lesson) and the forecast
    * residual n(t)·2²⁰ − lsc(t−1) is a BIGINT difference. Both engines
    * share every op.
    *
    * 100 TB shape: one data-sized pass (the hourly bin aggregate,
    * map-side combined); the 20-tap weighting is a 20-row lag-table
    * equi-join against the calendar-bounded dense series (the
    * q_ts_autocorr shape) and the top-20 anomaly pick is TakeOrdered.
    */
  private def ewmaSql(epochUs: String) =
    s"""WITH ${hourlyDense(epochUs)},
       |lg AS (LAG_SPINE),
       |ew AS (SELECT a.hr, CAST(SUM(b.n * lg.w) AS BIGINT) AS lsc,
       |              COUNT(*) AS ntaps
       |       FROM d a JOIN lg ON 1 = 1 JOIN d b ON b.hr = a.hr - lg.l
       |       GROUP BY a.hr),
       |r AS (SELECT cur.hr, cur.n,
       |             prev.lsc,
       |             CAST(cur.n * 1048576 - prev.lsc AS BIGINT) AS resid_sc
       |      FROM d cur JOIN ew prev ON prev.hr = cur.hr - 1
       |      WHERE prev.ntaps = 20),
       |sel AS (SELECT hr, n, lsc, resid_sc FROM r
       |        ORDER BY abs(resid_sc) DESC, hr LIMIT 20)
       |SELECT CAST(row_number() OVER (ORDER BY abs(resid_sc) DESC, hr) AS INT) AS rk,
       |       CAST(hr AS BIGINT) AS hr, CAST(n AS BIGINT) AS n,
       |       CAST(lsc AS BIGINT) AS ewma_sc, resid_sc
       |FROM sel ORDER BY rk""".stripMargin

  /** Brown-Holt double exponential smoothing over the dense hourly
    * series (Brown, "Exponential smoothing for predicting demand" 1956;
    * Holt 1957): level a = 2S′ − S″, trend b = S′ − S″ (α = ½ makes the
    * α/(1−α) factor exactly 1), one-step forecast a + b — the
    * trend-aware upgrade of q_ts_ewma's level-only monitor, same
    * machinery: the single-EWMA kernel α(1−α)^k and the double-EWMA
    * kernel (k+1)α²(1−α)^k are both EXACT dyadic integers at α = ½
    * (2^(20−k) and (k+1)·2^(19−k) at 2²¹ scale), so the two smoothers
    * are 20-tap integer convolutions and the level/trend/forecast are
    * pure BIGINT arithmetic — the only divisions are the two
    * self-normalizations by the exact tap-weight totals (non-negative,
    * engine-agreement domain). 20 taps truncate the kernels at relative
    * mass 2^-20 — beneath the 1-count quantum of the series itself.
    *
    * 100 TB shape: identical to q_ts_ewma — one scan to per-hour counts,
    * a calendar-bounded dense spine, one 20-row lag-table nested loop
    * (sweep-allowlisted) and per-hour grouping; display is the last 24
    * complete hours via TakeOrdered.
    */
  private def holtSql(epochUs: String, intDiv: String) =
    s"""WITH ${hourlyDense(epochUs)},
       |lg AS (HOLT_SPINE),
       |tw AS (SELECT CAST(SUM(w1) AS BIGINT) AS t1, CAST(SUM(w2) AS BIGINT) AS t2 FROM lg),
       |sm AS (SELECT a.hr,
       |              CAST(SUM(b.n * lg.w1) AS BIGINT) AS s1sc,
       |              CAST(SUM(b.n * lg.w2) AS BIGINT) AS s2sc,
       |              COUNT(*) AS ntaps
       |       FROM d a JOIN lg ON 1 = 1 JOIN d b ON b.hr = a.hr - lg.l
       |       GROUP BY a.hr),
       |r AS (SELECT sm.hr,
       |             CAST(s1sc $intDiv tw.t1 AS BIGINT) AS s1,
       |             CAST(s2sc $intDiv tw.t2 AS BIGINT) AS s2
       |      FROM sm CROSS JOIN tw WHERE sm.ntaps = 20),
       |f AS (SELECT r.hr, d.n, r.s1, r.s2,
       |             2 * r.s1 - r.s2 AS level_est,
       |             r.s1 - r.s2 AS trend_est,
       |             3 * r.s1 - 2 * r.s2 AS forecast_1
       |      FROM r JOIN d ON d.hr = r.hr),
       |sel AS (SELECT hr, n, s1, s2, level_est, trend_est, forecast_1
       |        FROM f ORDER BY hr DESC LIMIT 24)
       |SELECT CAST(row_number() OVER (ORDER BY hr) AS INT) AS rk,
       |       CAST(hr AS BIGINT) AS hr, CAST(n AS BIGINT) AS n,
       |       s1 AS s_single, s2 AS s_double, level_est, trend_est, forecast_1
       |FROM sel ORDER BY rk""".stripMargin

  /** CUPED variance-reduced experiment readout (Deng, Xu, Kohavi & Walker,
    * WSDM 2013) — the standard trick that makes A/B tests decisive on a
    * fraction of the traffic: adjust each unit's metric by its own
    * PRE-EXPERIMENT covariate, Y' = Y − θ·(X − E[X]) with
    * θ = cov(X,Y)/var(X), which strips the variance the user's baseline
    * behavior explains while leaving every arm's mean effect unbiased.
    * Units are users; the metric is post-period purchase cents, the
    * covariate pre-period purchase cents (split at the stream's midpoint
    * cut, the q_events_next_pred protocol); arms assign by md5 parity of
    * user_id (hash-based assignment, the production convention).
    *
    * Determinism: every moment (n, Σx, Σy, Σx², Σy², Σxy) is an exact
    * integer on cents (fold-order exact); θ, the adjusted means and the
    * per-arm variance-reduction ratio var(Y')/var(Y) =
    * 1 − (V − 2θC + θ²X)/V (V, C, X the n-scaled per-arm central
    * moments) are doubles derived from those integers by an identical
    * correctly-rounded op sequence in both engines (the q_ts_autocorr
    * discipline), displayed FLOOR-quantized. Σx² stays in BIGINT while
    * per-user cents < ~3·10⁶ at a billion users.
    *
    * 100 TB shape: one pruned scan of purchase events (filter pushed),
    * one per-user aggregate (map-side combined, shuffles on user_id),
    * then a 2-row arm table; pooled moments ride windows over those 2
    * rows (single-consumer chain — no re-inlined re-scan). The 1-row
    * midpoint cut broadcasts (allowlisted, next_pred shape).
    *
    * Fixture note: event values are drawn iid, so the pre-period
    * covariate is intentionally weak here (r ≈ 0.03 at sf0.01+) and
    * per-arm reduction can dip a few hundred bp negative — the POOLED
    * reduction, which equals r²(X, Y) and can never be negative, is what
    * WarehouseSpec pins; on real traffic (where users have stable
    * baselines, r commonly 0.5+) the same query is the decisive readout.
    */
  private def cupedSql(epochUs: String, intDiv: String, md5user: String) =
    s"""WITH e AS (SELECT user_id, $epochUs AS us,
       |                 CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
       |          FROM events WHERE event_type = 'purchase'),
       |sp AS (SELECT (MIN(us) + MAX(us)) $intDiv 2 AS cut FROM e),
       |u AS (SELECT user_id,
       |             CAST(SUM(CASE WHEN us < cut THEN cents ELSE 0 END) AS BIGINT) AS x,
       |             CAST(SUM(CASE WHEN us >= cut THEN cents ELSE 0 END) AS BIGINT) AS y
       |      FROM e CROSS JOIN sp GROUP BY user_id),
       |ua AS (SELECT user_id, x, y, ($md5user) % 2 AS arm FROM u),
       |m AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
       |             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |             CAST(SUM(x * x) AS BIGINT) AS sxx,
       |             CAST(SUM(y * y) AS BIGINT) AS syy,
       |             CAST(SUM(x * y) AS BIGINT) AS sxy
       |      FROM ua GROUP BY arm),
       |g AS (SELECT arm, n, sx, sy, sxx, syy, sxy,
       |             SUM(n) OVER () AS gn, SUM(sx) OVER () AS gsx,
       |             SUM(sy) OVER () AS gsy, SUM(sxx) OVER () AS gsxx,
       |             SUM(sxy) OVER () AS gsxy
       |      FROM m),
       |t AS (SELECT arm, n, sx, sy, sxx, syy, sxy,
       |             CASE WHEN gn * gsxx - gsx * gsx > 0
       |                  THEN CAST(gn * gsxy - gsx * gsy AS DOUBLE)
       |                       / CAST(gn * gsxx - gsx * gsx AS DOUBLE)
       |                  ELSE 0.0E0 END AS theta,
       |             CAST(gsx AS DOUBLE) / gn AS mx
       |      FROM g)
       |SELECT CAST(arm AS INT) AS arm, n AS n_users,
       |       CAST(sy AS BIGINT) AS sum_y_cents,
       |       CAST(FLOOR(CAST(sy AS DOUBLE) / n + 0.5E0) AS BIGINT) AS mean_y_cents,
       |       CAST(FLOOR(CAST(sy AS DOUBLE) / n
       |                  - theta * (CAST(sx AS DOUBLE) / n - mx) + 0.5E0) AS BIGINT)
       |         AS mean_yadj_cents,
       |       CASE WHEN n * syy - sy * sy > 0
       |            THEN CAST(FLOOR((1.0E0
       |                 - (CAST(n * syy - sy * sy AS DOUBLE)
       |                    - 2.0E0 * theta * CAST(n * sxy - sx * sy AS DOUBLE)
       |                    + theta * theta * CAST(n * sxx - sx * sx AS DOUBLE))
       |                   / CAST(n * syy - sy * sy AS DOUBLE)) * 10000 + 0.5E0) AS BIGINT)
       |            END AS var_red_bp
       |FROM t ORDER BY arm""".stripMargin

  val specs: Map[String, QuerySpec] = Map(
    "q_events_next_pred2" -> sql2(
      nextPred2Sql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV"),
      nextPred2Sql("epoch_us(ts)", "//")),
    "q_events_srm" -> sql2(
      srmSql("CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"),
      srmSql("('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT")),
    "q_events_cuped" -> sql2(
      cupedSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV",
        "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"),
      cupedSql("epoch_us(ts)", "//",
        "('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT")),
    "q_ts_holt" -> sql2(
      holtSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV")
        .replace("HOLT_SPINE",
          "SELECT l, CAST(shiftleft(1L, 20 - CAST(l AS INT)) AS BIGINT) AS w1, " +
            "CAST((l + 1) * shiftleft(1L, 19 - CAST(l AS INT)) AS BIGINT) AS w2 " +
            "FROM (SELECT explode(sequence(0, 19)) AS l)")
        .replace("SPINE_EXPR", "explode(sequence(mn, mx))"),
      holtSql("epoch_us(ts)", "//")
        .replace("HOLT_SPINE",
          "SELECT l, CAST(1::BIGINT << (20 - l) AS BIGINT) AS w1, " +
            "CAST((l + 1) * (1::BIGINT << (19 - l)) AS BIGINT) AS w2 " +
            "FROM (SELECT unnest(range(0, 20)) AS l) z")
        .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")),
    "q_ts_ewma" -> sql2(
      ewmaSql("unix_micros(CAST(ts AS TIMESTAMP))")
        .replace("LAG_SPINE",
          "SELECT l, CAST(shiftleft(1L, 19 - CAST(l AS INT)) AS BIGINT) AS w " +
            "FROM (SELECT explode(sequence(0, 19)) AS l)")
        .replace("SPINE_EXPR", "explode(sequence(mn, mx))"),
      ewmaSql("epoch_us(ts)")
        .replace("LAG_SPINE",
          "SELECT l, CAST(1::BIGINT << (19 - l) AS BIGINT) AS w " +
            "FROM (SELECT unnest(range(0, 20)) AS l) z")
        .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")),
    "q_dim_merge_upsert" -> sql(mergeUpsert),
    "q_events_next_pred" -> sql2(
      nextPredSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV"),
      nextPredSql("epoch_us(ts)", "//")),
    "q_stats_quantile_merge" -> sql2(
      quantileMergeSql("SELECT explode(array(50, 90, 99)) AS q", "DIV"),
      quantileMergeSql("SELECT unnest([50, 90, 99]) AS q", "//")),
    "q_dim_pit_join" -> sql(pitJoin),
    "q_ts_seasonal_decompose" -> sql2(
      seasonalSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV")
        .replace("SPINE_EXPR", "explode(sequence(mn, mx))"),
      seasonalSql("epoch_us(ts)", "//")
        .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")),
    "q_stats_kmv_intersect" -> sql2(
      kmvIntersectSql(
        "CAST(conv(substr(md5(CAST(v AS STRING)), 1, 12), 16, 10) AS BIGINT)", "DIV"),
      kmvIntersectSql(
        "('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12))::BIGINT", "//")),
    "q_stats_column_profile" -> sql2(colProfileSpark, colProfileDuck),
    "q_stats_kmv_sketch" -> sql2(
      kmvSketchSql(
        "CAST(conv(substr(md5(CAST(v AS STRING)), 1, 12), 16, 10) AS BIGINT)", "DIV"),
      kmvSketchSql(
        "('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 12))::BIGINT", "//")),
    "q_layout_clustering_depth" -> sql2(
      clusterDepthSql("datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')", "DIV"),
      clusterDepthSql("(CAST(l_shipdate AS DATE) - DATE '1970-01-01')", "//")),
    "q_layout_compaction_plan" -> sql2(compactionSql("DIV"), compactionSql("//")),
    "q_events_k_anonymity" -> sql2(
      kAnonSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV"),
      kAnonSql("epoch_us(ts)", "//")),
    "q_events_lift" -> QuerySpec(
      (s, d) => {
        graft.queries.Tables.registerAll(s, d)
        s.sql("SELECT user_id, collect_set(event_type) AS ts FROM events GROUP BY user_id")
          .staged()
          .createOrReplaceTempView("lift_u")
        s.sql(liftTail)
      },
      Some(liftDuck)),
    "q_events_survival_km" -> sql2(
      kmSurvivalSql("unix_micros(CAST(ts AS TIMESTAMP))", graft.llm.NeutralMath.SparkKernel),
      kmSurvivalSql("epoch_us(ts)", graft.llm.NeutralMath.OracleKernel)),
    "q_events_transitions" -> sql(transitions),
    "q_events_seq_trigrams" -> sql(seqTrigrams),
    "q_events_lateness_audit" -> sql2(
      latenessSql("unix_micros(CAST(ts AS TIMESTAMP))",
        "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 5), 16, 10) AS BIGINT)",
        "SELECT explode(array(0, 21600, 86400)) AS w_s", "DIV"),
      latenessSql("epoch_us(ts)",
        "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 5))::BIGINT",
        "SELECT unnest([0, 21600, 86400]) AS w_s", "//")),
    "q_events_funnel_ordered" -> sql(funnelOrdered),
    "q_events_attribution" -> sql2(attributionSpark, attributionDuck),
    "q_dim_scd2" -> sql(scd2),
    "q_layout_range_partition" -> sql2(rangePartSpark, rangePartDuck),
    "q_ts_anomaly_zscore" -> sql2(
      anomalySql("unix_micros(CAST(ts AS TIMESTAMP))"),
      anomalySql("epoch_us(ts)")),
    "q_ts_resample_ffill" -> sql2(resampleSpark, resampleDuck),
    "q_ts_autocorr" -> sql2(
      autocorrSql("unix_micros(CAST(ts AS TIMESTAMP))",
        "SELECT explode(array(1, 24, 168)) AS l")
        .replace("SPINE_EXPR", "explode(sequence(mn, mx))"),
      autocorrSql("epoch_us(ts)", "SELECT unnest([1, 24, 168]) AS l")
        .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")),
    "q_ts_changepoint" -> sql2(
      changepointSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV")
        .replace("SPINE_EXPR", "explode(sequence(mn, mx))"),
      changepointSql("epoch_us(ts)", "//")
        .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")),
    "q_stats_benford" -> sql2(benfordSql("DIV"), benfordSql("//")),
    "q_stats_ks_test" -> sql2(
      ksTestSql("explode(sequence(0, 63))", "DIV"),
      ksTestSql("unnest(range(0, 64))", "//")),
    "q_stats_mannwhitney" -> sql2(
      mannWhitneySql("explode(sequence(0, 63))"),
      mannWhitneySql("unnest(range(0, 64))")),
    "q_events_rfm" -> sql2(
      rfmSql((a, b) => s"datediff($a, $b)", "DIV"),
      rfmSql((a, b) => s"datediff('day', $b, $a)", "//")),
    "q_stats_gini" -> sql2(
      giniSql("explode(sequence(1, 10))", "DIV"),
      giniSql("unnest(range(1, 11))", "//")),
    "q_events_cohort_ltv" -> sql2(cohortLtvSql("DIV"), cohortLtvSql("//")),
    "q_events_nelson_aalen" -> sql2(
      nelsonAalenSql("unix_micros(CAST(ts AS TIMESTAMP))", graft.llm.NeutralMath.SparkKernel),
      nelsonAalenSql("epoch_us(ts)", graft.llm.NeutralMath.OracleKernel)),
    "q_stats_bootstrap_ci" -> sql2(
      bootstrapSql(
        "SELECT explode(sequence(0, 31)) AS b",
        "CAST(conv(substr(md5(concat(CAST(v.o_orderkey AS STRING), '_', CAST(b.b AS STRING))), 1, 6), 16, 10) AS BIGINT)",
        "DIV"),
      bootstrapSql(
        "SELECT unnest(range(0, 32)) AS b",
        "('0x' || substr(md5(CAST(v.o_orderkey AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)), 1, 6))::BIGINT",
        "//")),
    "q_events_dp_release" -> sql2(
      dpReleaseSql(
        "CAST(conv(substr(md5(event_type), 1, 6), 16, 10) AS BIGINT)",
        graft.llm.NeutralMath.SparkKernel),
      dpReleaseSql(
        "('0x' || substr(md5(event_type), 1, 6))::BIGINT",
        graft.llm.NeutralMath.OracleKernel)),
    "q_ts_theil_sen" -> sql2(
      theilSenSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV")
        .replace("SPINE_EXPR", "explode(sequence(mn, mx))"),
      theilSenSql("epoch_us(ts)", "//")
        .replace("SPINE_EXPR", "unnest(range(mn, mx + 1))")),
    "q_events_retention" -> sql2(
      retentionSql("unix_micros(CAST(ts AS TIMESTAMP))"),
      retentionSql("epoch_us(ts)"))
  )
}
