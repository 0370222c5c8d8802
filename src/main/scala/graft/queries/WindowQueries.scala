package graft.queries

import QuerySpec.{sql, sql2}

/** Window-function matrix (SURVEY.md §2.B.5): ranking, analytic, aggregates
  * as windows, ROWS/RANGE frames, named WINDOW clause. All delegated rows of
  * the reference's SQL contract (entry
  * datafusion-flight-sql-server/src/service.rs:171).
  *
  * Scale note: every window below partitions by `o_custkey` (high
  * cardinality, low skew) so the single shuffle is an even hash exchange; no
  * global unpartitioned window (which would serialize onto one task at
  * 100 TB) is used anywhere.
  *
  * Determinism: every OVER ordering ends in the unique key `o_orderkey`, so
  * rank/ntile/lag ties cannot occur.
  */
object WindowQueries {

  val specs: Map[String, QuerySpec] = Map(
    // ranking functions + named WINDOW clause
    "q_win_rank" -> sql(
      """SELECT o_custkey, o_orderkey,
        |row_number() OVER w AS rn, rank() OVER w AS rk, dense_rank() OVER w AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // Time-based RANGE frame (trailing-1h per-user activity features — the
    // rolling-feature shape a training pipeline computes over event
    // streams). The frame is an interval predicate on the ORDER BY
    // timestamp, so one shuffle on user_id serves every feature column;
    // money-grade sums go through lossless DECIMAL(18,2).
    "q_win_time_range" -> sql(
      """SELECT event_id, user_id,
        |COUNT(*) OVER w AS n_1h,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
        |FROM events WHERE event_type = 'click'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin),

    // Batch sessionization — the log-analytics twin of the streaming
    // session_window query: a gap > 30 min starts a new session, the
    // session id is the running count of gap flags, then sessions are
    // aggregated. All three window passes (lag, running sum) and the final
    // group ride ONE shuffle on user_id; the session aggregate keys on
    // (user_id, sid), a refinement of the window partitioning, so AQE
    // coalesces rather than reshuffles. Timestamps compare in integer
    // microseconds — no interval arithmetic to diverge across engines.
    "q_win_sessionize" -> QuerySpec.sql2(
      """WITH e AS (SELECT user_id, event_id, unix_micros(CAST(ts AS TIMESTAMP)) AS tus
        |           FROM events WHERE event_type IN ('click', 'view')),
        |g AS (SELECT user_id, event_id, tus,
        |        CASE WHEN lag(tus) OVER w IS NULL
        |                  OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT user_id, event_id, tus,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_seq,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MIN(tus) AS start_us, MAX(tus) AS end_us
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_seq""".stripMargin,
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus
        |           FROM events WHERE event_type IN ('click', 'view')),
        |g AS (SELECT user_id, event_id, tus,
        |        CASE WHEN lag(tus) OVER w IS NULL
        |                  OR tus - lag(tus) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
        |s AS (SELECT user_id, event_id, tus,
        |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |                         ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, CAST(sid AS BIGINT) AS session_seq,
        |       CAST(COUNT(*) AS BIGINT) AS n_events,
        |       MIN(tus) AS start_us, MAX(tus) AS end_us
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, session_seq""".stripMargin),

    "q_win_percent" -> sql(
      """SELECT o_custkey, o_orderkey,
        |ROUND(percent_rank() OVER w, 6) AS pr,
        |ROUND(cume_dist() OVER w, 6) AS cd,
        |ntile(4) OVER w AS nt
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // analytic functions
    "q_win_lag" -> sql(
      """SELECT o_custkey, o_orderkey,
        |ROUND(lag(o_totalprice, 1) OVER w, 2) AS prev_p,
        |ROUND(lead(o_totalprice, 1) OVER w, 2) AS next_p,
        |ROUND(lag(o_totalprice, 2, 0.0) OVER w, 2) AS prev2
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    "q_win_nth" -> sql(
      """SELECT o_custkey, o_orderkey,
        |ROUND(first_value(o_totalprice) OVER w, 2) AS fv,
        |ROUND(last_value(o_totalprice) OVER w, 2) AS lv,
        |ROUND(nth_value(o_totalprice, 2) OVER w, 2) AS nv
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    // IGNORE NULLS window modifiers (SQL-standard, in DataFusion's window
    // surface): last non-null carried forward + previous non-null — the
    // gap-fill primitive for sparse event attributes. Spark puts IGNORE
    // NULLS after the call, DuckDB inside the argument list; values match
    // exactly.
    // QUALIFY parity: DuckDB filters on a window result inline; Spark
    // lacks the clause, so the engine-side form is the standard derived-
    // table emulation — one answer from the two formulations.
    "q_win_qualify" -> sql2(
      """SELECT c_mktsegment, c_custkey, bal_cents, rnk FROM (
        |  SELECT c_mktsegment, c_custkey,
        |         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
        |         CAST(rank() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 2 ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin,
      """SELECT c_mktsegment, c_custkey,
        |       CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
        |       CAST(rank() OVER (PARTITION BY c_mktsegment
        |                         ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rnk
        |FROM customer QUALIFY rnk <= 2
        |ORDER BY c_mktsegment, rnk, c_custkey""".stripMargin),

    // Frame-EXCLUDE parity: DuckDB's EXCLUDE CURRENT ROW; Spark lacks the
    // modifier, so the engine computes the full ±3 frame and subtracts the
    // current row — the peer-average shape (leave-one-out smoothing).
    // Integer cents keep both engines' sums exact.
    "q_win_exclude_current" -> sql2(
      """SELECT o_custkey, o_orderkey,
        |       CAST((SUM(cents) OVER w) - cents AS BIGINT) AS peer_cents,
        |       CAST((COUNT(*) OVER w) - 1 AS BIGINT) AS peer_n
        |FROM (SELECT o_custkey, o_orderkey,
        |             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |      FROM orders) t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
      """SELECT o_custkey, o_orderkey,
        |       CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT) AS peer_cents,
        |       CAST(COUNT(*) OVER w AS BIGINT) AS peer_n
        |FROM (SELECT o_custkey, o_orderkey,
        |             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |      FROM orders) t
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin),

    "q_win_ignore_nulls" -> sql2(
      """SELECT o_custkey, o_orderkey,
        |last_value(NULLIF(o_orderpriority, '1-URGENT')) IGNORE NULLS
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_np,
        |lag(NULLIF(o_orderpriority, '1-URGENT')) IGNORE NULLS
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_np
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
      """SELECT o_custkey, o_orderkey,
        |last_value(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS)
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_np,
        |lag(NULLIF(o_orderpriority, '1-URGENT') IGNORE NULLS)
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_np
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),

    // aggregates as windows, ROWS frames. Running SUM/AVG accumulate in
    // exact integer CENTS (o_totalprice is a 2-decimal double, so
    // ROUND(x*100) recovers the exact cent count identically on both
    // engines) because double accumulation order differs between Spark's
    // sequential frame evaluation and DuckDB's segment-tree windows —
    // last-ulp drift flips cents at ROUND boundaries. Integer window sums
    // are exact AND stay in codegen (the DECIMAL formulation is equally
    // exact but interpreted — ~5x slower at sf0.1). The moving average is
    // rounded to cents in INTEGER arithmetic (S div c + carry): the
    // rational S/(100c) lands exactly on .xx5 ties for 2-row frames, where
    // Spark's ROUND (BigDecimal.valueOf string path) rounds up but DuckDB
    // rounds the raw double's binary value down — sf0.1 exposed two such
    // rows. Dialect split only for the integer-division operator
    // (Spark `div`, DuckDB `//`).
    "q_win_rows_frame" -> QuerySpec.sql2(
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |w AS (SELECT o_custkey, o_orderkey,
        |             SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents,
        |             SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_cents,
        |             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n,
        |             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
        |      FROM o)
        |SELECT o_custkey, o_orderkey,
        |CAST(run_cents AS DOUBLE) / 100 AS run_sum,
        |CAST(mov_cents div mov_n
        |     + (CASE WHEN 2 * (mov_cents % mov_n) >= mov_n THEN 1 ELSE 0 END)
        |     AS DOUBLE) / 100 AS mov_avg,
        |n_orders
        |FROM w ORDER BY o_custkey, o_orderkey""".stripMargin,
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |w AS (SELECT o_custkey, o_orderkey,
        |             SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cents,
        |             SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_cents,
        |             COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n,
        |             COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
        |      FROM o)
        |SELECT o_custkey, o_orderkey,
        |CAST(run_cents AS DOUBLE) / 100 AS run_sum,
        |CAST(mov_cents // mov_n
        |     + (CASE WHEN 2 * (mov_cents % mov_n) >= mov_n THEN 1 ELSE 0 END)
        |     AS DOUBLE) / 100 AS mov_avg,
        |n_orders
        |FROM w ORDER BY o_custkey, o_orderkey""".stripMargin),

    // GROUPS frame — Spark's window engine has no GROUPS mode, but GROUPS
    // semantics compose from existing operators: aggregate per distinct
    // ORDER BY value, run the equivalent ROWS frame over the deduped
    // groups (one row per distinct value = one GROUPS step), and join the
    // per-group result back to the detail rows. The oracle verifies via an
    // independent formulation (this DuckDB build lacks GROUPS too): a
    // native RANGE frame of ±1 over dense_rank() — rows within one
    // dense-rank step are exactly the adjacent value-groups. All stages
    // are hash shuffles on (partition) / (partition, value) — scale-safe.
    "q_win_groups_frame" -> QuerySpec.sql2(
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_suppkey,
        |                  CAST(l_quantity AS INT) AS qv,
        |                  CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |           FROM lineitem WHERE l_suppkey % 10 = 0),
        |g AS (SELECT l_suppkey, qv, SUM(price) AS gx FROM t GROUP BY l_suppkey, qv),
        |gw AS (SELECT l_suppkey, qv,
        |              CAST(SUM(gx) OVER (PARTITION BY l_suppkey ORDER BY qv
        |                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS gsum
        |       FROM g)
        |SELECT t.l_orderkey, t.l_linenumber, t.l_suppkey, t.qv, gw.gsum
        |FROM t JOIN gw ON t.l_suppkey = gw.l_suppkey AND t.qv = gw.qv
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_suppkey,
        |                  CAST(l_quantity AS INT) AS qv,
        |                  CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
        |                  dense_rank() OVER (PARTITION BY l_suppkey
        |                                     ORDER BY CAST(l_quantity AS INT)) AS dr
        |           FROM lineitem WHERE l_suppkey % 10 = 0)
        |SELECT l_orderkey, l_linenumber, l_suppkey, qv,
        |CAST(SUM(price) OVER (PARTITION BY l_suppkey ORDER BY dr
        |     RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS gsum
        |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // RANGE frame over a numeric ordering key (same cents hardening as
    // q_win_rows_frame — this passed on raw doubles by luck only)
    "q_win_range_frame" -> sql(
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey,
        |CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |      RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS range_sum
        |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin)
  )
}
