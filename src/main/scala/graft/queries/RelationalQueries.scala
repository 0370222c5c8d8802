package graft.queries

import QuerySpec.{sql, sql2}

/** Core relational surface of the reference's SQL contract
  * (SURVEY.md §2.B.1-§2.B.7): scans, projections, predicates, all join
  * types, aggregation matrix, sorts, limits, set operations.
  *
  * Round 2 moved every query onto the SQL-text surface (`spark.sql` after
  * temp-view registration) because that IS the reference's contract — a
  * client hands the server a SQL string
  * (datafusion-flight-sql-server/src/service.rs:171) — and Catalyst plans
  * the text exactly as it plans the equivalent DataFrame program. Where the
  * Spark and DuckDB dialects agree the same string doubles as the oracle.
  *
  * Determinism rules (SURVEY.md §5.3): every query ends in an explicit
  * ORDER BY on a unique key set; doubles leaving an aggregation are ROUNDed
  * identically on both sides; null ordering is always explicit.
  */
object RelationalQueries {

  val specs: Map[String, QuerySpec] = Map(
    // ---- scans / projection (§2.B.1, §2.B.2) ----
    "q_scan_project" -> sql(
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |ROUND(l_extendedprice * (1 - l_discount), 2) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin),

    "q_filter_pred" -> sql(
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE ((l_quantity > 30 AND l_discount <= 0.05) OR NOT (l_returnflag = 'N'))
        |AND l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    "q_filter_in_like" -> sql(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_name LIKE '%1%'
        |AND c_acctbal BETWEEN 100.0 AND 5000.0
        |ORDER BY c_custkey""".stripMargin),

    // Spark spells IS NOT DISTINCT FROM as the null-safe-equal operator <=>.
    "q_filter_null_distinct" -> sql2(
      """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_n FROM lineitem
        |WHERE (NULLIF(l_discount, 0.0) IS NULL OR NULLIF(l_discount, 0.0) <=> 0.05)
        |AND l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
      """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_n FROM lineitem
        |WHERE (NULLIF(l_discount, 0.0) IS NULL OR NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM 0.05)
        |AND l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    "q_case_cast" -> sql2(
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice > 300000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        |CAST(o_orderkey AS STRING) AS key_str,
        |TRY_CAST(o_orderstatus AS INT) AS bad_cast
        |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice > 300000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        |CAST(o_orderkey AS VARCHAR) AS key_str,
        |TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast
        |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin),

    "q_values_inline" -> sql2(
      "SELECT id, tag FROM VALUES (1,'alpha'),(2,'beta'),(3,'gamma') AS t(id, tag) ORDER BY id",
      "SELECT id, tag FROM (VALUES (1,'alpha'),(2,'beta'),(3,'gamma')) AS t(id, tag) ORDER BY id"),

    "q_unnest" -> sql2(
      """SELECT doc_id, word FROM documents
        |LATERAL VIEW explode(split(text, ' ')) t AS word
        |WHERE doc_id % 50 = 0 ORDER BY doc_id, word""".stripMargin,
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |WHERE doc_id % 50 = 0 ORDER BY doc_id, word""".stripMargin),

    // ---- aggregations (§2.B.4) ----
    // Money/qty folds run in DECIMAL(18,2) (the fixture doubles carry exactly
    // 2 decimals, so the cast is lossless) because double SUM accumulation
    // order differs between Spark's partial aggregation and DuckDB — decimal
    // sums are bit-identical on both engines. AVG = exact decimal SUM / COUNT
    // to sidestep engine-specific decimal-AVG scale rules.
    "q_agg_q1" -> sql(
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |/ COUNT(l_quantity) AS avg_qty,
        |CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |/ COUNT(l_discount) AS avg_disc,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    "q_agg_ungrouped" -> sql(
      """SELECT COUNT(*) AS cnt, COUNT(DISTINCT o_custkey) AS n_cust,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |ROUND(MIN(o_totalprice), 2) AS mn, ROUND(MAX(o_totalprice), 2) AS mx
        |FROM orders""".stripMargin),

    "q_agg_having" -> sql(
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
        |ORDER BY o_custkey""".stripMargin),

    // PIVOT: wide-format conditional aggregation (Spark's native PIVOT
    // clause; physical plan is a single hash aggregate over CASE
    // projections — no extra shuffle vs plain GROUP BY). Oracle spells the
    // identical semantics as FILTERed aggregates, so the two sides are
    // independent formulations. Money sums in lossless DECIMAL(18,2).
    "q_pivot" -> sql2(
      """SELECT o_orderpriority,
        |       CAST(st_o AS DOUBLE) AS rev_o,
        |       CAST(st_f AS DOUBLE) AS rev_f,
        |       CAST(st_p AS DOUBLE) AS rev_p
        |FROM (SELECT o_orderpriority, o_orderstatus,
        |             CAST(o_totalprice AS DECIMAL(18,2)) AS tp FROM orders)
        |PIVOT (SUM(tp) FOR o_orderstatus IN ('O' AS st_o, 'F' AS st_f, 'P' AS st_p))
        |ORDER BY o_orderpriority""".stripMargin,
      """SELECT o_orderpriority,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS rev_o,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_f,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS rev_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin),

    // UNPIVOT: long-format melt (Spark's native UNPIVOT clause, a
    // Generate/Expand — no shuffle at all). INCLUDE NULLS so the semantics
    // equal the oracle's UNION ALL exactly even for null measures.
    "q_unpivot" -> sql2(
      """SELECT c_custkey, metric, val
        |FROM (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal,
        |             CAST(c_nationkey AS DOUBLE) AS nationkey
        |      FROM customer WHERE c_custkey % 10 = 0)
        |UNPIVOT INCLUDE NULLS (val FOR metric IN (acctbal, nationkey))
        |ORDER BY c_custkey, metric""".stripMargin,
      """SELECT c_custkey, 'acctbal' AS metric, CAST(c_acctbal AS DOUBLE) AS val
        |FROM customer WHERE c_custkey % 10 = 0
        |UNION ALL
        |SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
        |FROM customer WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey, metric""".stripMargin),

    // Residual cross-engine risk: stddev/var/corr/covar accumulate in double
    // internally in BOTH engines (no decimal form exists), so last-ulp drift
    // is possible in principle; ROUND granularity (1e-4 on sd≈14, 1e-2 on
    // cov≈1e4) sits ~1e7× above the observed drift (~1e-11 relative), so the
    // boundary-collision probability is negligible — documented, not fixable
    // without abandoning the §2.B.4 stats functions themselves.
    "q_agg_stats" -> sql(
      """SELECT ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_samp,
        |ROUND(STDDEV_POP(l_quantity), 4) AS sd_pop,
        |ROUND(VAR_SAMP(l_quantity), 4) AS v_samp,
        |ROUND(VAR_POP(l_quantity), 4) AS v_pop,
        |ROUND(CORR(l_quantity, l_extendedprice), 4) AS cor,
        |ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_s,
        |ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS cov_p
        |FROM lineitem""".stripMargin),

    // The SQL FILTER clause itself (§2.B.4 row) — parsed by our engine now,
    // not emulated via count(when(...)).
    "q_agg_filter_clause" -> sql(
      """SELECT l_returnflag, COUNT(*) AS n_all,
        |COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
        |     FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS disc_rev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // ---- joins (§2.B.3) ----
    "q_join_inner" -> sql(
      """SELECT o_orderkey, l_linenumber, o_custkey, l_partkey
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey, l_linenumber""".stripMargin),

    "q_join_left" -> sql(
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey, ok""".stripMargin),

    "q_join_right" -> sql(
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o RIGHT JOIN customer
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey, ok""".stripMargin),

    "q_join_full" -> sql(
      """SELECT COALESCE(r.c_custkey, -1) AS ck, COALESCE(b.o_custkey, -1) AS ok,
        |COALESCE(b.n_big, 0) AS n_big
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) r
        |FULL OUTER JOIN
        |(SELECT o_custkey, COUNT(*) AS n_big FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey) b
        |ON r.c_custkey = b.o_custkey
        |ORDER BY ck, ok""".stripMargin),

    "q_join_semi" -> sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    "q_join_anti" -> sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin),

    "q_join_cross" -> sql(
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"),

    // Theta join parity row. The BroadcastNestedLoopJoin plan this produces
    // is O(n²) by nature; the scale-safe banded formulation is
    // q_join_theta_banded (LlmPipeline-adjacent pattern, see AggQueries).
    "q_join_theta" -> sql(
      """SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2
        |FROM supplier s1 JOIN supplier s2
        |ON s1.s_suppkey < s2.s_suppkey AND s1.s_acctbal > s2.s_acctbal
        |ORDER BY k1, k2""".stripMargin),

    "q_join_range" -> sql(
      """SELECT o_orderkey, COUNT(*) AS n_early
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin),

    // As-of join (click→purchase attribution): each purchase matched to the
    // latest click at-or-before it by the same user. The reference line
    // declares as-of a non-goal (DataFusion 53 has none), so this is
    // beyond-parity surface; the Spark formulation is the scale-safe one —
    // union-tag both sides and take a running MAX over a window partitioned
    // by user_id (ONE shuffle on the join key, no range join, no
    // BroadcastNestedLoop). Ordering (ts, event_type) puts 'click' before
    // 'purchase' at equal ts, matching the oracle's c.ts <= p.ts bound.
    // The oracle is DuckDB's native ASOF LEFT JOIN — an independent engine
    // implementation of the same semantics, not a mirrored rewrite.
    "q_join_asof" -> sql2(
      """WITH u AS (SELECT user_id, ts, event_id, event_type FROM events
        |           WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT user_id, ts, event_id, event_type,
        |             MAX(CASE WHEN event_type = 'click' THEN ts END)
        |               OVER (PARTITION BY user_id ORDER BY ts, event_type
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
        |      FROM u)
        |SELECT event_id, user_id, ts, click_ts,
        |       unix_micros(CAST(ts AS TIMESTAMP)) - unix_micros(CAST(click_ts AS TIMESTAMP)) AS gap_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
      """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
        |       epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY event_id""".stripMargin),

    // As-of join WITH TOLERANCE (pandas merge_asof's `tolerance`): the
    // nearest prior click still matches only if it happened within 2 h of
    // the purchase — stale context must not attribute. Same single-shuffle
    // running-MAX plan as q_join_asof with a conditional null-out at the
    // edge; the oracle nulls the SAME bound on top of DuckDB's native ASOF
    // result (two engines, two strategies, one answer).
    "q_join_asof_tolerance" -> sql2(
      """WITH u AS (SELECT user_id, ts, event_id, event_type FROM events
        |           WHERE event_type IN ('click', 'purchase')),
        |w AS (SELECT user_id, ts, event_id, event_type,
        |             MAX(CASE WHEN event_type = 'click' THEN ts END)
        |               OVER (PARTITION BY user_id ORDER BY ts, event_type
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts
        |      FROM u),
        |g AS (SELECT event_id, user_id, ts, click_ts,
        |             unix_micros(CAST(ts AS TIMESTAMP))
        |               - unix_micros(CAST(click_ts AS TIMESTAMP)) AS gap_us
        |      FROM w WHERE event_type = 'purchase')
        |SELECT event_id, user_id, ts,
        |       CASE WHEN gap_us <= 7200000000 THEN click_ts END AS click_ts,
        |       CASE WHEN gap_us <= 7200000000 THEN gap_us END AS gap_us,
        |       CAST(CASE WHEN gap_us <= 7200000000 THEN 1 ELSE 0 END AS INT) AS matched
        |FROM g ORDER BY event_id""".stripMargin,
      """WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
        |p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
        |             epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts)
        |SELECT event_id, user_id, ts,
        |       CASE WHEN gap_us <= 7200000000 THEN click_ts END AS click_ts,
        |       CASE WHEN gap_us <= 7200000000 THEN gap_us END AS gap_us,
        |       CAST(CASE WHEN gap_us <= 7200000000 THEN 1 ELSE 0 END AS INT) AS matched
        |FROM g ORDER BY event_id""".stripMargin),

    "q_join_using" -> sql(
      """SELECT nationkey, n_name, c_custkey
        |FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) n
        |JOIN (SELECT c_nationkey AS nationkey, c_custkey FROM customer) c USING (nationkey)
        |ORDER BY nationkey, c_custkey""".stripMargin),

    "q_join_derived" -> sql(
      """SELECT c_custkey, c_name, spend FROM customer
        |JOIN (SELECT o_custkey,
        |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |      FROM orders GROUP BY o_custkey
        |      HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 800000) t
        |ON c_custkey = o_custkey ORDER BY c_custkey""".stripMargin),

    // Correlated LATERAL derived table with per-row ORDER BY + LIMIT —
    // the SQL-standard per-key top-1 shape (Spark decorrelates it into a
    // window/aggregate; DuckDB executes the lateral directly — two
    // independent strategies, one answer).
    "q_join_lateral" -> QuerySpec.sql2(
      """SELECT c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS top_price
        |FROM customer JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |WHERE c_custkey % 29 = 0
        |ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey, t.o_orderkey, ROUND(t.o_totalprice, 2) AS top_price
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
        |WHERE c_custkey % 29 = 0
        |ORDER BY c_custkey""".stripMargin),

    // GROUP BY ALL / ORDER BY ALL: both engines infer the grouping keys
    // from the non-aggregate select list (identical inference rules here).
    // ORDER BY ALL cannot carry NULLS FIRST/LAST and the engine defaults
    // DIVERGE (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST) — this
    // row is deterministic ONLY because every inferred key is a non-null
    // TPC-H column; do not copy the pattern onto nullable keys.
    "q_agg_group_by_all" -> sql(
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |FROM orders GROUP BY ALL ORDER BY ALL""".stripMargin),

    // ---- sorts / limits (§2.B.6) ----
    "q_sort_nulls" -> sql(
      """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_n
        |FROM lineitem WHERE l_orderkey % 200 = 0
        |ORDER BY disc_n ASC NULLS FIRST, l_orderkey, l_linenumber""".stripMargin),

    "q_sort_multi_desc" -> sql(
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority DESC, o_totalprice ASC, o_orderkey LIMIT 100""".stripMargin),

    "q_limit_offset" -> sql(
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100"),

    // ---- set operations (§2.B.7) ----
    "q_union_all" -> sql(
      """SELECT o_custkey, COUNT(*) AS n FROM (
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000) u
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),

    "q_union_distinct" -> sql(
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_custkey""".stripMargin),

    "q_intersect" -> sql(
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY o_custkey""".stripMargin),

    "q_intersect_all" -> sql(
      """SELECT o_custkey, COUNT(*) AS n FROM (
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000) u
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),

    "q_except" -> sql(
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY o_custkey""".stripMargin),

    "q_except_all" -> sql(
      """SELECT o_custkey, COUNT(*) AS n FROM (
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000) u
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),

    "q_distinct" -> sql(
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // DISTINCT ON (postgres-style first-row-per-key, in DataFusion's SQL
    // surface): Spark has no DISTINCT ON clause — the equivalent is the
    // ranked-window top-1, which Catalyst executes as WindowGroupLimit
    // (per-group limit pushed below the sort, no full per-group
    // materialization). Oracle = DuckDB's native DISTINCT ON, an
    // independent engine implementation of the same semantics.
    "q_distinct_on" -> sql2(
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
      """SELECT o_custkey, o_orderkey, o_orderdate
        |FROM (SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
        |      FROM orders ORDER BY o_custkey, o_orderdate DESC, o_orderkey) t
        |ORDER BY o_custkey""".stripMargin),

    // Wildcard modifiers (DataFusion supports SELECT * EXCEPT/EXCLUDE):
    // Spark 4 spells it EXCEPT, DuckDB EXCLUDE — same projection pruning
    // (the scan reads only the surviving columns).
    "q_select_except" -> sql2(
      """SELECT * EXCEPT (text) FROM documents WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin,
      """SELECT * EXCLUDE (text) FROM documents WHERE doc_id % 5 = 0
        |ORDER BY doc_id""".stripMargin),

    // ILIKE (case-insensitive LIKE, in DataFusion's SQL surface since its
    // postgres-dialect parser) + LIKE ... ESCAPE with a custom escape
    // character. Both spell identically in Spark and DuckDB.
    "q_filter_ilike" -> sql(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment ILIKE '%build%'
        |AND c_name NOT ILIKE '%ZZZZ%'
        |AND c_name LIKE 'Customer#%' ESCAPE '|'
        |ORDER BY c_custkey""".stripMargin)
  )
}
