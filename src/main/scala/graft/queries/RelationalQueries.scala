package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface of the reference's SQL contract (SURVEY.md §2.B.1-§2.B.7):
  * scans, projections, predicates, all join types, aggregation matrix, sorts,
  * limits, set operations.
  *
  * Everything here delegates to Catalyst-planned DataFrame operations — the
  * reference delegates identically to DataFusion
  * (datafusion-flight-sql-server/src/service.rs:171, 186-190).
  *
  * Determinism rules (SURVEY.md §5.3): every query ends in an explicit
  * ORDER BY on a unique key set; doubles leaving an aggregation are ROUNDed
  * identically on both the Spark and DuckDB oracle side; null ordering is
  * always explicit.
  */
object RelationalQueries {
  import Tables._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scans / projection (§2.B.1, §2.B.2) ----
    "q_scan_project" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    "q_filter_pred" -> ((s, d) =>
      lineitem(s, d)
        .filter((col("l_quantity") > 30 && col("l_discount") <= 0.05) ||
          !(col("l_returnflag") === "N"))
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_filter_in_like" -> ((s, d) =>
      customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") &&
          col("c_name").like("%1%") &&
          col("c_acctbal").between(100.0, 5000.0))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    "q_filter_null_distinct" -> ((s, d) =>
      lineitem(s, d)
        .withColumn("disc_n", nullif(col("l_discount"), lit(0.0)))
        .filter(col("disc_n").isNull || col("disc_n") <=> lit(0.05))
        .filter(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("disc_n"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    "q_case_cast" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"),
          col("o_orderkey").cast("string").as("key_str"),
          expr("try_cast(o_orderstatus AS INT)").as("bad_cast"))
        .filter(col("o_orderkey") % 37 === 0)
        .orderBy(col("o_orderkey"))),

    "q_values_inline" -> ((s, d) =>
      s.sql("SELECT id, tag FROM VALUES (1,'alpha'),(2,'beta'),(3,'gamma') AS t(id, tag) ORDER BY id")),

    "q_unnest" -> ((s, d) =>
      documents(s, d)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .orderBy(col("doc_id"), col("word"))),

    // ---- aggregations (§2.B.4) ----
    "q_agg_q1" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    "q_agg_ungrouped" -> ((s, d) =>
      orders(s, d).agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("o_custkey")).as("n_cust"),
        round(sum(col("o_totalprice")), 2).as("total"),
        round(min(col("o_totalprice")), 2).as("mn"),
        round(max(col("o_totalprice")), 2).as("mx"))),

    "q_agg_having" -> ((s, d) =>
      orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("n_orders") >= 3)
        .orderBy(col("o_custkey"))),

    "q_agg_stats" -> ((s, d) =>
      lineitem(s, d).agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_samp"),
        round(stddev_pop(col("l_quantity")), 4).as("sd_pop"),
        round(var_samp(col("l_quantity")), 4).as("v_samp"),
        round(var_pop(col("l_quantity")), 4).as("v_pop"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("cor"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_s"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cov_p"))),

    "q_agg_filter_clause" -> ((s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n_all"),
          count(when(col("l_quantity") > 25, 1)).as("n_big"),
          round(sum(when(col("l_discount") > 0.05, col("l_extendedprice"))), 2).as("disc_rev"))
        .orderBy(col("l_returnflag"))),

    // ---- joins (§2.B.3) ----
    "q_join_inner" -> ((s, d) =>
      lineitem(s, d).join(orders(s, d),
          col("l_orderkey") === col("o_orderkey"), "inner")
        .filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), col("l_linenumber"), col("o_custkey"), col("l_partkey"))
        .orderBy(col("o_orderkey"), col("l_linenumber"))),

    "q_join_left" -> ((s, d) =>
      customer(s, d).join(
          orders(s, d).filter(col("o_totalprice") > 450000),
          col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
        .orderBy(col("c_custkey"), col("ok"))),

    "q_join_right" -> ((s, d) =>
      orders(s, d).filter(col("o_totalprice") > 450000)
        .join(customer(s, d), col("c_custkey") === col("o_custkey"), "right")
        .select(col("c_custkey"), coalesce(col("o_orderkey"), lit(-1L)).as("ok"))
        .orderBy(col("c_custkey"), col("ok"))),

    "q_join_full" -> ((s, d) => {
      val big = orders(s, d).filter(col("o_totalprice") > 450000)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_big"))
      val rich = customer(s, d).filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      rich.join(big, col("c_custkey") === col("o_custkey"), "full")
        .select(
          coalesce(col("c_custkey"), lit(-1L)).as("ck"),
          coalesce(col("o_custkey"), lit(-1L)).as("ok"),
          coalesce(col("n_big"), lit(0L)).as("n_big"))
        .orderBy(col("ck"), col("ok"))
    }),

    "q_join_semi" -> ((s, d) =>
      customer(s, d).join(
          orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "q_join_anti" -> ((s, d) =>
      customer(s, d).join(
          orders(s, d).filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    "q_join_cross" -> ((s, d) =>
      region(s, d).crossJoin(nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))),

    "q_join_theta" -> ((s, d) => {
      val s1 = supplier(s, d).select(col("s_suppkey").as("k1"), col("s_acctbal").as("b1"))
      val s2 = supplier(s, d).select(col("s_suppkey").as("k2"), col("s_acctbal").as("b2"))
      s1.join(s2, col("k1") < col("k2") && col("b1") > col("b2"))
        .select(col("k1"), col("k2"))
        .orderBy(col("k1"), col("k2"))
    }),

    "q_join_range" -> ((s, d) =>
      lineitem(s, d).join(orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_early"))
        .orderBy(col("o_orderkey"))),

    "q_join_using" -> ((s, d) => {
      val n = nation(s, d).select(col("n_nationkey").as("nationkey"), col("n_name"))
      val c = customer(s, d).select(col("c_nationkey").as("nationkey"), col("c_custkey"))
      n.join(c, Seq("nationkey"))
        .select(col("nationkey"), col("n_name"), col("c_custkey"))
        .orderBy(col("nationkey"), col("c_custkey"))
    }),

    "q_join_derived" -> ((s, d) => {
      val topc = orders(s, d).groupBy(col("o_custkey"))
        .agg(round(sum(col("o_totalprice")), 2).as("spend"))
        .filter(col("spend") > 800000)
      customer(s, d).join(topc, col("c_custkey") === col("o_custkey"), "inner")
        .select(col("c_custkey"), col("c_name"), col("spend"))
        .orderBy(col("c_custkey"))
    }),

    // ---- sorts / limits (§2.B.6) ----
    "q_sort_nulls" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_orderkey") % 200 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("disc_n"))
        .orderBy(col("disc_n").asc_nulls_first, col("l_orderkey"), col("l_linenumber"))),

    "q_sort_multi_desc" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .orderBy(col("o_orderpriority").desc, col("o_totalprice").asc, col("o_orderkey"))
        .limit(100)),

    "q_limit_offset" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .offset(100).limit(50)),

    // ---- set operations (§2.B.7) ----
    "q_union_all" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      a.union(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    }),

    "q_union_distinct" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    }),

    "q_intersect" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    }),

    "q_intersect_all" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      a.intersectAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    }),

    "q_except" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      a.except(b).orderBy(col("o_custkey"))
    }),

    "q_except_all" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_totalprice") > 200000).select(col("o_custkey"))
      a.exceptAll(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    }),

    "q_distinct" -> ((s, d) =>
      lineitem(s, d).select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |ROUND(l_extendedprice * (1 - l_discount), 2) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q_filter_pred" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE ((l_quantity > 30 AND l_discount <= 0.05) OR NOT (l_returnflag = 'N'))
        |AND l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_in_like" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_name LIKE '%1%'
        |AND c_acctbal BETWEEN 100.0 AND 5000.0
        |ORDER BY c_custkey""".stripMargin,

    "q_filter_null_distinct" ->
      """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_n FROM lineitem
        |WHERE (NULLIF(l_discount, 0.0) IS NULL OR NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM 0.05)
        |AND l_orderkey % 50 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_case_cast" ->
      """SELECT o_orderkey,
        |CASE WHEN o_totalprice > 300000 THEN 'big' WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket,
        |CAST(o_orderkey AS VARCHAR) AS key_str,
        |TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast
        |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_values_inline" ->
      "SELECT id, tag FROM (VALUES (1,'alpha'),(2,'beta'),(3,'gamma')) AS t(id, tag) ORDER BY id",

    "q_unnest" ->
      """SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
        |WHERE doc_id % 50 = 0 ORDER BY doc_id, word""".stripMargin,

    "q_agg_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |ROUND(SUM(l_quantity), 2) AS sum_qty,
        |ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |ROUND(AVG(l_quantity), 4) AS avg_qty,
        |ROUND(AVG(l_discount), 4) AS avg_disc,
        |COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_ungrouped" ->
      """SELECT COUNT(*) AS cnt, COUNT(DISTINCT o_custkey) AS n_cust,
        |ROUND(SUM(o_totalprice), 2) AS total,
        |ROUND(MIN(o_totalprice), 2) AS mn, ROUND(MAX(o_totalprice), 2) AS mx
        |FROM orders""".stripMargin,

    "q_agg_having" ->
      """SELECT o_custkey, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3
        |ORDER BY o_custkey""".stripMargin,

    "q_agg_stats" ->
      """SELECT ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_samp,
        |ROUND(STDDEV_POP(l_quantity), 4) AS sd_pop,
        |ROUND(VAR_SAMP(l_quantity), 4) AS v_samp,
        |ROUND(VAR_POP(l_quantity), 4) AS v_pop,
        |ROUND(CORR(l_quantity, l_extendedprice), 4) AS cor,
        |ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS cov_s,
        |ROUND(COVAR_POP(l_quantity, l_extendedprice), 2) AS cov_p
        |FROM lineitem""".stripMargin,

    "q_agg_filter_clause" ->
      """SELECT l_returnflag, COUNT(*) AS n_all,
        |COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |ROUND(SUM(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS disc_rev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_join_inner" ->
      """SELECT o_orderkey, l_linenumber, o_custkey, l_partkey
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 400000
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,

    "q_join_left" ->
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey, ok""".stripMargin,

    "q_join_right" ->
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS ok
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450000) o RIGHT JOIN customer
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey, ok""".stripMargin,

    "q_join_full" ->
      """SELECT COALESCE(r.c_custkey, -1) AS ck, COALESCE(b.o_custkey, -1) AS ok,
        |COALESCE(b.n_big, 0) AS n_big
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) r
        |FULL OUTER JOIN
        |(SELECT o_custkey, COUNT(*) AS n_big FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey) b
        |ON r.c_custkey = b.o_custkey
        |ORDER BY ck, ok""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",

    "q_join_theta" ->
      """SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2
        |FROM supplier s1 JOIN supplier s2
        |ON s1.s_suppkey < s2.s_suppkey AND s1.s_acctbal > s2.s_acctbal
        |ORDER BY k1, k2""".stripMargin,

    "q_join_range" ->
      """SELECT o_orderkey, COUNT(*) AS n_early
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |AND l_shipdate >= o_orderdate AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_join_using" ->
      """SELECT nationkey, n_name, c_custkey
        |FROM (SELECT n_nationkey AS nationkey, n_name FROM nation) n
        |JOIN (SELECT c_nationkey AS nationkey, c_custkey FROM customer) c USING (nationkey)
        |ORDER BY nationkey, c_custkey""".stripMargin,

    "q_join_derived" ->
      """SELECT c_custkey, c_name, spend FROM customer
        |JOIN (SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS spend FROM orders
        |      GROUP BY o_custkey HAVING ROUND(SUM(o_totalprice), 2) > 800000) t
        |ON c_custkey = o_custkey ORDER BY c_custkey""".stripMargin,

    "q_sort_nulls" ->
      """SELECT l_orderkey, l_linenumber, NULLIF(l_discount, 0.0) AS disc_n
        |FROM lineitem WHERE l_orderkey % 200 = 0
        |ORDER BY disc_n ASC NULLS FIRST, l_orderkey, l_linenumber""".stripMargin,

    "q_sort_multi_desc" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority DESC, o_totalprice ASC, o_orderkey LIMIT 100""".stripMargin,

    "q_limit_offset" ->
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100",

    "q_union_all" ->
      """SELECT o_custkey, COUNT(*) AS n FROM (
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000) u
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_custkey, COUNT(*) AS n FROM (
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000) u
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """(SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
        |ORDER BY o_custkey""".stripMargin,

    "q_except_all" ->
      """SELECT o_custkey, COUNT(*) AS n FROM (
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 200000) u
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
