package graft.queries

import QuerySpec.{dfOnly, sql}

/** Query-structure surface (SURVEY.md §2.B.9): CTEs (incl. recursive),
  * scalar / correlated / IN subqueries, EXPLAIN, SET, SHOW.
  *
  * EXPLAIN/SET/SHOW produce engine-specific catalogs/plans, so they are
  * rows-only checks (no DuckDB-comparable output) — mirroring how the
  * reference returns them as ordinary result sets through the same endpoint
  * (datafusion-flight-sql-server/src/service.rs:171 accepts any statement).
  */
object StructureQueries {

  val specs: Map[String, QuerySpec] = Map(
    "q_cte" -> sql(
      """WITH big AS (SELECT o_custkey, SUM(o_totalprice) AS spend FROM orders GROUP BY o_custkey),
        |     cnt AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
        |SELECT b.o_custkey, ROUND(b.spend, 2) AS spend, c.n
        |FROM big b JOIN cnt c ON b.o_custkey = c.o_custkey
        |WHERE b.spend > 900000 ORDER BY b.o_custkey""".stripMargin),

    "q_cte_recursive" -> sql(
      """WITH RECURSIVE r AS (
        |  SELECT 1 AS n, CAST(1 AS BIGINT) AS f
        |  UNION ALL
        |  SELECT n + 1, f * (n + 1) FROM r WHERE n < 12)
        |SELECT n, f FROM r ORDER BY n""".stripMargin),

    "q_subquery_scalar" -> sql(
      """SELECT o_orderkey,
        |       CAST(CAST(FLOOR(o_totalprice * 1.0E2 + 0.5E0) AS BIGINT) AS DOUBLE)
        |       * (SELECT COUNT(*) FROM orders)
        |       / (SELECT SUM(CAST(FLOOR(o_totalprice * 1.0E2 + 0.5E0) AS BIGINT)) FROM orders) AS ratio
        |FROM orders WHERE o_orderkey % 173 = 0 ORDER BY o_orderkey""".stripMargin),

    "q_subquery_correlated" -> sql(
      """SELECT c_custkey,
        |(SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer WHERE c_custkey % 97 = 0 ORDER BY c_custkey""".stripMargin),

    "q_subquery_in" -> sql(
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9900)
        |AND o_orderkey % 11 = 0 ORDER BY o_orderkey""".stripMargin),

    "q_explain" -> dfOnly((s, d) => {
      Tables.registerAll(s, d)
      s.sql("EXPLAIN FORMATTED SELECT o_custkey, COUNT(*) FROM orders GROUP BY o_custkey")
    }),

    "q_set" -> dfOnly((s, d) => {
      // SET k=v then SET k — the reference routes SET through the prepared
      // update path (service.rs:872-874); our surface is the same SQL text.
      s.sql("SET spark.sql.autoBroadcastJoinThreshold=10485760")
      s.sql("SET spark.sql.autoBroadcastJoinThreshold")
    }),

    "q_show" -> dfOnly((s, d) => {
      Tables.registerAll(s, d)
      s.sql("SHOW TABLES")
    }),

    // DESCRIBE — same engine-specific-output family as EXPLAIN/SHOW
    // (DataFusion's DESCRIBE is delegated through the same SQL-text entry,
    // service.rs:171); rows-only check by design.
    "q_describe" -> dfOnly((s, d) => {
      Tables.registerAll(s, d)
      s.sql("DESCRIBE TABLE orders")
    })
  )
}
