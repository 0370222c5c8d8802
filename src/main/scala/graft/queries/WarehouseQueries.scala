package graft.queries

import graft.queries.QuerySpec.{sql, sql2}

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
  private val scd2 =
    """WITH ch AS (SELECT o_custkey AS key, o_orderdate AS ts,
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
      |        FROM st)
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

  val specs: Map[String, QuerySpec] = Map(
    "q_dim_scd2" -> sql(scd2),
    "q_layout_range_partition" -> sql2(rangePartSpark, rangePartDuck)
  )
}
