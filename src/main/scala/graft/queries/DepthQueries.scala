package graft.queries

import QuerySpec.{sql, sql2}

/** Depth pass over the delegated surface: TPC-H-shaped multi-join
  * flagships (the plans a 100 TB user actually runs — dimension broadcasts
  * + fact-fact shuffle joins + partial aggregation), the skew-safe
  * two-phase exact-distinct pattern, and wider scalar-function coverage
  * per §2.B.8 family.
  */
object DepthQueries {

  /** 16-bit Morton (z-order) bit-spread in SQL, shared by both dialects
    * modulo the shift operator: the classic mask ladder
    * 0x00FF00FF → 0x0F0F0F0F → 0x33333333 → 0x55555555. Pure integer
    * arithmetic, so Spark and DuckDB agree bit-for-bit.
    */
  private def mortonSql(shl: (String, Int) => String): String = {
    def spread(col: String): String = {
      val s1 = s"(($col | ${shl(col, 8)}) & 16711935)"
      val s2 = s"(($s1 | ${shl(s1, 4)}) & 252645135)"
      val s3 = s"(($s2 | ${shl(s2, 2)}) & 858993459)"
      s"(($s3 | ${shl(s3, 1)}) & 1431655765)"
    }
    s"""WITH t AS (SELECT o_orderkey,
       |           o_custkey % 65536 AS x, o_orderkey % 65536 AS y
       |           FROM orders WHERE o_orderkey % 23 = 0)
       |SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       |       CAST(${spread("x")} | ${shl(spread("y"), 1)} AS BIGINT) AS zkey
       |FROM t ORDER BY o_orderkey""".stripMargin
  }

  /** Spark side of the z-key (used by the locality property test too). */
  private[queries] def mortonSpark: String =
    mortonSql((c, n) => s"shiftleft($c, $n)")

  /** Hilbert-curve layout key (order-16, d=2) — the stronger locality
    * cousin of [[mortonSql]]'s Z-order: consecutive Hilbert cells are
    * ALWAYS grid neighbors (|Δx|+|Δy| = 1), where Morton takes long
    * diagonal jumps at power-of-two boundaries, so Hilbert-sorted row
    * groups have strictly tighter per-dimension min/max envelopes (the
    * reason Databricks liquid clustering and Iceberg moved past Z-order).
    * Standard xy→d transform (the rot/flip walk of Hilbert 1891 as the
    * bit-pair recurrence): 16 unrolled rounds, each deciding one base-4
    * digit q = (3·rx) XOR ry from the current bit pair and rotating the
    * frame — expressed as pure CASE arithmetic on non-negative integers
    * ((x DIV s) % 2 for the bit probes; no dialect-split shift/XOR
    * anywhere), so both engines walk the identical integer recurrence.
    * Each round's CTE has exactly ONE consumer — linear under SQL-text
    * CTE re-inlining. At 100 TB: one scan computing hkey, then
    * sortWithinPartitions(hkey) on write, same as the Z-order note;
    * HilbertSpec pins the unit-step property and the tighter-than-Morton
    * row-group envelopes.
    */
  private def hilbertSql(intDiv: String): String = {
    val rounds = (15 to 0 by -1).map { bit =>
      val s = 1 << bit
      val i = 15 - bit
      val (prev, cur) = (s"h$i", s"h${i + 1}")
      s"""$cur AS (SELECT o_orderkey, ox, oy,
         |  CASE WHEN ($prev.y $intDiv $s) % 2 = 1 THEN $prev.x
         |       WHEN ($prev.x $intDiv $s) % 2 = 0 THEN $prev.y
         |       ELSE 65535 - $prev.y END AS x,
         |  CASE WHEN ($prev.y $intDiv $s) % 2 = 1 THEN $prev.y
         |       WHEN ($prev.x $intDiv $s) % 2 = 0 THEN $prev.x
         |       ELSE 65535 - $prev.x END AS y,
         |  d + ${s.toLong * s} * (CASE WHEN ($prev.x $intDiv $s) % 2 = 0
         |                              THEN ($prev.y $intDiv $s) % 2
         |                              ELSE 3 - ($prev.y $intDiv $s) % 2 END) AS d
         |  FROM $prev)""".stripMargin
    }.mkString(",\n")
    s"""WITH h0 AS (SELECT o_orderkey,
       |           o_custkey % 65536 AS ox, o_orderkey % 65536 AS oy,
       |           o_custkey % 65536 AS x, o_orderkey % 65536 AS y,
       |           CAST(0 AS BIGINT) AS d
       |           FROM orders WHERE o_orderkey % 23 = 0),
       |$rounds
       |SELECT o_orderkey, CAST(ox AS BIGINT) AS x, CAST(oy AS BIGINT) AS y,
       |       CAST(d AS BIGINT) AS hkey
       |FROM h16 ORDER BY o_orderkey""".stripMargin
  }

  /** Spark side of the Hilbert key (HilbertSpec drives it directly). */
  private[queries] def hilbertSpark: String = hilbertSql("DIV")

  /** Bloom-filter semi-join reduction — THE runtime-filter pattern behind
    * every 100 TB fact⋈dim join (Spark's own runtime row-level filtering /
    * Bloom-pruned shuffle joins, and the sideways-information-passing in
    * Trino/Hive): hash the filtered dimension's join keys into a 16384-bit
    * Bloom filter (261 words of 63 usable bits each — bit 63 stays clear
    * because DuckDB range-checks shifts into the sign bit — with 2 probes
    * per key; the two hashes are the low/high 14-bit windows of one Knuth
    * multiplicative hash, exact BIGINT arithmetic, engine-identical),
    * broadcast the ≤261-row word
    * table, and prune fact rows BEFORE they reach the join shuffle. The
    * query audits itself in ONE fact scan: per-row bloom verdict + exact
    * dim membership side by side → pass/match/false-positive counts, the
    * observed fp rate, and a no-false-negative proof column (Bloom filters
    * may over-admit, never drop — `nfn_ok` = 1 pins it). At 100 TB the
    * fact scan is the expensive side; the 2 KiB filter rides the broadcast
    * and the ~80% of rows it rejects never pay the exchange.
    * (Fixture keys are < 2^24, so key·2654435761 < 2^63 — a larger key
    * domain folds the key to 32 bits first, same discipline.)
    */
  private def bloomPrunedSql(intDiv: String): String =
    s"""WITH dimk AS (SELECT DISTINCT o_orderkey AS k FROM orders
       |             WHERE o_orderpriority = '1-URGENT'),
       |dh AS (SELECT k, (k * 2654435761) % 16384 AS h1,
       |              ((k * 2654435761) $intDiv 16384) % 16384 AS h2 FROM dimk),
       |bits AS (SELECT h1 AS h FROM dh UNION ALL SELECT h2 AS h FROM dh),
       |bw AS (SELECT w, bit_or(CAST(1 AS BIGINT) << CAST(b AS INT)) AS bm
       |       FROM (SELECT h $intDiv 63 AS w, h % 63 AS b FROM bits) t GROUP BY w),
       |fh AS (SELECT l_orderkey AS k, (l_orderkey * 2654435761) % 16384 AS h1,
       |              ((l_orderkey * 2654435761) $intDiv 16384) % 16384 AS h2
       |       FROM lineitem),
       |fe AS (SELECT CASE WHEN (COALESCE(w1.bm, 0) & (CAST(1 AS BIGINT) << CAST(fh.h1 % 63 AS INT))) != 0
       |                    AND (COALESCE(w2.bm, 0) & (CAST(1 AS BIGINT) << CAST(fh.h2 % 63 AS INT))) != 0
       |                   THEN 1 ELSE 0 END AS pass,
       |              CASE WHEN d.k IS NOT NULL THEN 1 ELSE 0 END AS m
       |       FROM fh LEFT JOIN bw w1 ON w1.w = fh.h1 $intDiv 63
       |               LEFT JOIN bw w2 ON w2.w = fh.h2 $intDiv 63
       |               LEFT JOIN dimk d ON fh.k = d.k)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_fact,
       |       CAST(SUM(pass) AS BIGINT) AS n_pass_bloom,
       |       CAST(SUM(m) AS BIGINT) AS n_match_exact,
       |       CAST(SUM(pass) - SUM(m) AS BIGINT) AS n_false_pos,
       |       CAST(SUM(pass) - SUM(m) AS DOUBLE) / CAST(COUNT(*) - SUM(m) AS BIGINT) AS fp_rate,
       |       CAST(MIN(CASE WHEN m = 1 THEN pass ELSE 1 END) AS INT) AS nfn_ok
       |FROM fe""".stripMargin

  val specs: Map[String, QuerySpec] = Map(
    "q_join_bloom_pruned" -> sql2(bloomPrunedSql("DIV"), bloomPrunedSql("//")),
    // Z-order (Morton) layout key: interleave the bits of two columns so
    // sorting by one key clusters BOTH dimensions — the multi-column data
    // -layout lever behind Delta/Iceberg Z-ORDER clustering. At 100 TB
    // the pipeline computes zkey, sortWithinPartitions(zkey) on write,
    // and min/max row-group stats then prune on EITHER column's
    // predicate. Pure integer bit-spread, exact in both engines;
    // ZOrderSpec pins the locality property that justifies the layout.
    "q_layout_zorder" -> sql2(
      mortonSpark,
      mortonSql((c, n) => s"($c << $n)")),

    "q_layout_hilbert" -> sql2(hilbertSpark, hilbertSql("//")),

    // TPC-H Q5 shape: 6-table join; region/nation/supplier broadcast,
    // lineitem⋈orders shuffle on orderkey.
    "q_tpch_q5ish" -> sql(
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin),

    // TPC-H Q8-shaped market share: per order-year, one nation's fraction
    // of the PROMO-part revenue — the nested-ratio aggregation over the
    // full star schema. Revenue folds in exact DECIMAL(18,2); the ratio's
    // two operands cast to double only at the edge (both sums are exact
    // integers in cents, so the one division+ROUND is the identical IEEE
    // op in both engines). Dimension sides broadcast; the fact shuffles
    // once to (yr, n_name), then the share rollup is a K-row regroup.
    "q_tpch_q8ish" -> sql(
      """WITH rev AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr, n_name,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS r
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE p_type = 'PROMO'
        |  GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS INT), n_name)
        |SELECT yr,
        |       CAST(SUM(CASE WHEN n_name = 'NATION_12' THEN r ELSE 0 END) AS DOUBLE)
        |       / CAST(SUM(r) AS DOUBLE) AS mkt_share,
        |       CAST(SUM(r) AS DOUBLE) AS total_rev
        |FROM rev GROUP BY yr ORDER BY yr""".stripMargin),

    // TPC-H Q3 shape: shipping-priority top-k.
    "q_tpch_q3ish" -> sql(
      """SELECT l_orderkey,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |         * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |CAST(o_orderdate AS DATE) AS odate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-06-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 20""".stripMargin),

    // Skew-safe exact distinct: expand to (key, value) distinct first (high
    // cardinality, even shuffle), then count per key — the two-phase plan
    // that survives a hot key where COUNT(DISTINCT) over 3 groups funnels
    // every value through 3 reducers.
    "q_agg_distinct_twophase" -> sql2(
      """SELECT l_returnflag, COUNT(*) AS nd_parts FROM
        |(SELECT DISTINCT l_returnflag, l_partkey FROM lineitem) t
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS nd_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),

    // Salted skew join: 90% of fact rows share one join key, which would
    // funnel through a single reducer in a plain shuffle join. The fact
    // side gets a deterministic 16-way salt and the dim side is replicated
    // x16, so the hot key spreads over 16 partitions; joining on
    // (key, salt) is still a hash equi-join and the result equals the
    // plain join (the DuckDB oracle). AQE's skew-join split handles this
    // adaptively at runtime; explicit salting is the portable plan-level
    // form that also works mid-pipeline where AQE can't re-split.
    "q_join_skew_salted" -> sql2(
      """WITH f AS (SELECT o_orderkey,
        |                  CASE WHEN o_orderkey % 10 != 0 THEN 1 ELSE o_orderkey END AS k,
        |                  CAST(o_orderkey % 16 AS INT) AS salt FROM orders),
        |d AS (SELECT DISTINCT CASE WHEN o_orderkey % 10 != 0 THEN 1 ELSE o_orderkey END AS k
        |      FROM orders),
        |ds AS (SELECT k, CAST(k % 1000 AS INT) AS dval, salt
        |       FROM d LATERAL VIEW explode(sequence(0, 15)) s AS salt)
        |SELECT f.o_orderkey, f.k, ds.dval
        |FROM f JOIN ds ON f.k = ds.k AND f.salt = ds.salt
        |ORDER BY f.o_orderkey""".stripMargin,
      """WITH f AS (SELECT o_orderkey,
        |                  CASE WHEN o_orderkey % 10 != 0 THEN 1 ELSE o_orderkey END AS k
        |           FROM orders),
        |d AS (SELECT DISTINCT CASE WHEN o_orderkey % 10 != 0 THEN 1 ELSE o_orderkey END AS k
        |      FROM orders)
        |SELECT f.o_orderkey, f.k, CAST(f.k % 1000 AS INT) AS dval
        |FROM f JOIN d ON f.k = d.k
        |ORDER BY f.o_orderkey""".stripMargin),

    "q_fn_regex2" -> sql2(
      """SELECT doc_id,
        |regexp_count(text, '[aeiou]{2}') AS n_vv,
        |array_join(regexp_extract_all(text, '\\b(s[a-z]+)', 1), ',') AS s_words,
        |size(split(text, '[aeiou]+')) AS n_splits,
        |CAST(text RLIKE '(scan|join).*(scan|join)' AS INT) AS two_ops
        |FROM documents WHERE doc_id % 30 = 0 ORDER BY doc_id""".stripMargin,
      """SELECT doc_id,
        |len(regexp_extract_all(text, '[aeiou]{2}')) AS n_vv,
        |array_to_string(regexp_extract_all(text, '\b(s[a-z]+)', 1), ',') AS s_words,
        |len(string_split_regex(text, '[aeiou]+')) AS n_splits,
        |CAST(regexp_matches(text, '(scan|join).*(scan|join)') AS INT) AS two_ops
        |FROM documents WHERE doc_id % 30 = 0 ORDER BY doc_id""".stripMargin),

    // HLL sketch MERGING: per-group sketches unioned into a global estimate
    // — the pre-aggregation pattern that lets 100 TB distinct counts reuse
    // rolled-up sketches instead of rescanning raw data. Self-verifying
    // against the exact count (same technique as q_agg_approx).
    "q_agg_hll_merge" -> sql2(
      """WITH s AS (SELECT o_orderstatus, hll_sketch_agg(o_custkey) AS sk
        |           FROM orders GROUP BY o_orderstatus),
        |x AS (SELECT COUNT(DISTINCT o_custkey) AS exact_nd FROM orders)
        |SELECT CASE WHEN abs(hll_sketch_estimate(hll_union_agg(sk)) - exact_nd)
        |            <= 0.05 * exact_nd THEN 1 ELSE 0 END AS union_ok,
        |COUNT(*) AS n_groups, MAX(exact_nd) AS exact_nd
        |FROM s CROSS JOIN x GROUP BY exact_nd""".stripMargin,
      """SELECT 1 AS union_ok, COUNT(DISTINCT o_orderstatus) AS n_groups,
        |COUNT(DISTINCT o_custkey) AS exact_nd FROM orders""".stripMargin),

    "q_fn_string2" -> sql(
      """SELECT p_partkey,
        |levenshtein(p_brand, 'Brand#13') AS lev,
        |translate(p_brand, '#', '-') AS tr,
        |repeat(substr(p_brand, 1, 2), 2) AS rep2,
        |ascii(substr(p_name, 1, 1)) AS a1,
        |chr(CAST(65 + p_partkey % 26 AS INT)) AS ch,
        |position('a' IN p_name) AS pos_a,
        |CAST(contains(p_name, 'or') AS INT) AS has_or,
        |right(p_brand, 2) AS r2,
        |left(p_name, 3) AS l3
        |FROM part WHERE p_partkey % 23 = 0 ORDER BY p_partkey""".stripMargin),

    "q_fn_math2" -> sql(
      """SELECT o_orderkey,
        |ROUND(CBRT(o_totalprice), 4) AS cb,
        |CAST(factorial(CAST(o_orderkey % 10 AS INT)) AS BIGINT) AS fact,
        |ROUND(SIN(CAST(o_orderkey % 7 AS DOUBLE)), 4) AS sn,
        |ROUND(COS(CAST(o_orderkey % 7 AS DOUBLE)), 4) AS cs,
        |ROUND(ATAN(CAST(o_orderkey % 5 AS DOUBLE)), 4) AS at,
        |ROUND(ASIN((o_orderkey % 100) / 1.0E2), 4) AS asn,
        |CAST(isnan(CAST('NaN' AS DOUBLE)) AS INT) AS nan_flag,
        |ROUND(RADIANS(180.0), 6) AS rad
        |FROM orders WHERE o_orderkey % 89 = 0 ORDER BY o_orderkey""".stripMargin),

    "q_fn_datetime2" -> sql2(
      """SELECT o_orderkey,
        |last_day(CAST(o_orderdate AS DATE)) AS ld,
        |make_date(2020, CAST(EXTRACT(month FROM o_orderdate) AS INT), 1) AS md,
        |CAST(unix_seconds(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
        |CAST(EXTRACT(DOY FROM o_orderdate) AS INT) AS doy,
        |datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS dd
        |FROM orders WHERE o_orderkey % 113 = 0 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |last_day(CAST(o_orderdate AS DATE)) AS ld,
        |make_date(2020, CAST(EXTRACT(month FROM o_orderdate) AS INT), 1) AS md,
        |CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |CAST(EXTRACT(doy FROM o_orderdate) AS INT) AS doy,
        |datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd
        |FROM orders WHERE o_orderkey % 113 = 0 ORDER BY o_orderkey""".stripMargin),

    "q_fn_array2" -> sql2(
      """WITH t AS (SELECT o_orderkey, sequence(1, 1 + CAST(o_orderkey % 4 AS INT)) AS arr
        |           FROM orders WHERE o_orderkey % 211 = 0)
        |SELECT o_orderkey,
        |CAST(array_position(arr, 2) AS BIGINT) AS pos2,
        |CAST(array_contains(arr, 3) AS INT) AS has3,
        |array_join(array_remove(arr, 1), ',') AS rem1,
        |array_join(flatten(array(arr, array(9))), ',') AS flat,
        |array_join(array_repeat(0, 2), ',') AS rep,
        |array_join(slice(arr, 1, 2), ',') AS sl,
        |CAST(arrays_overlap(arr, array(4, 5)) AS INT) AS ovl,
        |size(arr) AS sz
        |FROM t ORDER BY o_orderkey""".stripMargin,
      """WITH t AS (SELECT o_orderkey, range(1, 2 + CAST(o_orderkey % 4 AS INT)) AS arr
        |           FROM orders WHERE o_orderkey % 211 = 0)
        |SELECT o_orderkey,
        |CAST(COALESCE(list_position(arr, 2), 0) AS BIGINT) AS pos2,
        |CAST(list_contains(arr, 3) AS INT) AS has3,
        |COALESCE(array_to_string(list_filter(arr, x -> x != 1), ','), '') AS rem1,
        |array_to_string(flatten([arr, [9]]), ',') AS flat,
        |array_to_string([0, 0], ',') AS rep,
        |array_to_string(arr[1:2], ',') AS sl,
        |CAST(list_has_any(arr, [4, 5]) AS INT) AS ovl,
        |len(arr) AS sz
        |FROM t ORDER BY o_orderkey""".stripMargin)
  )
}
