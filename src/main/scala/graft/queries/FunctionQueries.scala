package graft.queries

import QuerySpec.{sql, sql2}

/** Scalar function families (SURVEY.md §2.B.8): string, regex, math,
  * date/time (incl. the date_bin emulation of SURVEY §4.4.4), conditional,
  * array (over `embeddings.embedding`), struct, map, hash/encoding, JSON
  * (over `events.props`), introspection.
  *
  * All functions run inside whole-stage codegen (pure
  * org.apache.spark.sql.functions equivalents, no UDFs), so each family
  * query is a single parquet scan → project → sort.
  *
  * Cross-engine determinism: float columns are cast to DOUBLE before any
  * arithmetic (float32→double is exact, so sequential sums agree bit-for-bit
  * between engines); libm-backed functions (ln/log10/sqrt) are ROUNDed to 4
  * digits; hex output is lower()ed on the Spark side (Spark emits uppercase,
  * DuckDB lowercase).
  */
object FunctionQueries {

  val specs: Map[String, QuerySpec] = Map(
    "q_fn_string" -> sql2(
      """SELECT p_partkey,
        |UPPER(p_name) AS up, LOWER(p_brand) AS lo, LENGTH(p_name) AS len,
        |SUBSTR(p_name, 1, 5) AS sub, REPLACE(p_type, ' ', '_') AS rep,
        |REVERSE(p_brand) AS rev, LPAD(CAST(p_size AS STRING), 4, '0') AS pad,
        |CONCAT_WS('-', p_brand, p_type) AS cw,
        |split_part(p_type, ' ', 1) AS sp1,
        |TRIM(CONCAT(' ', p_brand, ' ')) AS tr,
        |CASE WHEN startswith(p_name, 'a') THEN 1 ELSE 0 END AS st
        |FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""".stripMargin,
      """SELECT p_partkey,
        |UPPER(p_name) AS up, LOWER(p_brand) AS lo, LENGTH(p_name) AS len,
        |SUBSTR(p_name, 1, 5) AS sub, REPLACE(p_type, ' ', '_') AS rep,
        |REVERSE(p_brand) AS rev, LPAD(CAST(p_size AS VARCHAR), 4, '0') AS pad,
        |CONCAT_WS('-', p_brand, p_type) AS cw,
        |split_part(p_type, ' ', 1) AS sp1,
        |TRIM(CONCAT(' ', p_brand, ' ')) AS tr,
        |CASE WHEN starts_with(p_name, 'a') THEN 1 ELSE 0 END AS st
        |FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""".stripMargin),

    "q_fn_regex" -> sql2(
      """SELECT doc_id,
        |regexp_replace(text, '[aeiou]', '') AS novowel,
        |regexp_extract(text, '([a-z]+)r([a-z]+)', 1) AS grp,
        |size(regexp_extract_all(text, 'or', 0)) AS n_or,
        |CASE WHEN text RLIKE '^the' THEN 1 ELSE 0 END AS starts_the
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin,
      """SELECT doc_id,
        |regexp_replace(text, '[aeiou]', '', 'g') AS novowel,
        |regexp_extract(text, '([a-z]+)r([a-z]+)', 1) AS grp,
        |len(regexp_extract_all(text, 'or')) AS n_or,
        |CASE WHEN regexp_matches(text, '^the') THEN 1 ELSE 0 END AS starts_the
        |FROM documents WHERE doc_id % 20 = 0 ORDER BY doc_id""".stripMargin),

    "q_fn_math" -> sql(
      """SELECT o_orderkey,
        |ROUND(ABS(0.0 - o_totalprice), 2) AS ab,
        |CAST(CEIL(o_totalprice) AS BIGINT) AS ce,
        |CAST(FLOOR(o_totalprice) AS BIGINT) AS fl,
        |ROUND(SQRT(o_totalprice), 4) AS sq,
        |ROUND(LN(o_totalprice), 4) AS lnx,
        |ROUND(LOG10(o_totalprice), 4) AS l10,
        |CAST(SIGN(o_totalprice - 200000.0) AS INT) AS sg,
        |MOD(o_orderkey, 7) AS md,
        |CAST(POWER(2, 10) AS BIGINT) AS pw,
        |ROUND(PI(), 6) AS pi_v,
        |ROUND(ATAN2(1.0, 2.0), 6) AS at2,
        |ROUND(DEGREES(PI()), 2) AS dg
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin),

    // date_bin emulation (SURVEY §4.4.4): origin-anchored fixed-width bins
    // via integer floor-division on epoch microseconds.
    "q_fn_datetime" -> sql2(
      """SELECT o_orderkey,
        |CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dy,
        |CAST(o_orderdate AS DATE) AS d,
        |o_orderdate + INTERVAL 90 DAY AS plus90,
        |CAST(timestamp_micros(CAST(FLOOR(unix_micros(CAST(o_orderdate AS TIMESTAMP)) / 604800000000) * 604800000000 AS BIGINT)) AS TIMESTAMP_NTZ) AS wk_bin
        |FROM orders WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
        |CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
        |CAST(EXTRACT(day FROM o_orderdate) AS INT) AS dy,
        |CAST(o_orderdate AS DATE) AS d,
        |o_orderdate + INTERVAL 90 DAY AS plus90,
        |make_timestamp(CAST(FLOOR(epoch_us(o_orderdate) / 604800000000) * 604800000000 AS BIGINT)) AS wk_bin
        |FROM orders WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey""".stripMargin),

    // events.ts is timestamp[ns] in parquet; Spark truncates to µs on read
    // (SURVEY §7.6.3) — binning at 15-minute granularity is unaffected.
    "q_fn_datetime_events" -> sql2(
      """SELECT event_id,
        |date_trunc('hour', ts) AS hr,
        |CAST(EXTRACT(minute FROM ts) AS INT) AS mi,
        |CAST(timestamp_micros(CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP)) / 900000000) * 900000000 AS BIGINT)) AS TIMESTAMP_NTZ) AS bin15m
        |FROM events WHERE event_id % 13 = 0 ORDER BY event_id""".stripMargin,
      """SELECT event_id,
        |date_trunc('hour', ts) AS hr,
        |CAST(EXTRACT(minute FROM ts) AS INT) AS mi,
        |make_timestamp(CAST(FLOOR(epoch_us(ts) / 900000000) * 900000000 AS BIGINT)) AS bin15m
        |FROM events WHERE event_id % 13 = 0 ORDER BY event_id""".stripMargin),

    "q_fn_conditional" -> sql(
      """SELECT c_custkey,
        |COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'RESIDENT') AS seg,
        |ROUND(GREATEST(c_acctbal, 0.0), 2) AS g,
        |ROUND(LEAST(c_acctbal, 1000.0), 2) AS l,
        |CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal = 0 THEN 'zero' ELSE 'pos' END AS sgn,
        |IF(c_acctbal > 5000, 'hi', 'lo') AS hl
        |FROM customer WHERE c_custkey % 53 = 0 ORDER BY c_custkey""".stripMargin),

    // Array family over the 64-dim embedding vectors. Elements are cast to
    // DOUBLE before arithmetic → bit-exact across engines.
    "q_fn_array" -> sql2(
      """SELECT vec_id, size(embedding) AS dim,
        |ROUND(CAST(element_at(embedding, 1) AS DOUBLE), 6) AS e1,
        |ROUND(CAST(element_at(embedding, 2) AS DOUBLE), 6) AS e2,
        |ROUND(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE)), 6) AS vsum,
        |ROUND(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 6) AS norm2,
        |ROUND(CAST(array_max(embedding) AS DOUBLE), 6) AS mx,
        |ROUND(CAST(array_min(embedding) AS DOUBLE), 6) AS mn,
        |size(array_distinct(embedding)) AS ndist
        |FROM embeddings WHERE vec_id % 25 = 0 ORDER BY vec_id""".stripMargin,
      """SELECT vec_id, len(embedding) AS dim,
        |ROUND(CAST(embedding[1] AS DOUBLE), 6) AS e1,
        |ROUND(CAST(embedding[2] AS DOUBLE), 6) AS e2,
        |ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vsum,
        |ROUND(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS norm2,
        |ROUND(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
        |ROUND(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
        |len(list_distinct(embedding)) AS ndist
        |FROM embeddings WHERE vec_id % 25 = 0 ORDER BY vec_id""".stripMargin),

    "q_fn_struct" -> sql2(
      """SELECT o_orderkey, t.s.status AS st, ROUND(t.s.price, 2) AS pr
        |FROM (SELECT o_orderkey, named_struct('status', o_orderstatus, 'price', o_totalprice) AS s
        |      FROM orders WHERE o_orderkey % 151 = 0) t
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey, t.s.status AS st, ROUND(t.s.price, 2) AS pr
        |FROM (SELECT o_orderkey, {'status': o_orderstatus, 'price': o_totalprice} AS s
        |      FROM orders WHERE o_orderkey % 151 = 0) t
        |ORDER BY o_orderkey""".stripMargin),

    // Map family; oracle expresses the same lookup with CASE (semantic
    // equivalence — DuckDB map subscripting differs across versions).
    "q_fn_map" -> sql2(
      """SELECT c_custkey,
        |element_at(map('BUILDING', 1, 'AUTOMOBILE', 2, 'MACHINERY', 3, 'HOUSEHOLD', 4, 'FURNITURE', 5), c_mktsegment) AS seg_code,
        |size(map('a', 1, 'b', 2)) AS msz,
        |array_join(map_keys(map('a', 1, 'b', 2)), ',') AS mk
        |FROM customer WHERE c_custkey % 53 = 0 ORDER BY c_custkey""".stripMargin,
      """SELECT c_custkey,
        |CASE c_mktsegment WHEN 'BUILDING' THEN 1 WHEN 'AUTOMOBILE' THEN 2 WHEN 'MACHINERY' THEN 3
        |                  WHEN 'HOUSEHOLD' THEN 4 WHEN 'FURNITURE' THEN 5 END AS seg_code,
        |2 AS msz, 'a,b' AS mk
        |FROM customer WHERE c_custkey % 53 = 0 ORDER BY c_custkey""".stripMargin),

    "q_fn_hash" -> sql2(
      """SELECT doc_id, md5(text) AS m, sha2(text, 256) AS sh,
        |lower(hex(encode(substr(text, 1, 4), 'UTF-8'))) AS hx,
        |base64(encode(substr(text, 1, 8), 'UTF-8')) AS b64,
        |octet_length(encode(text, 'UTF-8')) AS nbytes
        |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin,
      """SELECT doc_id, md5(text) AS m, sha256(text) AS sh,
        |lower(hex(encode(substr(text, 1, 4)))) AS hx,
        |base64(encode(substr(text, 1, 8))) AS b64,
        |octet_length(encode(text)) AS nbytes
        |FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""".stripMargin),

    // Bitwise operators/functions: &, |, XOR, shifts, complement,
    // popcount — all BIGINT-exact in both engines (DuckDB's ^ is
    // exponentiation, so XOR goes through its xor() function; Spark's ^
    // IS bitwise xor).
    "q_fn_bitwise" -> sql2(
      """SELECT o_orderkey,
        |CAST(o_orderkey & 255 AS BIGINT) AS b_and,
        |CAST(o_orderkey | 4096 AS BIGINT) AS b_or,
        |CAST(o_orderkey ^ 1535 AS BIGINT) AS b_xor,
        |CAST(shiftleft(o_orderkey, 3) AS BIGINT) AS b_shl,
        |CAST(shiftright(o_orderkey, 2) AS BIGINT) AS b_shr,
        |CAST(~o_orderkey AS BIGINT) AS b_not,
        |CAST(bit_count(o_orderkey) AS INT) AS b_pop
        |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |CAST(o_orderkey & 255 AS BIGINT) AS b_and,
        |CAST(o_orderkey | 4096 AS BIGINT) AS b_or,
        |CAST(xor(o_orderkey, 1535) AS BIGINT) AS b_xor,
        |CAST(o_orderkey << 3 AS BIGINT) AS b_shl,
        |CAST(o_orderkey >> 2 AS BIGINT) AS b_shr,
        |CAST(~o_orderkey AS BIGINT) AS b_not,
        |CAST(bit_count(o_orderkey) AS INT) AS b_pop
        |FROM orders WHERE o_orderkey % 37 = 0 ORDER BY o_orderkey""".stripMargin),

    // JSON extraction from events.props (not in DataFusion core 53 —
    // SURVEY §2.B.8 marks it an extension; Spark ships it built-in).
    // Spark 4 VARIANT type (the semi-structured column format): parse the
    // JSON props column into VARIANT once and extract typed fields with
    // variant_get — the open-schema ingestion path Spark 4 added for
    // exactly this events-with-loose-props shape. DuckDB oracle reads the
    // same fields through its JSON extraction; a missing path must come
    // back NULL (counted), not error.
    "q_fn_variant" -> sql2(
      """WITH v AS (SELECT event_type,
        |                 variant_get(parse_json(props), '$.k', 'bigint') AS k,
        |                 variant_get(try_parse_json(props), '$.missing', 'bigint') AS miss
        |          FROM events)
        |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |       CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k,
        |       CAST(SUM(CASE WHEN miss IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin,
      """WITH v AS (SELECT event_type,
        |                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |                 CAST(json_extract_string(props, '$.missing') AS BIGINT) AS miss
        |          FROM events)
        |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |       CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k,
        |       CAST(SUM(CASE WHEN miss IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        |FROM v GROUP BY event_type ORDER BY event_type""".stripMargin),

    // Lateral column aliases: a select-list expression referencing an
    // alias defined EARLIER in the same list (Spark 3.4+/DuckDB both
    // support it) — one shared text, the chained-derivation idiom that
    // otherwise forces nested subqueries.
    "q_select_lateral_alias" -> sql2(
      """SELECT o_orderkey,
        |       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |       cents DIV 100 AS dollars,
        |       dollars % 10 AS last_digit
        |FROM orders WHERE o_orderkey % 25 = 0
        |ORDER BY o_orderkey""".stripMargin,
      """SELECT o_orderkey,
        |       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |       cents // 100 AS dollars,
        |       dollars % 10 AS last_digit
        |FROM orders WHERE o_orderkey % 25 = 0
        |ORDER BY o_orderkey""".stripMargin),

    "q_fn_json" -> sql2(
      """SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k, event_type
        |FROM events WHERE event_id % 17 = 0 ORDER BY event_id""".stripMargin,
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k, event_type
        |FROM events WHERE event_id % 17 = 0 ORDER BY event_id""".stripMargin),

    // Introspection: typeof()/version() exercised; output normalized to a
    // stable shape (typeof strings differ across engines → compared via the
    // constant expected values each engine documents).
    "q_fn_introspect" -> sql2(
      """SELECT CAST(typeof(o_orderkey) = 'bigint' AS INT) AS key_is_bigint,
        |CAST(length(version()) > 0 AS INT) AS has_version,
        |COUNT(*) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin,
      """SELECT CAST(typeof(o_orderkey) = 'BIGINT' AS INT) AS key_is_bigint,
        |CAST(length(version()) > 0 AS INT) AS has_version,
        |COUNT(*) AS n
        |FROM orders GROUP BY 1, 2""".stripMargin)
  )
}
