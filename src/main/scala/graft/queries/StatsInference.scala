package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QuerySpec.sql2
import graft.Staging.StagedDataFrame

/** Categorical / rank inference tests a warehouse monitoring deployment
  * runs over the fact tables (the reference delegates its whole SQL
  * surface to the engine — these extend the q_stats_* family of
  * engine-checked test statistics: KS, Mann-Whitney, SRM, CUPED).
  *
  * Float discipline (FloatDisciplineSpec contract): every test statistic
  * is assembled from EXACT integer aggregates; the only floating-point
  * steps are correctly-rounded IEEE ops on identical inputs (shared SQL
  * text), and integer quantization rides the FLOOR(x + 0.5E0) idiom —
  * no ROUND-of-quotient, no bare decimal-literal division, no
  * engine-native transcendental.
  */
object StatsInference {

  /** Pearson chi-square test of independence + Cramér's V over the
    * orders (status × priority) contingency table (Pearson 1900; Cramér,
    * "Mathematical Methods of Statistics" 1946 §21.9) — the categorical
    * drift monitor that pairs with q_stats_ks_test (continuous shape)
    * and q_stats_mannwhitney (location): did the distribution of order
    * priorities shift between fulfillment states?
    *
    * Exactness: the contingency grid is DENSIFIED (distinct statuses ×
    * distinct priorities, LEFT-joined to observed counts) so an EMPTY
    * cell still contributes its full Pearson term (0−E)²/E = r·c/n —
    * omitting empty cells understates χ² exactly in the extreme-shift
    * regimes the monitor exists for. Cell deviation dev = n·o − r·c is
    * EXACT BIGINT (products bounded by n², inside int64 to ~3×10⁹ rows;
    * past that counts rescale to milli-shares first — the
    * q_cluster_purity note). Each cell's contribution dev²/(r·c·n) and
    * expected count r·c/n are correctly-rounded IEEE chains on exact
    * integers — bit-identical across engines — FLOOR-quantized to micro
    * units per CELL so the total is an order-independent BIGINT sum
    * (never a float fold).
    *
    * 100 TB shape: ONE scan, map-side-combined groupBy to the ≤|S|·|P|
    * cell table (15 rows here; bounded by the categorical domains, never
    * by N); the densifying cross join and the single-row test-statistic
    * join are domain-bounded broadcasts (GlobalPlanSweepSpec allowlist);
    * margins are windows over the dense grid. The reject flag uses the
    * χ²₀.₀₅ quantile for the OBSERVED dof via the Wilson-Hilferty cube
    * approximation — computed in exact integer micro units on both sides.
    */
  private def chi2Sql: String = {
    val wh = """(1.0E0 - 2.0E0 / (9.0E0 * CAST((nr - 1) * (nc - 1) AS DOUBLE))
               |  + 1.6449E0 * SQRT(2.0E0 / (9.0E0 * CAST((nr - 1) * (nc - 1) AS DOUBLE))))""".stripMargin
    s"""WITH c AS (SELECT o_orderstatus AS status, o_orderpriority AS priority,
       |                  CAST(COUNT(*) AS BIGINT) AS o
       |           FROM orders GROUP BY o_orderstatus, o_orderpriority),
       |ss AS (SELECT DISTINCT status FROM c),
       |pp AS (SELECT DISTINCT priority FROM c),
       |gc AS (SELECT g.status, g.priority, CAST(COALESCE(c.o, 0) AS BIGINT) AS o
       |       FROM (SELECT ss.status, pp.priority FROM ss CROSS JOIN pp) g
       |       LEFT JOIN c ON c.status = g.status AND c.priority = g.priority),
       |m AS (SELECT status, priority, o,
       |             CAST(SUM(o) OVER (PARTITION BY status) AS BIGINT) AS r,
       |             CAST(SUM(o) OVER (PARTITION BY priority) AS BIGINT) AS cc,
       |             CAST(SUM(o) OVER () AS BIGINT) AS n
       |      FROM gc),
       |cells AS (SELECT status, priority, o, r, cc, n,
       |                 n * o - r * cc AS dev_n,
       |                 CAST(FLOOR(CAST(r AS DOUBLE) * CAST(cc AS DOUBLE)
       |                      / CAST(n AS DOUBLE) * 1.0E6 + 0.5E0) AS BIGINT) AS exp_micro,
       |                 CAST(FLOOR(CAST(n * o - r * cc AS DOUBLE) * CAST(n * o - r * cc AS DOUBLE)
       |                      / (CAST(r AS DOUBLE) * CAST(cc AS DOUBLE) * CAST(n AS DOUBLE))
       |                      * 1.0E6 + 0.5E0) AS BIGINT) AS contrib_micro
       |          FROM m),
       |tot AS (SELECT CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro,
       |               CAST(COUNT(DISTINCT status) AS BIGINT) AS nr,
       |               CAST(COUNT(DISTINCT priority) AS BIGINT) AS nc,
       |               CAST(MAX(n) AS BIGINT) AS n
       |        FROM cells),
       |crit AS (SELECT chi2_micro, nr, nc, n,
       |                (nr - 1) * (nc - 1) AS dof,
       |                CAST(FLOOR(CAST((nr - 1) * (nc - 1) AS DOUBLE)
       |                     * $wh * $wh * $wh
       |                     * 1.0E6 + 0.5E0) AS BIGINT) AS crit05_micro
       |         FROM tot)
       |SELECT cells.status, cells.priority, cells.o AS obs,
       |       cells.exp_micro, cells.dev_n, cells.contrib_micro,
       |       crit.chi2_micro, CAST(crit.dof AS BIGINT) AS dof,
       |       crit.crit05_micro,
       |       CAST(CASE WHEN crit.chi2_micro > crit.crit05_micro THEN 1 ELSE 0 END AS INT) AS reject_05,
       |       SQRT(CAST(crit.chi2_micro AS DOUBLE)
       |            / (1.0E6 * CAST(crit.n AS DOUBLE)
       |               * CAST(LEAST(crit.nr, crit.nc) - 1 AS DOUBLE))) AS cramers_v
       |FROM cells CROSS JOIN crit
       |ORDER BY cells.status, cells.priority""".stripMargin
  }

  /** Binned Spearman rank correlation between order value and line count
    * (Spearman 1904) over per-order aggregates: are bigger orders bigger
    * because of more lines, rank-wise? Exact on the BINNED statement —
    * both variables quantize to bounded grids (price in 2^20-cent bins,
    * line count is already small-integer), midranks come from the grid's
    * cumulative margins (the q_stats_mannwhitney binned-tie treatment),
    * and Spearman = Pearson over the ≤ |B1|·|B2| weighted cell table.
    *
    * Exactness: 2·midrank is an exact integer (the ½-tie credit is
    * absorbed by carrying doubled ranks); all five moment sums fold over
    * the bounded cell table in BIGINT. The binding bound is the
    * doubled-rank moment Σw·(2r)² ≤ 4N³ — inside int64 only to ~1.3×10⁶
    * rows — so the SQL carries a rank-quantization guard in the text
    * itself: when 2N+1 exceeds 2¹⁴ the doubled ranks are intDiv-rescaled
    * to ≤ 2¹⁴ shares (sf = ceil((2N+1)/2¹⁴); Σw·q² ≤ N·2²⁸ keeps the fold
    * in int64 to ~3×10¹⁰ rows). Below the threshold sf = 1 and every
    * output is bit-identical to the unguarded form; above it the
    * statistic is Spearman over deterministically quantized ranks
    * (quantization error O(2⁻¹⁴) on a [−1,1] statistic) — identical on
    * both engines because non-negative intDiv agrees everywhere. The
    * moment combination n·Σxy − Σx·Σy overflows int64 first, so it is
    * computed in DOUBLE — each operand an exact integer cast, every op
    * correctly rounded IEEE, bit-identical across engines.
    *
    * 100 TB shape: one lineitem groupBy(orderkey) (map-side combined),
    * one bounded-grid groupBy, margins as windows over the bounded grid,
    * a single-row moment join — no rank window over the corpus, no
    * global sort (the classic exact-Spearman killer).
    */
  private[graft] def spearmanSql(intDiv: String): String =
    s"""WITH po AS (SELECT l_orderkey,
       |                  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
       |                  CAST(COUNT(*) AS BIGINT) AS nl
       |           FROM lineitem GROUP BY l_orderkey),
       |b AS (SELECT cents $intDiv 1048576 AS bx, LEAST(nl, 47) AS by2 FROM po),
       |g AS (SELECT bx, by2, CAST(COUNT(*) AS BIGINT) AS w FROM b GROUP BY bx, by2),
       |mx AS (SELECT bx, CAST(SUM(w) AS BIGINT) AS cx FROM g GROUP BY bx),
       |my AS (SELECT by2, CAST(SUM(w) AS BIGINT) AS cy FROM g GROUP BY by2),
       |nt AS (SELECT CAST(SUM(w) AS BIGINT) AS tn FROM g),
       |sf AS (SELECT CASE WHEN 2 * tn + 1 <= 16384 THEN CAST(1 AS BIGINT)
       |                   ELSE (2 * tn + 16384) $intDiv 16384 END AS sf
       |       FROM nt),
       |rx AS (SELECT bx, cx,
       |              (2 * CAST(SUM(cx) OVER (ORDER BY bx
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |                - cx + 1) $intDiv sf.sf AS r2x
       |       FROM mx CROSS JOIN sf),
       |ry AS (SELECT by2, cy,
       |              (2 * CAST(SUM(cy) OVER (ORDER BY by2
       |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |                - cy + 1) $intDiv sf.sf AS r2y
       |       FROM my CROSS JOIN sf),
       |j AS (SELECT g.w, rx.r2x, ry.r2y
       |      FROM g JOIN rx ON g.bx = rx.bx JOIN ry ON g.by2 = ry.by2),
       |s AS (SELECT CAST(SUM(w) AS BIGINT) AS n,
       |             CAST(SUM(w * r2x) AS BIGINT) AS sx,
       |             CAST(SUM(w * r2y) AS BIGINT) AS sy,
       |             CAST(SUM(w * r2x * r2x) AS BIGINT) AS sxx,
       |             CAST(SUM(w * r2y * r2y) AS BIGINT) AS syy,
       |             CAST(SUM(w * r2x * r2y) AS BIGINT) AS sxy
       |      FROM j)
       |SELECT n, sx, sy, sxx, syy, sxy,
       |       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0E0
       |             AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0E0
       |            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |                 / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |            END AS spearman_rho
       |FROM s""".stripMargin

  /** One-way ANOVA F-test over event values by event type (Fisher,
    * "Statistical Methods for Research Workers" 1925): does mean event
    * value differ across the K event types? The omnibus mean test
    * completing the monitor family (chi2: category mix; KS: shape;
    * MWU: pairwise location; this: K-group means).
    *
    * Exactness: per-group (n, Σx, Σx²) are exact BIGINT cents folds.
    * The between-group sum of squares needs Σ_g S_g²/n_g — a float sum
    * whose fold ORDER could differ across engines — so each group's
    * S_g²/n_g quantizes to an integer (one IEEE multiply+divide on exact
    * ints, FLOOR+0.5) BEFORE the sum: SSB/SSW become order-independent
    * BIGINT folds (quantization error ≤ K/2 cents² against ~10¹³-scale
    * sums). F, η², and the Wilson-Hilferty χ²₀.₀₅/(K−1) critical value
    * are shared double texts over those integers.
    *
    * 100 TB shape: ONE scan, map-side-combined groupBy to K rows;
    * windows over the K-row table; nothing else.
    */
  private[graft] def anovaSql(intDiv: String): String = {
    val wh = """(1.0E0 - 2.0E0 / (9.0E0 * CAST(k - 1 AS DOUBLE))
               |  + 1.6449E0 * SQRT(2.0E0 / (9.0E0 * CAST(k - 1 AS DOUBLE))))""".stripMargin
    s"""WITH e AS (SELECT event_type AS g,
       |                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS x
       |           FROM events),
       |gr AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
       |              CAST(SUM(x * x) AS BIGINT) AS q
       |       FROM e GROUP BY g),
       |g2 AS (SELECT g, n, s, q,
       |              CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) + 0.5E0) AS BIGINT) AS m2
       |       FROM gr),
       |t AS (SELECT g, n, s, q, m2,
       |             CAST(SUM(n) OVER () AS BIGINT) AS tn,
       |             CAST(SUM(s) OVER () AS BIGINT) AS ts,
       |             CAST(SUM(q) OVER () AS BIGINT) AS tq,
       |             CAST(SUM(m2) OVER () AS BIGINT) AS tm2,
       |             CAST(COUNT(*) OVER () AS BIGINT) AS k
       |      FROM g2),
       |f AS (SELECT g, n, s, q, tn, k,
       |             tm2 - CAST(FLOOR(CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) / CAST(tn AS DOUBLE) + 0.5E0) AS BIGINT) AS ssb,
       |             tq - tm2 AS ssw
       |      FROM t)
       |SELECT g AS event_type, n,
       |       CAST(CASE WHEN s >= 0 THEN s $intDiv n
       |                 ELSE 0 - ((0 - s) $intDiv n) END AS BIGINT) AS mean_cents,
       |       ssb AS ssb_cents2, ssw AS ssw_cents2,
       |       (CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
       |         / (CAST(ssw AS DOUBLE) / CAST(tn - k AS DOUBLE)) AS f_stat,
       |       CAST(ssb AS DOUBLE) / CAST(ssb + ssw AS DOUBLE) AS eta_sq,
       |       CAST(CASE WHEN (CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
       |                      / (CAST(ssw AS DOUBLE) / CAST(tn - k AS DOUBLE)) >
       |                      $wh * $wh * $wh
       |                 THEN 1 ELSE 0 END AS INT) AS reject_05
       |FROM f ORDER BY event_type""".stripMargin
  }

  /** Binned Kendall tau-b between order value and line count (Kendall,
    * Biometrika 1938; tau-b tie correction: Kendall 1945) over the SAME
    * bounded grid as q_stats_spearman, so the two rank monitors agree on
    * the binned statement. Concordant/discordant pair masses come from
    * the grid self-join (strictly-both-greater / x-greater-y-smaller),
    * tie masses from the margins — all EXACT integer pair counting.
    * Only the final tau-b divides, as one shared double text.
    *
    * 100 TB shape: corpus work is the same one lineitem groupBy; the
    * self-join runs on the ≤|B1|·|B2| grid (domain-bounded, broadcast —
    * GlobalPlanSweepSpec allowlist), margins are windows over the grid.
    * Pair counts stay in int64 to ~4×10⁹ orders (n²/2 < 2⁶³). A fully
    * tied variable (one occupied bin) makes n0 = tx (or ty); tau_b is
    * then undefined and the CASE yields NULL instead of dividing by zero.
    */
  private[graft] def kendallSql(intDiv: String): String =
    s"""WITH po AS (SELECT l_orderkey,
       |                  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents,
       |                  CAST(COUNT(*) AS BIGINT) AS nl
       |           FROM lineitem GROUP BY l_orderkey),
       |b AS (SELECT cents $intDiv 1048576 AS bx, LEAST(nl, 47) AS by2 FROM po),
       |g AS (SELECT bx, by2, CAST(COUNT(*) AS BIGINT) AS w FROM b GROUP BY bx, by2),
       |cd AS (SELECT CAST(COALESCE(SUM(CASE WHEN a.bx < o.bx AND a.by2 < o.by2
       |                                     THEN a.w * o.w END), 0) AS BIGINT) AS conc,
       |              CAST(COALESCE(SUM(CASE WHEN a.bx < o.bx AND a.by2 > o.by2
       |                                     THEN a.w * o.w END), 0) AS BIGINT) AS disc
       |       FROM g a JOIN g o ON a.bx < o.bx),
       |mx AS (SELECT CAST(SUM(cx * (cx - 1)) AS BIGINT) $intDiv 2 AS tx
       |       FROM (SELECT bx, CAST(SUM(w) AS BIGINT) AS cx FROM g GROUP BY bx) z),
       |my AS (SELECT CAST(SUM(cy * (cy - 1)) AS BIGINT) $intDiv 2 AS ty
       |       FROM (SELECT by2, CAST(SUM(w) AS BIGINT) AS cy FROM g GROUP BY by2) z),
       |nt AS (SELECT CAST(SUM(w) AS BIGINT) AS n FROM g),
       |s AS (SELECT cd.conc, cd.disc, mx.tx, my.ty, nt.n,
       |             (nt.n * (nt.n - 1)) $intDiv 2 AS n0
       |      FROM cd CROSS JOIN mx CROSS JOIN my CROSS JOIN nt)
       |SELECT n, conc, disc, tx AS ties_x, ty AS ties_y,
       |       CASE WHEN n0 > tx AND n0 > ty
       |            THEN CAST(conc - disc AS DOUBLE)
       |                 / SQRT(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))
       |            END AS tau_b
       |FROM s""".stripMargin

  /** Benjamini-Hochberg FDR screen over the per-segment drift family
    * (Benjamini & Hochberg, JRSS-B 1995): for EVERY event type, a binned
    * two-sample KS test of that type's value distribution against the
    * complement (all other types pooled) on the shared 64-bin grid —
    * q_stats_ks_test's machinery widened from one pair to the full
    * m-hypothesis family — then the BH step-up at FDR q = 0.05. This is
    * the multiple-testing control a monitoring deployment actually needs
    * once it runs a drift test per segment: m independent α = 0.05 gates
    * fire spuriously ~m·α of the time; BH bounds the expected FALSE
    * DISCOVERY fraction instead.
    *
    * Determinism/exactness: D's numerator max|cumT·nC − cumC·nT| is an
    * exact BIGINT per type (cross-multiplied CDFs, int64-safe to ~3·10⁹
    * rows/side — the ks_test bound); the asymptotic p-value
    * p = 2·exp(−2·D²·nT·nC/(nT+nC)) (Smirnov 1948 one-term form) runs
    * through the engine-neutral exp kernel: the exponent quantizes to
    * micro-nats via one shared IEEE double text over exact integers
    * (clamped at 29 — beyond that p < 3e-13 and quantizes to 0), exp is
    * graft_exp_micro / the oracle's identical CTE chain, and the final
    * p_micro = min(1e6, ⌊2e12/exp_micro + ½⌋) is one more shared double
    * op. The BH step-up is then PURE INTEGER: rank by (p_micro, type),
    * reject ranks ≤ max{k : p_micro·m ≤ k·50000} — no float ever orders
    * the decision.
    *
    * 100 TB shape: ONE scan to the (type × 64)-bin histogram (map-side
    * combined), the complement via one bin-total join, everything after
    * on the m-row / m×64-row bounded tables (domain-bounded windows —
    * GlobalPlanSweepSpec allowlist; the tt×spine cross join is the
    * chi2-style bounded densifier).
    */
  private[graft] def bhFdrSql(
      k: graft.llm.NeutralMath.KernelSplice,
      spine: String,
      intDiv: String): String =
    s"""WITH e AS (SELECT event_type,
       |                 LEAST(63, GREATEST(0, CAST(FLOOR(FLOOR(value * 100 + 0.5) / 800) AS BIGINT))) AS b
       |          FROM events),
       |h AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY event_type, b),
       |tt AS (SELECT DISTINCT event_type FROM h),
       |gb AS (SELECT $spine AS b),
       |grid AS (SELECT tt.event_type, gb.b FROM tt CROSS JOIN gb),
       |bt AS (SELECT b, CAST(SUM(c) AS BIGINT) AS callb FROM h GROUP BY b),
       |f AS (SELECT g.event_type, g.b,
       |             CAST(COALESCE(h.c, 0) AS BIGINT) AS ct,
       |             CAST(COALESCE(bt.callb, 0) - COALESCE(h.c, 0) AS BIGINT) AS cc
       |      FROM grid g
       |      LEFT JOIN h ON g.event_type = h.event_type AND g.b = h.b
       |      LEFT JOIN bt ON g.b = bt.b),
       |cf AS (SELECT event_type, b,
       |              CAST(SUM(ct) OVER (PARTITION BY event_type ORDER BY b
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumt,
       |              CAST(SUM(cc) OVER (PARTITION BY event_type ORDER BY b
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumc,
       |              CAST(SUM(ct) OVER (PARTITION BY event_type) AS BIGINT) AS nt,
       |              CAST(SUM(cc) OVER (PARTITION BY event_type) AS BIGINT) AS nc
       |       FROM f),
       |ag AS (SELECT event_type,
       |              CAST(MAX(ABS(cumt * nc - cumc * nt)) AS BIGINT) AS dnum,
       |              CAST(MAX(nt) AS BIGINT) AS nt, CAST(MAX(nc) AS BIGINT) AS nc
       |       FROM cf GROUP BY event_type),
       |xs AS (SELECT event_type, nt, nc,
       |              CAST((1000000 * dnum) $intDiv (nt * nc) AS BIGINT) AS ks_micro,
       |              LEAST(CAST(29000000 AS BIGINT),
       |                CAST(FLOOR(2.0E0 * CAST(dnum AS DOUBLE) * CAST(dnum AS DOUBLE)
       |                     / (CAST(nt AS DOUBLE) * CAST(nc AS DOUBLE) * CAST(nt + nc AS DOUBLE))
       |                     * 1.0E6 + 0.5E0) AS BIGINT)) AS xm
       |       FROM ag),
       |${k.exp("pe", "xs", "event_type, nt, ks_micro, xm", "event_type, nt, ks_micro", "xm", "emicro")},
       |p AS (SELECT event_type, nt, ks_micro,
       |             LEAST(CAST(1000000 AS BIGINT),
       |               CAST(FLOOR(2.0E12 / CAST(emicro AS DOUBLE) + 0.5E0) AS BIGINT)) AS p_micro
       |      FROM pe),
       |r AS (SELECT event_type, nt, ks_micro, p_micro,
       |             CAST(row_number() OVER (ORDER BY p_micro, event_type) AS BIGINT) AS rk,
       |             CAST(COUNT(*) OVER () AS BIGINT) AS m
       |      FROM p),
       |s AS (SELECT event_type, nt, ks_micro, p_micro, rk, m,
       |             CAST(MAX(CASE WHEN p_micro * m <= rk * 50000
       |                           THEN rk ELSE CAST(0 AS BIGINT) END) OVER () AS BIGINT) AS kmax
       |      FROM r)
       |SELECT event_type, nt AS n_t, ks_micro, p_micro, rk AS bh_rank, m,
       |       CAST(CASE WHEN rk <= kmax THEN 1 ELSE 0 END AS INT) AS bh_reject_05
       |FROM s ORDER BY event_type""".stripMargin

  /** Two-feature OLS with intercept via the normal equations (Legendre
    * 1805/Gauss; the closed form every warehouse regression starts
    * from): order value (cents) on line count and total quantity —
    * solved exactly by Cramer's rule on the 3×3 moment matrix, plus R².
    *
    * Exactness: all nine X'X / X'y moments are exact BIGINT folds over
    * one lineitem groupBy. The response is WHOLE DOLLARS, not cents:
    * the quadratic moment Σy² is the overflow-critical term (order
    * values reach ~5.5e5 dollars, so Σy² stays inside int64 to ~3×10⁷
    * orders at dollar scale but only ~3×10³ at cents — caught by the
    * sf0.1 gate, which overflowed the cents version outright). The 3×3
    * determinants and coefficients are ONE shared double text over
    * those integers — fixed textual operation order, every op
    * correctly-rounded IEEE, bit-identical across engines (a scalar
    * expression, not a data-ordered fold). The residual sum for R² uses
    * the algebraic identity SSR = Syy − b₁·Sx1y − b₂·Sx2y on centered
    * moments, so no second data pass.
    *
    * 100 TB shape: one map-side-combined groupBy(orderkey), one
    * single-row moment aggregate, a constant-size solve. Nothing else.
    */
  private def olsSql: String =
    s"""WITH po AS (SELECT l_orderkey,
       |                  CAST(COUNT(*) AS BIGINT) AS x1,
       |                  CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS x2,
       |                  CAST(SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS y
       |           FROM lineitem GROUP BY l_orderkey),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |             CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
       |             CAST(SUM(y) AS BIGINT) AS sy,
       |             CAST(SUM(x1 * x1) AS BIGINT) AS s11, CAST(SUM(x1 * x2) AS BIGINT) AS s12,
       |             CAST(SUM(x2 * x2) AS BIGINT) AS s22,
       |             CAST(SUM(x1 * y) AS BIGINT) AS s1y, CAST(SUM(x2 * y) AS BIGINT) AS s2y,
       |             CAST(SUM(y * y) AS BIGINT) AS syy
       |      FROM po),
       |c AS (SELECT n, s1, s2, sy, s11, s12, s22, s1y, s2y, syy,
       |             CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS a11,
       |             CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a12,
       |             CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS a22,
       |             CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1,
       |             CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2
       |      FROM m),
       |b AS (SELECT n, s1, s2, sy, syy, a11, a12, a22, c1, c2,
       |             (c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12) AS b1,
       |             (c2 * a11 - c1 * a12) / (a11 * a22 - a12 * a12) AS b2
       |      FROM c)
       |SELECT n, b1 AS beta_lines, b2 AS beta_qty,
       |       (CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE) - b2 * CAST(s2 AS DOUBLE))
       |         / CAST(n AS DOUBLE) AS beta_intercept,
       |       (b1 * c1 + b2 * c2)
       |         / (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS r_squared
       |FROM b""".stripMargin

  /** Inter-arrival burstiness per event type (Goh & Barabási, "Burstiness
    * and memory in complex systems", EPL 2008): CV² of the per-user gap
    * distribution and the bounded burstiness index B = (CV−1)/(CV+1)
    * (B = 0 for a Poisson process, → 1 for heavy-tailed bursts, < 0 for
    * pacemaker-regular traffic) — the traffic-shape monitor that tells
    * a pipeline whether an event stream's rate statistics can be trusted
    * as Poisson (alerting thresholds, sampling designs) or not.
    *
    * Determinism: gaps are exact integer SECONDS from per-user LAG
    * (microsecond timestamps floor-divided — both engines agree on
    * non-negative intDiv); n, Σg, Σg² are exact BIGINT folds; CV² and B
    * are one shared double text over them (n·Σg² overflows int64 first,
    * so the combination runs in DOUBLE over exact integer casts —
    * IEEE-identical; SQRT is exempt everywhere, correctly rounded).
    *
    * 100 TB shape: one scan, one user_id-partitioned LAG window (the
    * sessionize exchange), one map-side-combined groupBy to T rows.
    */
  private[graft] def interarrivalSql(epochUs: String, intDiv: String): String =
    s"""WITH e AS (SELECT event_type, user_id, event_id,
       |                  ($epochUs) $intDiv 1000000 AS sec
       |           FROM events),
       |g AS (SELECT event_type,
       |             sec - LAG(sec) OVER (PARTITION BY event_type, user_id
       |                                  ORDER BY sec, event_id) AS gap
       |      FROM e),
       |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
       |             CAST(SUM(gap) AS BIGINT) AS sg,
       |             CAST(SUM(gap * gap) AS BIGINT) AS sgg
       |      FROM g WHERE gap IS NOT NULL GROUP BY event_type)
       |SELECT event_type, n AS n_gaps, CAST(sg $intDiv n AS BIGINT) AS mean_gap_sec,
       |       CASE WHEN sg > 0
       |            THEN (CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
       |                 / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
       |            END AS cv_sq,
       |       CASE WHEN sg > 0
       |            THEN (SQRT((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
       |                       / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))) - 1.0E0)
       |                 / (SQRT((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
       |                         / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))) + 1.0E0)
       |            END AS burstiness
       |FROM m ORDER BY event_type""".stripMargin

  /** DAU / trailing-7-day WAU / stickiness per calendar day (the
    * standard engagement ratio DAU/WAU; e.g. the industry "stickiness"
    * KPI): how concentrated is weekly activity into single days?
    *
    * Exactness: pure integer counting — epoch days by integer division,
    * exact distinct (user, day) pairs, WAU via a 7-way anchor-day
    * explode (each active day contributes to the 7 trailing windows
    * that contain it) + COUNT(DISTINCT user) per anchor, stickiness in
    * basis points by integer division.
    *
    * 100 TB shape: one scan collapses to the (user, day) distinct table
    * (one exchange); the ×7 explode is calendar-bounded fan-out on that
    * already-collapsed table, NEVER on raw events; everything after is
    * day-bounded. The DAU↔WAU join is equi on the day; the only
    * non-equi piece is the single-row span broadcast that trims the
    * partial leading windows (sweep-allowlisted).
    */
  private def stickinessSql(epochUs: String, intDiv: String,
      anchorExplode: String): String =
    s"""WITH ud AS (SELECT DISTINCT user_id,
       |                   ($epochUs) $intDiv 86400000000 AS d
       |            FROM events),
       |span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM ud),
       |wx AS (SELECT user_id, d, $anchorExplode AS ad FROM ud),
       |wau AS (SELECT ad AS d, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
       |        FROM wx GROUP BY ad),
       |dau AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d)
       |SELECT CAST(dau.d AS BIGINT) AS epoch_day, dau.dau, wau.wau,
       |       CAST((dau.dau * 10000) $intDiv wau.wau AS BIGINT) AS stickiness_bp
       |FROM dau JOIN wau ON dau.d = wau.d
       |         JOIN span ON dau.d >= span.d0 + 6
       |ORDER BY epoch_day""".stripMargin

  /** Hill tail-index estimator over order values (Hill, "A simple
    * general approach to inference about the tail of a distribution",
    * Ann. Stat. 1975): α̂ = k / Σᵢ ln(x₍ᵢ₎/x₍ₖ₊₁₎) over the top-k order
    * statistics — the heavy-tail monitor that tells a pipeline whether
    * value sums/means even converge (α ≤ 1: no mean; α ≤ 2: no
    * variance), the cross-sectional complement to q_events_interarrival.
    *
    * Exactness: the top-101 rows come from a distributed TakeOrdered
    * (ORDER BY cents DESC, key LIMIT — per-partition top-k then merge,
    * no global sort, no unpartitioned rank window); x₍ₖ₊₁₎ is a MIN
    * window over those 101 bounded rows; each log ratio rides the
    * engine-neutral micro-nat kernel on exact integer cents; α̂ is an
    * integer division of exact sums (milli units).
    */
  private def hillTail(k: graft.llm.NeutralMath.KernelSplice,
      intDiv: String): String =
    s"""top AS (SELECT cents FROM (
       |          SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       |                 o_orderkey
       |          FROM orders ORDER BY cents DESC, o_orderkey LIMIT 101) z),
       |mn AS (SELECT cents, CAST(MIN(cents) OVER () AS BIGINT) AS xk FROM top),
       |up AS (SELECT cents, xk FROM mn WHERE cents > xk),
       |${k.ln("lr", "up", "cents, xk", "cents, xk", "cents", "xk", "ln_micro", "1.0E6")},
       |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS kk,
       |               CAST(SUM(ln_micro) AS BIGINT) AS s,
       |               CAST(MIN(xk) AS BIGINT) AS xk
       |        FROM lr)
       |SELECT kk AS k_top, xk AS x_k1_cents, s AS sum_ln_micro,
       |       CAST((kk * 1000000000) $intDiv GREATEST(CAST(1 AS BIGINT), s) AS BIGINT) AS alpha_milli
       |FROM agg""".stripMargin

  /** Exact median + MAD robust scale (Hampel 1974; the 1.4826·MAD
    * consistency factor for the normal): the outlier-immune location/
    * scale pair every robust monitor wants where mean/stddev lie. Both
    * passes find an EXACT order statistic without any global sort: the
    * value-binned hierarchical-rank idiom (bin counts map-side combine;
    * the target bin from a bounded cumulative table; within-bin
    * row_number partitioned BY BIN — the q_events_rfm machinery), run
    * once on cents and once on |cents − median| with the median joined
    * as a single broadcast row (sweep-allowlisted). Lower median on
    * ties (rank ⌈n/2⌉ with deterministic (value, key) order); all
    * arithmetic integer, the consistency factor as an exact integer
    * multiply into micro-cents.
    *
    * 100 TB shape: two scans (MAD is irreducibly two-pass), each ONE
    * bin-keyed exchange; no window ever sees more than one bin's rows.
    */
  private def madRankPick(rel: String, intDiv: String, outName: String): String =
    s"""${rel}c AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM ${rel}b GROUP BY bin),
       |${rel}o AS (SELECT a.bin, CAST(MIN(a.c) AS BIGINT) AS c,
       |                   CAST(COALESCE(SUM(b.c), 0) AS BIGINT) AS off,
       |                   CAST(MAX(tt.n) AS BIGINT) AS n
       |            FROM ${rel}c a
       |            LEFT JOIN ${rel}c b ON b.bin < a.bin
       |            CROSS JOIN (SELECT CAST(SUM(c) AS BIGINT) AS n FROM ${rel}c) tt
       |            GROUP BY a.bin),
       |${rel}t AS (SELECT bin, off, n, (n + 1) $intDiv 2 AS target FROM ${rel}o
       |            WHERE off < (n + 1) $intDiv 2
       |              AND off + c >= (n + 1) $intDiv 2),
       |${rel}r AS (SELECT x.v, o.off + row_number() OVER (PARTITION BY x.bin
       |                                                   ORDER BY x.v, x.k) AS rnk,
       |                   o.target, o.n
       |            FROM ${rel}b x JOIN ${rel}t o ON x.bin = o.bin),
       |$outName AS (SELECT v, n FROM ${rel}r WHERE rnk = target)""".stripMargin

  private def madMedSql(intDiv: String): String =
    s"""WITH po AS (SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
       |                  o_orderkey AS k
       |           FROM orders),
       |pob AS (SELECT cents AS v, k, cents $intDiv 1048576 AS bin FROM po),
       |${madRankPick("po", intDiv, "med")}
       |SELECT CAST(v AS BIGINT) AS v, n FROM med""".stripMargin

  private def madTailSql(medRel: String, intDiv: String): String =
    s"""WITH dv AS (SELECT ABS(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
       |                       - (SELECT v FROM $medRel)) AS d,
       |                  o_orderkey AS k
       |           FROM orders),
       |dvb AS (SELECT d AS v, k, d $intDiv 1048576 AS bin FROM dv),
       |${madRankPick("dv", intDiv, "mad")}
       |SELECT mad.n AS n,
       |       (SELECT CAST(v AS BIGINT) FROM $medRel) AS median_cents,
       |       CAST(mad.v AS BIGINT) AS mad_cents,
       |       CAST(mad.v * 1482602 AS BIGINT) AS sigma_robust_microcents
       |FROM mad""".stripMargin

  private def madSpark(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(madMedSql("DIV")).staged()
      .createOrReplaceTempView("graft_mad_med")
    s.sql(madTailSql("graft_mad_med", "DIV"))
  }

  private def madDuck: String =
    s"""WITH medq AS MATERIALIZED (${madMedSql("//")}),
       |res AS (${madTailSql("medq", "//")})
       |SELECT * FROM res""".stripMargin

  val specs: Map[String, QuerySpec] = Map(
    "q_stats_mad" -> QuerySpec.df(madSpark, madDuck),
    "q_events_stickiness" -> sql2(
      stickinessSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV",
        "explode(sequence(d, d + 6))"),
      stickinessSql("epoch_us(ts)", "//",
        "unnest(range(d, d + 7))")),
    "q_stats_hill_tail" -> sql2(
      s"WITH ${hillTail(graft.llm.NeutralMath.SparkKernel, "DIV")}",
      s"WITH ${hillTail(graft.llm.NeutralMath.OracleKernel, "//")}"),
    "q_events_interarrival" -> sql2(
      interarrivalSql("unix_micros(CAST(ts AS TIMESTAMP))", "DIV"),
      interarrivalSql("epoch_us(ts)", "//")),
    "q_stats_chi2" -> QuerySpec.sql(chi2Sql),
    "q_stats_spearman" -> sql2(spearmanSql("DIV"), spearmanSql("//")),
    "q_stats_anova" -> sql2(anovaSql("DIV"), anovaSql("//")),
    "q_stats_kendall" -> sql2(kendallSql("DIV"), kendallSql("//")),
    "q_stats_bh_fdr" -> sql2(
      bhFdrSql(graft.llm.NeutralMath.SparkKernel, "explode(sequence(0, 63))", "DIV"),
      bhFdrSql(graft.llm.NeutralMath.OracleKernel, "unnest(range(0, 64))", "//")),
    "q_stats_ols" -> QuerySpec.sql(olsSql))
}
