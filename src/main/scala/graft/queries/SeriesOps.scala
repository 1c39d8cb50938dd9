package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Time-series and distribution diagnostics (round 14 wave, SURVEY.md
  * §2B-ext): autocorrelation, first-digit (Benford) audit, activity
  * grids, per-entity trend slopes, hapax rates, drawdown and CUSUM
  * change-point scans, modal prices, and order-width histograms — the
  * monitoring readouts a data pipeline runs BETWEEN ingestion rounds to
  * catch seasonality breaks, synthetic/fraudulent value injection, and
  * corpus composition shifts.
  *
  * Determinism strategy (the house recipe): monetary values ride as
  * exact integer CENTS (`CAST(CAST(x AS DECIMAL(25,6))*100 AS BIGINT)`,
  * lossless on the 2-dp fixtures), every moment/cross-product
  * accumulates in integer/decimal space, and at most ONE final
  * irrational step (sqrt/division/log10) runs per output row on
  * identical exact inputs — both engines then compute bit-identical
  * doubles.
  *
  * Scale notes: the only `Window.orderBy` sites run over the calendar-
  * bounded daily-rollup frame (~2.4k rows at ANY corpus size — the
  * documented bounded-window family); every top-k compiles to
  * TakeOrderedAndProject; everything else is keyed aggregation.
  */
object SeriesOps {

  private val D25 = DecimalType(25, 6)
  private val D19 = DecimalType(19, 0)
  // cross-product accumulator width: daily cents grow with scale factor
  // (~1.5e10·SF), so Σx² ≈ 2.4e3 · (1.5e10·SF)² ≈ 5.4e23·SF² — 33 digits
  // hold past SF 40,000, and 33 (not 38) keeps the oracle-side
  // DECIMAL(5,0) × sum product within DuckDB's 38-digit multiply cap
  private val D33 = DecimalType(33, 0)
  private val D5 = DecimalType(5, 0)

  /** Exact per-row cents of a 2-dp monetary double. */
  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(D25) * lit(100)).cast(LongType)

  /** Daily revenue rollup in exact cents with a row index — shared by
    * the ACF/drawdown/CUSUM scans (calendar-bounded: ~2.4k rows).
    */
  private def dailyCents(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).cast(LongType).as("c"))

  val qs: Seq[Q] = Seq(

    // Q214 — autocorrelation of daily revenue at lags 1/7/28: the
    // seasonality fingerprint (weekly lag-7, monthly lag-28) that tells
    // a forecaster which q181-style naive baseline is even plausible.
    // Row-lag pairs come from a row_number equi-join (Spark's lag()
    // needs a literal offset; the join is also the shape that scales —
    // three keyed lookups, never a per-lag data pass), moments
    // accumulate exactly in DECIMAL, and Pearson's r runs as ONE double
    // expression per lag on identical integers in both engines.
    Q("q214_acf",
      (s, d) => {
        import s.implicits._
        val w = Window.orderBy(col("day")) // calendar-bounded daily frame
        val daily = dailyCents(s, d)
          .withColumn("rn", row_number().over(w).cast(LongType))
        val lags = s.createDataset(Seq(1L, 7L, 28L)).toDF("lg")
        val pairs = daily.select(col("rn"), col("c").as("y"))
          .crossJoin(broadcast(lags))
          .join(daily.select(col("rn").as("xrn"), col("c").as("x")),
            col("xrn") === col("rn") - col("lg"))
        val st = pairs.groupBy(col("lg"))
          .agg(count(lit(1)).as("n"),
            sum(col("x").cast(D19)).cast(D19).as("sx"),
            sum(col("y").cast(D19)).cast(D19).as("sy"),
            sum(col("x").cast(D19) * col("y").cast(D19)).cast(D33).as("sxy"),
            sum(col("x").cast(D19) * col("x").cast(D19)).cast(D33).as("sxx"),
            sum(col("y").cast(D19) * col("y").cast(D19)).cast(D33).as("syy"))
        st.select(col("lg").as("lag_d"), col("n"),
          (round(
            (col("n").cast(D5) * col("sxy") - col("sx") * col("sy"))
              .cast(DoubleType) /
              (sqrt((col("n").cast(D5) * col("sxx") - col("sx") * col("sx"))
                .cast(DoubleType)) *
                sqrt((col("n").cast(D5) * col("syy") - col("sy") * col("sy"))
                  .cast(DoubleType))), 6) + lit(0d)).as("acf"))
          .orderBy(col("lag_d"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100
             |      AS BIGINT)) AS BIGINT) AS c,
             |    CAST(row_number() OVER (ORDER BY CAST(o_orderdate AS DATE))
             |      AS BIGINT) AS rn
             |  FROM orders GROUP BY CAST(o_orderdate AS DATE)),
             |pairs AS (
             |  SELECT lg, y.c AS y, x.c AS x
             |  FROM daily y
             |  CROSS JOIN (VALUES (CAST(1 AS BIGINT)),(7),(28)) AS lags(lg)
             |  JOIN daily x ON x.rn = y.rn - lg),
             |s AS (
             |  SELECT lg, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(x AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sx,
             |    CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sy,
             |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
             |      AS DECIMAL(33,0)) AS sxy,
             |    CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
             |      AS DECIMAL(33,0)) AS sxx,
             |    CAST(sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
             |      AS DECIMAL(33,0)) AS syy
             |  FROM pairs GROUP BY lg)
             |SELECT lg AS lag_d, n,
             |  round(CAST(CAST(n AS DECIMAL(5,0)) * sxy - sx * sy AS DOUBLE) /
             |    (sqrt(CAST(CAST(n AS DECIMAL(5,0)) * sxx - sx * sx
             |       AS DOUBLE)) *
             |     sqrt(CAST(CAST(n AS DECIMAL(5,0)) * syy - sy * sy
             |       AS DOUBLE))), 6) + 0.0 AS acf
             |FROM s ORDER BY lag_d""".stripMargin)),

    // Q215 — Benford first-digit audit of order totals: synthetic or
    // hand-keyed monetary data breaks the log-curve first-digit law
    // long before any aggregate looks wrong — the cheapest fraud/
    // synthetic-data screen there is. The digit comes from the CENTS
    // integer's decimal string (log10-free digit extraction — floor/log
    // on doubles near powers of ten misrounds cross-engine); counts are
    // exact; share and the Benford reference are one division / one
    // log10 per output row (9 rows).
    Q("q215_benford",
      (s, d) => {
        val digits = Tables(s, d, "orders")
          .where(col("o_totalprice") > 0)
          .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
            .cast(LongType).as("digit"))
          .groupBy(col("digit")).agg(count(lit(1)).as("n"))
        val tot = digits.agg(sum(col("n")).cast(LongType).as("tot"))
        digits.crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            (round(col("n").cast(DoubleType) / col("tot").cast(DoubleType),
              6) + lit(0d)).as("share"),
            (round(log10(lit(1.0) + lit(1.0) / col("digit")
              .cast(DoubleType)), 6) + lit(0d)).as("benford_p"))
          .orderBy(col("digit"))
      },
      Some("""WITH d AS (
             |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
             |    AS DECIMAL(25,6)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
             |    AS BIGINT) AS digit
             |  FROM orders WHERE o_totalprice > 0),
             |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
             |      FROM d GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
             |SELECT digit, n,
             |  round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0.0
             |    AS share,
             |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) + 0.0
             |    AS benford_p
             |FROM c CROSS JOIN t ORDER BY digit""".stripMargin)),

    // Q216 — weekday×hour activity grid: event count and distinct users
    // per (dow, hour) cell — the 168-cell load heatmap capacity planning
    // and anomaly baselining start from (q185 gives the per-day peak;
    // this gives the weekly shape). Pure keyed aggregation; Spark's
    // Sunday=1 dayofweek is shifted to DuckDB's Sunday=0.
    Q("q216_activity_grid",
      (s, d) => {
        Tables(s, d, "events")
          .groupBy((dayofweek(col("ts")) - lit(1)).cast(LongType).as("dow"),
            hour(col("ts")).cast(LongType).as("hr"))
          .agg(count(lit(1)).as("n_events"),
            count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("dow"), col("hr"))
      },
      Some("""SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
             |  CAST(hour(ts) AS BIGINT) AS hr,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY 1, 2 ORDER BY dow, hr""".stripMargin)),

    // Q217 — per-customer spend trend: the OLS slope of order value
    // (cents) over time per customer — the growth/churn direction
    // feature a lifetime-value model wants next to q187's cohort
    // triangle. Closed-form slope from exact integer sums (x = days
    // since a fixed epoch, y = cents; every Σ fits BIGINT by
    // construction), one final division; constant-x customers and
    // n<5 are skipped.
    Q("q217_cust_trend",
      (s, d) => {
        val pts = Tables(s, d, "orders")
          .select(col("o_custkey"),
            datediff(to_date(col("o_orderdate")),
              lit("1990-01-01").cast("date")).cast(LongType).as("x"),
            cents(col("o_totalprice")).as("y"))
        pts.groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("x")).cast(LongType).as("sx"),
            sum(col("y")).cast(LongType).as("sy"),
            sum(col("x") * col("y")).cast(LongType).as("sxy"),
            sum(col("x") * col("x")).cast(LongType).as("sxx"))
          .where(col("n") >= 5 &&
            col("n") * col("sxx") - col("sx") * col("sx") > 0)
          .select(col("o_custkey"), col("n").as("n_orders"),
            (round((col("n") * col("sxy") - col("sx") * col("sy"))
              .cast(DoubleType) /
              (col("n") * col("sxx") - col("sx") * col("sx"))
                .cast(DoubleType), 6) + lit(0d)).as("slope_cents_per_day"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH pts AS (
             |  SELECT o_custkey,
             |    CAST(datediff('day', DATE '1990-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
             |    CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100 AS BIGINT)
             |      AS y
             |  FROM orders),
             |s AS (
             |  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM pts GROUP BY 1)
             |SELECT o_custkey, n AS n_orders,
             |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
             |        CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0.0
             |    AS slope_cents_per_day
             |FROM s WHERE n >= 5 AND n * sxx - sx * sx > 0
             |ORDER BY o_custkey""".stripMargin)),

    // Q218 — hapax legomena rate per source: the share of a source's
    // vocabulary seen exactly once — high hapax = fresh/diverse text,
    // collapsing hapax = templated or looped generation (the
    // vocabulary-health dual of q170's growth curve and q200's TTR).
    // One explode → (source, tok) count → source aggregate.
    Q("q218_hapax",
      (s, d) => {
        Tables(s, d, "documents")
          .select(col("source"),
            explode(split(lower(col("text")), " ")).as("tok"))
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("vocab"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"))
          .select(col("source"), col("vocab"), col("hapax"),
            (round(col("hapax").cast(DoubleType) /
              col("vocab").cast(DoubleType), 6) + lit(0d)).as("hapax_rate"))
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (
             |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT source, unnest(string_split(lower(text), ' '))
             |      AS tok
             |    FROM documents) GROUP BY 1, 2)
             |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
             |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS hapax,
             |  round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) + 0.0 AS hapax_rate
             |FROM tok GROUP BY source ORDER BY source""".stripMargin)),

    // Q219 — worst revenue drawdowns: the ten days furthest below the
    // running daily-revenue peak — the "how bad did it get" readout a
    // plain daily chart hides (and the finance dual of q72's KS drift).
    // All arithmetic stays in exact integer cents — NO rounding step at
    // all; the running peak rides the calendar-bounded day frame and
    // the top-10 is TakeOrderedAndProject.
    Q("q219_drawdown",
      (s, d) => {
        val w = Window.orderBy(col("day")) // calendar-bounded daily frame
        // LongType is safe here (unlike q220's DECIMAL(38,0) cumulative):
        // this window is a running MAX, never a sum — its value is one
        // day's revenue cents (~1e13·SF), nowhere near the int64 edge
        dailyCents(s, d)
          .withColumn("peak", max(col("c")).over(w).cast(LongType))
          .select(col("day"), col("c").as("rev_cents"),
            col("peak").as("peak_cents"),
            (col("peak") - col("c")).cast(LongType).as("drawdown_cents"))
          .orderBy(col("drawdown_cents").desc, col("day"))
          .limit(10)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100
             |      AS BIGINT)) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |r AS (
             |  SELECT day, c,
             |    CAST(max(c) OVER (ORDER BY day) AS BIGINT) AS peak
             |  FROM daily)
             |SELECT day, c AS rev_cents, peak AS peak_cents,
             |  CAST(peak - c AS BIGINT) AS drawdown_cents
             |FROM r ORDER BY drawdown_cents DESC, day LIMIT 10"""
        .stripMargin)),

    // Q220 — CUSUM change-point scan over daily revenue: the five days
    // where the cumulative deviation from the global mean peaks — where
    // a level shift most plausibly happened (q106 decomposes seasonality;
    // this localizes breaks). Scale-free exactness trick: instead of
    // cum(rev − mean) (a division), accumulate cum(rev·N − total) —
    // the same curve times N, entirely exact. The per-term product sits
    // ~1e13·2.4e3 ≈ 2.4e16·SF, so the CUMULATIVE rides DECIMAL(38,0)
    // (the house pattern q83/q80/q196 use, and what this query's own
    // oracle does) — a LongType window sum would brush the int64 edge on
    // a long adverse run at large SF. One cast to BIGINT at the end,
    // AFTER the abs-ordering, mirrors the oracle exactly. The global
    // (N, total) pair rides a broadcast one-row frame.
    Q("q220_cusum",
      (s, d) => {
        val D38 = DecimalType(38, 0)
        val daily = dailyCents(s, d)
        val tot = daily.agg(count(lit(1)).cast(LongType).as("nd"),
          sum(col("c")).cast(LongType).as("tc"))
        val w = Window.orderBy(col("day")) // calendar-bounded daily frame
        daily.crossJoin(broadcast(tot))
          .withColumn("cusum",
            sum((col("c") * col("nd") - col("tc")).cast(D38)).over(w)
              .cast(D38))
          .orderBy(abs(col("cusum")).desc, col("day"))
          .select(col("day"), col("cusum").cast(LongType).as("cusum_scaled"))
          .limit(5)
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100
             |      AS BIGINT)) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS nd,
             |        CAST(sum(c) AS BIGINT) AS tc FROM daily),
             |cs AS (
             |  SELECT day,
             |    CAST(sum(c * nd - tc) OVER (ORDER BY day)
             |      AS DECIMAL(38,0)) AS cusum
             |  FROM daily CROSS JOIN tot)
             |SELECT day, CAST(cusum AS BIGINT) AS cusum_scaled
             |FROM cs ORDER BY abs(cusum) DESC, day LIMIT 5""".stripMargin)),

    // Q221 — modal retail price per brand: the most frequent exact
    // price point (count desc, then lowest price — fully deterministic
    // tiebreak), the price-book anchor q190's dispersion audit compares
    // against. One (brand, cents) count + a brand-keyed rank window.
    Q("q221_price_mode",
      (s, d) => {
        val pc = Tables(s, d, "part")
          .groupBy(col("p_brand"),
            cents(col("p_retailprice")).as("price_cents"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("n").desc, col("price_cents"))
        pc.withColumn("r", row_number().over(w))
          .where(col("r") === 1)
          .select(col("p_brand"), col("price_cents").as("modal_price_cents"),
            col("n").as("n_parts"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH pc AS (
             |  SELECT p_brand,
             |    CAST(CAST(p_retailprice AS DECIMAL(25,6)) * 100 AS BIGINT)
             |      AS price_cents,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM part GROUP BY 1, 2),
             |rk AS (
             |  SELECT p_brand, price_cents, n,
             |    row_number() OVER (PARTITION BY p_brand
             |      ORDER BY n DESC, price_cents) AS r
             |  FROM pc)
             |SELECT p_brand, price_cents AS modal_price_cents, n AS n_parts
             |FROM rk WHERE r = 1 ORDER BY p_brand""".stripMargin)),

    // Q222 — order-width histogram: how many orders have k line items —
    // the join-fanout profile that sizes every orders⋈lineitem shuffle
    // (and the skew early-warning for q47's salted join). Two keyed
    // aggregates, nothing else.
    Q("q222_order_width",
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_lines"))
          .groupBy(col("n_lines"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_lines"))
      },
      Some("""WITH w AS (
             |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
             |  FROM lineitem GROUP BY 1)
             |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders
             |FROM w GROUP BY n_lines ORDER BY n_lines""".stripMargin)),

    // Q224 — corpus composition grid: doc count and char mass per
    // (lang, length bucket) — the mix a training-data sampler balances
    // against (q192 gives bytes/token per language; this gives the
    // joint SHAPE). Buckets are exact integer floor-division (never an
    // ntile, which would funnel the corpus through one ranking task).
    Q("q224_len_lang_grid",
      (s, d) => {
        Tables(s, d, "documents")
          .groupBy(col("lang"),
            least(floor(col("n_chars") / 256), lit(20))
              .cast(LongType).as("len_bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast(LongType).as("total_chars"))
          .orderBy(col("lang"), col("len_bucket"))
      },
      Some("""SELECT lang,
             |  CAST(least(n_chars // 256, 20) AS BIGINT) AS len_bucket,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM documents GROUP BY 1, 2
             |ORDER BY lang, len_bucket""".stripMargin)),

    // Q225 — order-priority mix shift: monthly share per priority, top-5
    // month-over-month swings — the workload-mix drift alarm (q207 does
    // this for the supplier ledger, q179 for vocabulary). Shares divide
    // exact counts; the lag window is priority-keyed over the
    // calendar-bounded month axis; top-5 via TakeOrderedAndProject with
    // a full (|swing|, mon, pri) tiebreak.
    Q("q225_priority_shift",
      (s, d) => {
        val m = Tables(s, d, "orders")
          .groupBy(trunc(col("o_orderdate"), "month").as("mon"),
            col("o_orderpriority").as("pri"))
          .agg(count(lit(1)).as("n"))
        val tot = m.groupBy(col("mon")).agg(sum(col("n")).as("t"))
        val w = Window.partitionBy(col("pri")).orderBy(col("mon"))
        m.join(tot, "mon")
          .select(col("mon"), col("pri"),
            (round(col("n").cast(DoubleType) / col("t").cast(DoubleType),
              6) + lit(0d)).as("share"))
          .withColumn("swing",
            round(col("share") - lag(col("share"), 1).over(w), 6) + lit(0d))
          .where(col("swing").isNotNull)
          .select(to_date(col("mon")).as("mon"), col("pri"), col("share"),
            col("swing"))
          .orderBy(abs(col("swing")).desc, col("mon"), col("pri"))
          .limit(5)
      },
      Some("""WITH m AS (
             |  SELECT date_trunc('month', o_orderdate) AS mon,
             |    o_orderpriority AS pri, CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY 1, 2),
             |tot AS (SELECT mon, CAST(sum(n) AS BIGINT) AS t
             |        FROM m GROUP BY 1),
             |sh AS (
             |  SELECT m.mon, pri,
             |    round(CAST(n AS DOUBLE)/CAST(t AS DOUBLE), 6) + 0.0
             |      AS share
             |  FROM m JOIN tot ON m.mon = tot.mon),
             |sw AS (
             |  SELECT CAST(mon AS DATE) AS mon, pri, share,
             |    round(share - lag(share)
             |      OVER (PARTITION BY pri ORDER BY mon), 6) + 0.0 AS swing
             |  FROM sh)
             |SELECT mon, pri, share, swing FROM sw
             |WHERE swing IS NOT NULL
             |ORDER BY abs(swing) DESC, mon, pri LIMIT 5""".stripMargin)),

    // Q226 — nation→nation trade-flow matrix (TPC-H Q7's readout,
    // generalized to the full 25×25 grid): supplier nation × customer
    // nation line count and exact-cents revenue. Five joins — the two
    // fact joins shuffle on their keys once each, the three dimension
    // joins broadcast — then one 625-row aggregate; the canonical
    // multiway-join shape at any scale.
    Q("q226_nation_flow",
      (s, d) => {
        Tables(s, d, "lineitem")
          .join(Tables(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables(s, d, "nation")
            .select(col("n_nationkey").as("snk"),
              col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .join(broadcast(Tables(s, d, "nation")
            .select(col("n_nationkey").as("cnk"),
              col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cnk"))
          .groupBy(col("supp_nation"), col("cust_nation"))
          .agg(count(lit(1)).as("n_lines"),
            sum(cents(col("l_extendedprice"))).cast(LongType)
              .as("rev_cents"))
          .orderBy(col("supp_nation"), col("cust_nation"))
      },
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(25,6)) * 100
             |    AS BIGINT)) AS BIGINT) AS rev_cents
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |GROUP BY 1, 2 ORDER BY supp_nation, cust_nation"""
        .stripMargin)),

    // Q227 — cross-source duplicate-family audit: fingerprint-family
    // pairs whose members live in DIFFERENT sources — the contamination
    // DIRECTION readout q206's size histogram aggregates away (which
    // source pairs share content decides which to de-prioritize). Same
    // 5-token-prefix fingerprint as q206; family sizes are tiny so the
    // signature equi-join never quadratic-blows.
    Q("q227_cross_source_dups",
      (s, d) => {
        val sig = Tables(s, d, "documents")
          .select(col("doc_id"), col("source"),
            md5(concat_ws(" ",
              slice(split(lower(col("text")), " "), 1, 5))).as("h"))
        val a = sig.select(col("h"), col("doc_id").as("id_a"),
          col("source").as("src_a"))
        val b = sig.select(col("h"), col("doc_id").as("id_b"),
          col("source").as("src_b"))
        a.join(b, Seq("h"))
          .where(col("id_a") < col("id_b") && col("src_a") =!= col("src_b"))
          .select(least(col("src_a"), col("src_b")).as("src_1"),
            greatest(col("src_a"), col("src_b")).as("src_2"))
          .groupBy(col("src_1"), col("src_2"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("src_1"), col("src_2"))
      },
      Some("""WITH sig AS (
             |  SELECT doc_id, source,
             |    md5(array_to_string(string_split(lower(text), ' ')[1:5],
             |      ' ')) AS h
             |  FROM documents),
             |p AS (
             |  SELECT least(a.source, b.source) AS src_1,
             |    greatest(a.source, b.source) AS src_2
             |  FROM sig a JOIN sig b ON a.h = b.h AND a.doc_id < b.doc_id
             |  WHERE a.source <> b.source)
             |SELECT src_1, src_2, CAST(count(*) AS BIGINT) AS n_pairs
             |FROM p GROUP BY 1, 2 ORDER BY src_1, src_2""".stripMargin)),

    // Q228 — month-of-year seasonal index: each calendar month's revenue
    // share times 12 (1.0 = no seasonality) — the coarse seasonal
    // profile q106's daily decomposition refines; exact cents, one
    // division per output row, broadcast 1-row total.
    Q("q228_seasonal_index",
      (s, d) => {
        val m = Tables(s, d, "orders")
          .groupBy(month(col("o_orderdate")).cast(LongType).as("mon"))
          .agg(sum(cents(col("o_totalprice"))).cast(LongType).as("c"))
        val tot = m.agg(sum(col("c")).cast(LongType).as("tc"))
        m.crossJoin(broadcast(tot))
          .select(col("mon"), col("c").as("rev_cents"),
            (round(lit(12.0) * col("c").cast(DoubleType) /
              col("tc").cast(DoubleType), 6) + lit(0d))
              .as("seasonal_index"))
          .orderBy(col("mon"))
      },
      Some("""WITH m AS (
             |  SELECT CAST(month(o_orderdate) AS BIGINT) AS mon,
             |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100
             |      AS BIGINT)) AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |t AS (SELECT CAST(sum(c) AS BIGINT) AS tc FROM m)
             |SELECT mon, c AS rev_cents,
             |  round(12.0 * CAST(c AS DOUBLE) / CAST(tc AS DOUBLE), 6)
             |    + 0.0 AS seasonal_index
             |FROM m CROSS JOIN t ORDER BY mon""".stripMargin)),

    // Q230 — calendar-gap detection: days in the corpus's date span with
    // NO orders at all — the ingestion-hole alarm a per-day rollup can
    // never show (absent days simply aren't rows). The date spine
    // explodes from ONE broadcast (lo, hi) row — ~2.4k rows regardless
    // of corpus size — and anti-matches the distinct order days.
    Q("q230_gap_days",
      (s, d) => {
        val o = Tables(s, d, "orders")
        val b = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
          max(to_date(col("o_orderdate"))).as("hi"))
        val spine = b.select(explode(sequence(col("lo"), col("hi")))
          .as("day"))
        val have = o.select(to_date(col("o_orderdate")).as("day"))
          .distinct().withColumn("hit", lit(1))
        spine.join(have, Seq("day"), "left")
          .agg(count(lit(1)).as("n_days"),
            sum(when(col("hit").isNull, 1L).otherwise(0L))
              .as("n_gap_days"),
            min(when(col("hit").isNull, col("day"))).as("first_gap"))
      },
      Some("""WITH b AS (
             |  SELECT min(CAST(o_orderdate AS DATE)) AS lo,
             |    max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
             |spine AS (
             |  SELECT CAST(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) AS DATE) AS day
             |  FROM b),
             |have AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day
             |         FROM orders)
             |SELECT CAST(count(*) AS BIGINT) AS n_days,
             |  CAST(sum(CASE WHEN have.day IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_gap_days,
             |  CAST(min(CASE WHEN have.day IS NULL THEN spine.day END)
             |    AS DATE) AS first_gap
             |FROM spine LEFT JOIN have ON spine.day = have.day"""
        .stripMargin)),

    // Q231 — character-class hygiene profile per language: alpha/digit/
    // space/other shares — the encoding-damage and boilerplate-noise
    // screen that runs before any tokenizer (mojibake and markup inflate
    // "other"). Per-row counts by the length-difference trick (one
    // codegen regexp per class, no explode), exact integer sums, one
    // division per output row.
    Q("q231_char_classes",
      (s, d) => {
        val t = col("text")
        Tables(s, d, "documents")
          .groupBy(col("lang"))
          .agg(
            sum(length(t)).cast(LongType).as("n_chars"),
            sum(length(t) - length(regexp_replace(t, "[a-zA-Z]", "")))
              .cast(LongType).as("n_alpha"),
            sum(length(t) - length(regexp_replace(t, "[0-9]", "")))
              .cast(LongType).as("n_digit"),
            sum(length(t) - length(translate(t, " ", "")))
              .cast(LongType).as("n_space"))
          .select(col("lang"), col("n_chars"), col("n_alpha"),
            col("n_digit"), col("n_space"),
            (col("n_chars") - col("n_alpha") - col("n_digit") -
              col("n_space")).cast(LongType).as("n_other"),
            (round(col("n_alpha").cast(DoubleType) /
              col("n_chars").cast(DoubleType), 6) + lit(0d))
              .as("alpha_ratio"))
          .orderBy(col("lang"))
      },
      Some("""WITH c AS (
             |  SELECT lang,
             |    CAST(sum(length(text)) AS BIGINT) AS n_chars,
             |    CAST(sum(length(text) - length(regexp_replace(text,
             |      '[a-zA-Z]', '', 'g'))) AS BIGINT) AS n_alpha,
             |    CAST(sum(length(text) - length(regexp_replace(text,
             |      '[0-9]', '', 'g'))) AS BIGINT) AS n_digit,
             |    CAST(sum(length(text) - length(replace(text, ' ', '')))
             |      AS BIGINT) AS n_space
             |  FROM documents GROUP BY lang)
             |SELECT lang, n_chars, n_alpha, n_digit, n_space,
             |  CAST(n_chars - n_alpha - n_digit - n_space AS BIGINT)
             |    AS n_other,
             |  round(CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
             |    + 0.0 AS alpha_ratio
             |FROM c ORDER BY lang""".stripMargin))
  )
}
