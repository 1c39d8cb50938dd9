package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType, TimestampType}

/** Aggregation + window surface: hash aggregate, (approx) distinct,
  * ROLLUP/CUBE, ranking/analytic/frame windows (SURVEY.md §2B Q11–Q18).
  *
  * All double sums go through [[graft.Exact]] so results are partial-agg
  * order-independent — identical on one partition or ten thousand.
  */
object Aggregates {

  private val D = DecimalType(25, 6)

  val qs: Seq[Q] = Seq(
    Q("q11_agg_hash",
      (s, d) => {
        // TPC-H Q1 shape: map-side partial agg on 6 groups, exact decimals.
        Tables(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast(TimestampType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            Exact.dsum(col("l_quantity")).as("sum_qty"),
            Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
            Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .as("sum_disc_price"),
            Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax"))).as("sum_charge"),
            Exact.davg(col("l_quantity")).as("avg_qty"),
            Exact.davg(col("l_extendedprice")).as("avg_price"),
            Exact.davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_extendedprice")).as("max_price"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${Exact.sqlSum("l_quantity")} AS sum_qty,
              |  ${Exact.sqlSum("l_extendedprice")} AS sum_base_price,
              |  ${Exact.sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
              |  ${Exact.sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
              |  ${Exact.sqlAvg("l_quantity")} AS avg_qty,
              |  ${Exact.sqlAvg("l_extendedprice")} AS avg_price,
              |  ${Exact.sqlAvg("l_discount")} AS avg_disc,
              |  COUNT(*) AS count_order,
              |  MIN(l_quantity) AS min_qty,
              |  MAX(l_extendedprice) AS max_price
              |FROM lineitem
              |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
              |GROUP BY l_returnflag, l_linestatus
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q12_count_distinct",
      (s, d) => {
        Tables(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(countDistinct(col("o_orderpriority")).as("n_prio"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_prio,
             |  COUNT(*) AS n_orders
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // HLL++ sketches differ across engines — engine-verified only (driver
    // records a rows-only check; the rsd-tolerance vs exact is asserted in
    // PropertySpec). Deliberately NOT combined with countDistinct in one
    // agg: mixing distinct + imperative HLL aggregates forces an Expand +
    // non-codegen path that measured 15x slower than either alone.
    Q("q13_approx_distinct",
      (s, d) => {
        Tables(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
          .orderBy(col("l_returnflag"))
      },
      None),

    Q("q14_rollup",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val n = Tables(s, d, "nation")
        val r = Tables(s, d, "region")
        val o = Tables(s, d, "orders")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(Exact.dsum(col("o_totalprice")).as("revenue"),
            count(lit(1)).as("n_orders"),
            grouping(col("r_name")).cast(IntegerType).as("g_r"),
            grouping(col("n_name")).cast(IntegerType).as("g_n"))
          .select(col("r_name"), col("n_name"), col("g_r"), col("g_n"),
            col("revenue"), col("n_orders"))
          .orderBy(col("g_r"), col("g_n"), asc_nulls_first("r_name"),
            asc_nulls_first("n_name"))
      },
      Some(s"""SELECT r_name, n_name,
              |  CAST(GROUPING(r_name) AS INT) AS g_r,
              |  CAST(GROUPING(n_name) AS INT) AS g_n,
              |  ${Exact.sqlSum("o_totalprice")} AS revenue,
              |  COUNT(*) AS n_orders
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP(r_name, n_name)
              |ORDER BY g_r, g_n, r_name ASC NULLS FIRST,
              |  n_name ASC NULLS FIRST""".stripMargin)),

    Q("q15_cube",
      (s, d) => {
        Tables(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            grouping(col("o_orderstatus")).cast(IntegerType).as("g_s"),
            grouping(col("o_orderpriority")).cast(IntegerType).as("g_p"))
          .select(col("o_orderstatus"), col("o_orderpriority"), col("g_s"),
            col("g_p"), col("n_orders"))
          .orderBy(col("g_s"), col("g_p"), asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
             |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p,
             |  COUNT(*) AS n_orders
             |FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY g_s, g_p, o_orderstatus ASC NULLS FIRST,
             |  o_orderpriority ASC NULLS FIRST""".stripMargin)),

    Q("q16_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
             |  row_number() OVER w AS rn,
             |  rank() OVER w AS rk,
             |  dense_rank() OVER w AS drk
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q17_window_analytic",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q18_window_frames",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sli = w.rowsBetween(-2, Window.currentRow)
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            sum(col("o_totalprice").cast(D)).over(run).cast(DoubleType)
              .as("running_sum"),
            (sum(col("o_totalprice").cast(D)).over(sli).cast(DoubleType) /
              count(lit(1)).over(sli)).as("sliding_avg"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER run AS DOUBLE)
             |    AS running_sum,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER sli AS DOUBLE)
             |    / COUNT(*) OVER sli AS sliding_avg
             |FROM orders
             |WINDOW
             |  run AS (PARTITION BY o_custkey ORDER BY o_orderkey
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  sli AS (PARTITION BY o_custkey ORDER BY o_orderkey
             |          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin)),

    // Q18b — RANGE frame (value-based, not row-count): per-customer spend
    // over the trailing 30 DAYS — the moving-time-window aggregate ROWS
    // frames cannot express (ties and gaps in the order column change the
    // frame membership). Spark's rangeBetween takes numeric offsets, so
    // the order key is epoch days (cast identically in the oracle); the
    // windowed double sum goes through exact decimal so partition layout
    // and tie order can never change the result.
    Q("q18_range_frames",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("days"))
          .rangeBetween(-30, Window.currentRow)
        Tables(s, d, "orders")
          .withColumn("days",
            datediff(col("o_orderdate"), to_date(lit("1970-01-01")))
              .cast("long"))
          .select(col("o_orderkey"), col("o_custkey"), col("days"),
            sum(col("o_totalprice").cast(D)).over(w).cast(DoubleType)
              .as("sum_30d"),
            count(lit(1)).over(w).as("n_30d"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  datediff('day', DATE '1970-01-01', o_orderdate) AS days,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)
             |    AS sum_30d,
             |  COUNT(*) OVER w AS n_30d
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey
             |             ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
             |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
             |ORDER BY o_orderkey""".stripMargin))
  )
}
