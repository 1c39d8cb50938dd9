package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, MapType, StringType}

/** Composite / SQL-surface coverage pack (q110+): correlated LATERAL
  * subqueries, the map higher-order-function family, and bitwise aggregate
  * rollups.
  *
  * Scale posture: every query here is a single keyed exchange (LATERAL
  * decorrelates to a window over the join key; the map HOFs are per-row
  * projections; the bit aggregates partial-combine map-side). Nothing is
  * quadratic and nothing collects to the driver.
  */
object Composite {

  val qs: Seq[Q] = Seq(

    // Q110 — correlated LATERAL subquery: top-2 orders per customer by
    // price, expressed as `customer, LATERAL (... LIMIT 2)`. Catalyst
    // decorrelates this into a window/row_number over a single hash join —
    // the same plan a hand-written top-k-per-key would produce, so the
    // declarative SQL surface costs nothing at scale. DuckDB runs the
    // identical SQL text shape.
    Q("q110_lateral",
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
                |FROM customer c,
                |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                |         WHERE o.o_custkey = c.c_custkey
                |         ORDER BY o_totalprice DESC, o_orderkey
                |         LIMIT 2) t
                |WHERE c.c_custkey <= 300
                |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
             |FROM customer c,
             |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             |         WHERE o.o_custkey = c.c_custkey
             |         ORDER BY o_totalprice DESC, o_orderkey
             |         LIMIT 2) t
             |WHERE c.c_custkey <= 300
             |ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""".stripMargin)),

    // Q111 — map higher-order functions: transform_values, map_filter,
    // map_zip_with over a deterministically synthesized 3-entry map. The
    // oracle never touches map types: the keys are fixed ('a','b','c'), so
    // DuckDB recomputes each transformed entry as plain scalar arithmetic
    // and rebuilds the same canonical "k=v" string — the comparison checks
    // the HOF *semantics*, not a shared map runtime.
    Q("q111_map_hof",
      (s, d) => {
        val base = Tables(s, d, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("v"),
            length(col("event_type")).as("tl"))
          .select(col("event_id"),
            map_from_arrays(
              array(lit("a"), lit("b"), lit("c")),
              array(col("v"), (col("v") * 3) % 97, col("tl"))).as("m1"),
            col("v"), col("tl"))
        base.select(
            col("event_id"),
            array_join(
              array_sort(transform(
                map_entries(transform_values(col("m1"),
                  (_, v) => v * 2)),
                e => concat(e.getField("key"), lit("="),
                  e.getField("value").cast(StringType)))),
              ",").as("doubled"),
            size(map_keys(map_filter(col("m1"),
              (_, v) => v >= 50))).as("n_high"),
            aggregate(
              map_values(map_zip_with(col("m1"), col("m1"),
                (_, x, y) => x + y)),
              lit(0L), (acc, x) => acc + x).as("zsum"))
          .orderBy(col("event_id"))
      },
      Some("""WITH b AS (
             |  SELECT event_id,
             |    CAST(json_extract_string(props, '$.k') AS INT) AS v,
             |    length(event_type) AS tl
             |  FROM events)
             |SELECT event_id,
             |  'a=' || CAST(v*2 AS VARCHAR) ||
             |  ',b=' || CAST(((v*3)%97)*2 AS VARCHAR) ||
             |  ',c=' || CAST(tl*2 AS VARCHAR) AS doubled,
             |  CAST((CASE WHEN v >= 50 THEN 1 ELSE 0 END) +
             |       (CASE WHEN (v*3)%97 >= 50 THEN 1 ELSE 0 END) +
             |       (CASE WHEN tl >= 50 THEN 1 ELSE 0 END) AS INT) AS n_high,
             |  CAST(2*v + 2*((v*3)%97) + 2*tl AS BIGINT) AS zsum
             |FROM b ORDER BY event_id""".stripMargin)),

    // Q112 — bitwise aggregate rollup: per-row feature flags packed into an
    // int, then bit_or (any), bit_and (all), bit_xor (parity) per group.
    // The flag-vector pattern is how a cleaning pipeline carries dozens of
    // boolean quality signals in one column at 100 TB; the bit aggregates
    // partial-combine map-side, so the shuffle carries one int per group
    // per partition.
    Q("q112_bitagg",
      (s, d) => {
        val flags = Tables(s, d, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus"),
            (when(col("l_returnflag") === "R", 1).otherwise(0) +
             when(col("l_linestatus") === "F", 2).otherwise(0) +
             when(col("l_quantity") > 25, 4).otherwise(0) +
             when(col("l_discount") > 0.05, 8).otherwise(0)).as("flag"))
        flags.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(expr("bit_or(flag)").cast(IntegerType).as("any_flags"),
            expr("bit_and(flag)").cast(IntegerType).as("all_flags"),
            expr("bit_xor(flag)").cast(IntegerType).as("parity"),
            sum(expr("bit_count(flag)")).cast(LongType).as("popcount"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""WITH f AS (
             |  SELECT l_returnflag, l_linestatus,
             |    (CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) +
             |    (CASE WHEN l_linestatus = 'F' THEN 2 ELSE 0 END) +
             |    (CASE WHEN l_quantity > 25 THEN 4 ELSE 0 END) +
             |    (CASE WHEN l_discount > 0.05 THEN 8 ELSE 0 END) AS flag
             |  FROM lineitem)
             |SELECT l_returnflag, l_linestatus,
             |  CAST(bit_or(flag) AS INT) AS any_flags,
             |  CAST(bit_and(flag) AS INT) AS all_flags,
             |  CAST(bit_xor(flag) AS INT) AS parity,
             |  CAST(sum(bit_count(CAST(flag AS BIGINT))) AS BIGINT)
             |    AS popcount
             |FROM f GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin))
  )
}
