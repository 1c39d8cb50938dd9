package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the Composite pack (q110-q112): LATERAL decorrelation
  * equivalence, map-HOF semantics, bitwise-aggregate identities.
  */
class CompositeSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q110 LATERAL top-2 equals the window row_number formulation") {
    val lat = run("q110_lateral")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val o = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2 && col("o_custkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lat == ref,
      s"missing=${ref -- lat}\nextra=${lat -- ref}")
    assert(lat.nonEmpty)
  }

  test("q110 decorrelates: the plan has a window, not a per-row subquery") {
    val df = run("q110_lateral")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
  }

  test("q111 map HOFs: doubled string, filter count, and zip sum agree " +
      "with scalar recomputation") {
    val rows = run("q111_map_hof").limit(200).collect()
    assert(rows.nonEmpty)
    val base = Tables(spark, sfDir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("v"),
        length(col("event_type")).as("tl"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    rows.foreach { r =>
      val (v, tl) = base(r.getLong(0))
      val b = (v * 3) % 97
      assert(r.getString(1) == s"a=${v * 2},b=${b * 2},c=${tl * 2}")
      assert(r.getInt(2) ==
        Seq(v, b, tl).count(_ >= 50))
      assert(r.getLong(3) == 2L * (v + b + tl))
    }
  }

  test("q112 bit aggregates: or covers and, popcount bounds, parity " +
      "reproduces a fold") {
    val rows = run("q112_bitagg").collect()
    assert(rows.size == 6) // 3 returnflags x 2 linestatus
    rows.foreach { r =>
      val (orF, andF) = (r.getInt(2), r.getInt(3))
      assert((orF & andF) == andF, s"and must be subset of or: $r")
      assert(orF >= 0 && orF <= 15)
    }
    // parity check against a driver-side fold on one group
    val flags = Tables(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select(
        (when(col("l_returnflag") === "R", 1).otherwise(0) +
         when(col("l_linestatus") === "F", 2).otherwise(0) +
         when(col("l_quantity") > 25, 4).otherwise(0) +
         when(col("l_discount") > 0.05, 8).otherwise(0)).as("flag"))
      .collect().map(_.getInt(0))
    val expected = flags.foldLeft(0)(_ ^ _)
    val got = rows.find(r => r.getString(0) == "R" && r.getString(1) == "F")
      .get.getInt(4) // parity column
    assert(got == expected)
  }
}
