package graft

import graft.api.Graft
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k physical operator: same rows as the window
  * row_number formulation, but the plan carries TopKPerKeyExec and NO
  * sort (the bounded heap replaces it).
  */
class TopKPlanSpec extends SparkSpec {

  test("topKPerKeyFast matches the window formulation on fixture events") {
    val e = Tables(spark, sfDir, "events")
    // top 3 highest values per event_type, event_id tiebreak
    val fast = Graft.topKPerKeyFast(e, Seq("event_type"),
        Seq(("value", false), ("event_id", true)), k = 3)
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc, col("event_id"))
    val ref = e.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("event_id", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    assert(fast == ref, s"fast=${fast.size} ref=${ref.size}\n" +
      s"missing=${ref -- fast}\nextra=${fast -- ref}")
    assert(fast.size == 15) // 5 types x 3
  }

  test("the plan runs TopKPerKeyExec with a keyed exchange and no sort") {
    val e = Tables(spark, sfDir, "events")
    val df = Graft.topKPerKeyFast(e, Seq("event_type"),
      Seq(("value", false), ("event_id", true)), k = 3)
    df.collect() // force a final (possibly adaptive) plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert(p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Sort "), "the heap replaces the sort:\n" + p)
  }

  test("k larger than every group degenerates to identity") {
    val e = Tables(spark, sfDir, "nation")
    val out = Graft.topKPerKeyFast(e, Seq("n_regionkey"),
      Seq(("n_nationkey", true)), k = 1000)
    assert(out.count() == e.count())
  }
}
