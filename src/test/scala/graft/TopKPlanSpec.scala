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

  test("spill fallback above the resident-key bound matches the window dual") {
    // 7919 distinct keys against a 257-key residency bound forces ~30
    // heap flushes per task; the sorted-run merge must reproduce the
    // window formulation exactly.
    val df = spark.range(60000).select(
      col("id").as("event_id"),
      (col("id") % 7919).as("g"),
      ((col("id") * 2654435761L) % 100000).as("value"))
    spark.conf.set("spark.graft.topk.maxResidentKeys", "257")
    try {
      val fast = Graft.topKPerKeyFast(df, Seq("g"),
          Seq(("value", false), ("event_id", true)), k = 3)
        .select("event_id", "g", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val w = Window.partitionBy(col("g"))
        .orderBy(col("value").desc, col("event_id"))
      val ref = df.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("event_id", "g", "value")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(fast == ref, s"fast=${fast.size} ref=${ref.size}\n" +
        s"missing=${(ref -- fast).take(5)}\nextra=${(fast -- ref).take(5)}")
      assert(fast.size == 7919 * 3)
    } finally spark.conf.unset("spark.graft.topk.maxResidentKeys")
  }
}
