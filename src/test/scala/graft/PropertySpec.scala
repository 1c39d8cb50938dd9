package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Algebraic laws over the fixture tables (SURVEY.md §5.2). */
class PropertySpec extends SparkSpec {

  test("semi ⊎ anti partition the left input") {
    val c = Tables(spark, sfDir, "customer")
    val o = Tables(spark, sfDir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti").count()
    assert(semi + anti == c.count())
  }

  test("union all counts add; union distinct bounded by sum") {
    val a = Tables(spark, sfDir, "customer").select(col("c_custkey").as("k"))
    val b = Tables(spark, sfDir, "supplier").select(col("s_suppkey").as("k"))
    assert(a.union(b).count() == a.count() + b.count())
    assert(a.union(b).distinct().count() <= a.count() + b.count())
  }

  test("dedup is idempotent") {
    val q = SparkEntry.queries("q30_dedup_exact")
    val once = q(spark, sfDir)
    // keep-first over an already-deduped input changes nothing
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))
    val twice = once.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    assert(twice.count() == once.count())
    assert(twice.exceptAll(once).isEmpty)
  }

  test("cosine similarity is within [-1,1] and sim(query,query)≈1 tops the list") {
    val top = SparkEntry.queries("q32_cosine_topk")(spark, sfDir)
      .select(col("vec_id"), col("cos_sim")).collect()
    assert(top.forall(r => r.getDouble(1) >= -1.0000001 && r.getDouble(1) <= 1.0000001))
    // the query vector (vec_id=0) is in the corpus, so it is its own top hit
    assert(top.head.getLong(0) == 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("identical token sets produce identical minhash band buckets (recall=1 for exact dups)") {
    // q31_neardup (signature equality) pairs must be a subset of
    // q31_minhash_lsh candidates surviving the jaccard filter.
    val exact = SparkEntry.queries("q31_neardup")(spark, sfDir)
    val lsh = SparkEntry.queries("q31_minhash_lsh")(spark, sfDir)
      .select(col("doc_a"), col("doc_b"))
    assert(exact.exceptAll(lsh).isEmpty,
      "an exact-duplicate pair escaped the LSH banding")
  }

  test("window ranks are >=1 and rn >= rk >= drk") {
    val df = SparkEntry.queries("q16_window_rank")(spark, sfDir)
    assert(df.filter(col("rn") < 1 || col("rk") < 1 || col("drk") < 1).count() == 0)
    assert(df.filter(col("rn") < col("rk") || col("rk") < col("drk")).count() == 0)
  }
}
