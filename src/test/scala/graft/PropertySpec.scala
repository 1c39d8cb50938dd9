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

  test("minhash LSH finds exact-duplicate texts with jaccard 1.0 and no false positives") {
    import spark.implicits._
    // identical texts => identical shingle sets => identical minhash
    // signature => guaranteed band collision (recall = 1 for exact dups)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s0", 60L),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank", "en", "s1", 60L),
      (2L, "completely different words about spark shuffle partitions and codegen stages", "en", "s2", 70L),
      (3L, "completely different words about spark shuffle partitions and codegen stages", "en", "s3", 70L),
      (4L, "a third unrelated document mentioning minhash banding and jaccard filters", "en", "s4", 70L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lshtest").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q31_minhash_lsh")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((0L, 1L, 1.0), (2L, 3L, 1.0)),
      s"LSH pairs wrong: ${pairs.mkString(", ")}")
  }

  test("approx_count_distinct is within the declared 1% rsd of exact") {
    val li = Tables(spark, sfDir, "lineitem")
    val approx = SparkEntry.queries("q13_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex < 0.05,
        s"flag $k: approx $ap vs exact $ex beyond tolerance")
    }
  }

  test("percentile_approx lands within rank-error bounds of exact percentile") {
    val li = Tables(spark, sfDir, "lineitem")
    // accuracy 100 => rank error <= 1/100; check the p50 approximation
    // sits between the exact p45 and p55 per group
    val rows = li.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile_approx(l_extendedprice, 0.5, 100)").as("ap50"),
        expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(ap >= lo && ap <= hi,
        s"${r.getString(0)}: approx p50 $ap outside exact [$lo, $hi]")
    }
  }

  test("window ranks are >=1 and rn >= rk >= drk") {
    val df = SparkEntry.queries("q16_window_rank")(spark, sfDir)
    assert(df.filter(col("rn") < 1 || col("rk") < 1 || col("drk") < 1).count() == 0)
    assert(df.filter(col("rn") < col("rk") || col("rk") < col("drk")).count() == 0)
  }

  test("HLL shard sketches union to the one-pass sketch; both near exact") {
    val r = SparkEntry.queries("q94_hll_shards")(spark, sfDir).head()
    val (merged, direct, exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(merged == direct,
      s"sketch union must be lossless: merged=$merged direct=$direct")
    // datasketches HLL rsd at lgK=12 is ~1.04/sqrt(4096) ≈ 1.6%; 3σ gate
    assert(math.abs(direct - exact) / exact.toDouble < 0.05,
      s"estimate $direct too far from exact $exact")
  }
}
