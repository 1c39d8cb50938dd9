package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The native CosineSimilarity expression: SQL registration, codegen vs
  * interpreted parity, parity with the higher-order-function formulation,
  * and null/edge behavior.
  */
class ExpressionSpec extends SparkSpec {

  test("cosine_sim is registered and callable from SQL") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("expression matches the HOF formulation bit-for-bit on fixture embeddings") {
    GraftFunctions.ensureRegistered(spark)
    val e = Tables(spark, sfDir, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val hofDot = aggregate(zip_with(col("embedding"), col("q"),
      (x, y) => x.cast(DoubleType) * y.cast(DoubleType)), lit(0.0), _ + _)
    val hofNorm = (c: org.apache.spark.sql.Column) => sqrt(aggregate(
      transform(c, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), _ + _))
    val both = e.crossJoin(broadcast(qv)).select(
      call_function("cosine_sim", col("embedding"), col("q")).as("native"),
      (hofDot / (hofNorm(col("embedding")) * hofNorm(col("q")))).as("hof"))
    // bit-identical accumulation: exact equality, not approximate
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("null inputs yield null; orthogonal vectors yield 0") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>),
        |                  CAST(array(1.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head()
    assert(r.isNullAt(0))
    val o = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head().getDouble(0)
    assert(o == 0.0)
  }

  test("type mismatch is an analysis-time error") {
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      spark.sql("SELECT cosine_sim(array('a'), array('b'))").collect()
    }
  }

  test("null ELEMENTS contribute 0, not a crash (containsNull input)") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, NULL, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 2.0, 0.0) AS ARRAY<FLOAT>)) AS s"""
        .stripMargin).head().getDouble(0)
    // null elem = 0 contribution: dot=1, |x|=1, |y|=sqrt(5)
    assert(math.abs(r - 1.0 / math.sqrt(5.0)) < 1e-12)
  }

  test("simhash matches the per-bit HOF formulation on fixture documents") {
    GraftFunctions.ensureRegistered(spark)
    val hs = transform(graft.api.Graft.tokenSet(col("text")),
      t => graft.api.Graft.phash32(t))
    val hof = (0 until 32).map { b =>
      val vote = aggregate(col("__hs"), lit(0L), (acc, h) =>
        acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val both = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), hs.as("__hs"))
      .select(call_function("simhash", col("__hs"), lit(32)).as("native"),
        hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("simhash: null element votes -1 on every bit (HOF parity); null array is null") {
    GraftFunctions.ensureRegistered(spark)
    // [3, NULL]: bit0 votes +1-1=0 -> unset; bit1 votes +1-1=0 -> unset
    val r = spark.sql(
      "SELECT simhash(array(3L, CAST(NULL AS BIGINT)), 2) AS s").head().getLong(0)
    assert(r == 0L)
    // [3, 1]: bit0 +2 -> set; bit1 0 -> unset
    val r2 = spark.sql("SELECT simhash(array(3L, 1L), 2) AS s").head().getLong(0)
    assert(r2 == 1L)
    assert(spark.sql("SELECT simhash(CAST(NULL AS ARRAY<BIGINT>), 2) AS s")
      .head().isNullAt(0))
  }

  test("simhash bits bounds are analysis-time errors") {
    GraftFunctions.ensureRegistered(spark)
    intercept[Exception] {
      spark.sql("SELECT simhash(array(1L), 0)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT simhash(array(1L), 65)").collect()
    }
  }
}
