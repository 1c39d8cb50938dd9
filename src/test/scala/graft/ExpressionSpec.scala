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
}
