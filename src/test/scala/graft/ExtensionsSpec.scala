package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The production registration path: a session built with
  * `withExtensions(new GraftExtensions)` (equivalently
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`) must
  * resolve every native function from plain SQL with NO call to
  * `ensureRegistered`. Runs in its own forked JVM (build.sbt
  * testGrouping): extensions only apply when the builder actually
  * creates the session, so the shared test session must not exist first.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("a withExtensions session resolves all native functions from SQL") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("WARN")
      val r = spark.sql(
        """SELECT
          |  cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |             array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cs,
          |  simhash(array(CAST(1 AS BIGINT), CAST(255 AS BIGINT)), 8) AS sh,
          |  dup_ngram_frac('a a a', 1) AS dup,
          |  nfc_normalize('é') AS nfc,
          |  l2_sq(array(CAST(0.0 AS DOUBLE), CAST(3.0 AS DOUBLE)),
          |        array(CAST(4.0 AS DOUBLE), CAST(0.0 AS DOUBLE))) AS l2
          |""".stripMargin).head
      assert(r.getDouble(0) == 1.0)
      assert(!r.isNullAt(1))
      assert(math.abs(r.getDouble(2) - 2.0 / 3.0) < 1e-12)
      assert(r.getString(3) == "é", "NFC must compose e + accent")
      assert(r.getDouble(4) == 25.0)
      // and the SQL catalog can DESCRIBE them (ExpressionInfo present)
      assert(spark.sql("DESCRIBE FUNCTION cosine_sim").collect()
        .exists(_.getString(0).contains("cosine_sim")))
      assert(spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
        .head().getDouble(0) == 0.9611111111111111)
      // the injected optimizer rule fires on high-threshold predicates
      val opt = spark.sql(
        """SELECT * FROM (SELECT CAST(id AS STRING) AS a, 'abc' AS b
          |               FROM range(5))
          |WHERE jaro_winkler(a, b) >= 0.9""".stripMargin)
        .queryExecution.optimizedPlan.toString
      assert(opt.contains("length("),
        "expected the length prefilter in:\n" + opt)
      // idempotent even when folding rewrites the literal side's bound:
      // the shape guard must keep the fixpoint batch at ONE copy
      assert("least\\(".r.findAllIn(opt).size == 1,
        "bound injected more than once:\n" + opt)
    } finally spark.stop()
  }
}
