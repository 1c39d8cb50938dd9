package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Per-job call-site trace of one DML statement — which actions a verb
  * chain actually launches. Measurement-only tooling.
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.catalog.spark_catalog",
        "graft.sources.GraftSparkSessionCatalog")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.views(spark, sfDir)
    val s = spark
    @volatile var trace = false
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (trace) {
            val cs = Option(j.properties)
              .map(_.getProperty("callSite.short", "?")).getOrElse("?")
            val stages = j.stageInfos.map(si =>
              s"${si.name.takeWhile(_ != '\n').take(60)}").mkString(" | ")
            println(f"JOB ${j.jobId}%3d  $cs%-40s  stages=${j.stageInfos.size}  [$stages]")
          }
      })
    val loc = java.nio.file.Files.createTempDirectory("jobtrace")
      .toString + "/t"
    val name = "graft_jt.t_" +
      java.util.UUID.randomUUID.toString.replace("-", "").take(12)
    s.sql("CREATE DATABASE IF NOT EXISTS graft_jt")
    s.sql(s"""CREATE TABLE $name USING graft LOCATION '$loc' AS
      SELECT o_orderkey, o_custkey, o_totalprice,
        CAST(year(o_orderdate) AS BIGINT) AS yr
      FROM orders WHERE o_orderkey % 3 = 0""")
    s.sql(s"""UPDATE $name SET o_totalprice = o_totalprice +
      CAST(o_orderkey % 5 AS DOUBLE) WHERE yr = 1995""")
    s.sql(s"DELETE FROM $name WHERE yr = 1998")
    s.sql(s"""MERGE INTO $name AS t USING (
      SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, o_totalprice,
        CAST(year(o_orderdate) AS BIGINT) AS yr
      FROM orders WHERE o_orderkey % 4 = 0) AS s ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    println("=== merge_set ===")
    trace = true
    s.sql(s"""MERGE INTO $name AS t USING (
      SELECT o_orderkey, CAST(o_orderkey % 9 AS DOUBLE) AS bump
      FROM orders WHERE o_orderkey % 5 = 0) AS s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND t.yr >= 1996 THEN UPDATE SET
        o_totalprice = t.o_totalprice + s.bump""")
    trace = false
    println("=== merge_del ===")
    trace = true
    s.sql(s"""MERGE INTO $name AS t USING (
      SELECT o_orderkey, o_orderkey % 7 = 0 AS kill
      FROM orders WHERE o_orderkey % 2 = 0) AS s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED AND s.kill AND t.o_custkey % 2 = 0 THEN DELETE""")
    trace = false
    println("=== merge_full (fresh keys) ===")
    trace = true
    s.sql(s"""MERGE INTO $name AS t USING (
      SELECT o_orderkey, o_custkey + 2000000 AS o_custkey, o_totalprice,
        CAST(year(o_orderdate) AS BIGINT) AS yr
      FROM orders WHERE o_orderkey % 6 = 0) AS s ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    trace = false
    spark.stop()
  }
}
