package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Ad-hoc per-statement timing of the q252 vanilla-DML lifecycle: where
  * does a verb chain's wall-clock actually go (write, probe, publish)?
  * Measurement-only tooling — not part of the declared surface.
  */
object VerbProbe {
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
    // count jobs per statement
    @volatile var jobs = 0
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })
    (1 to 2).foreach { round =>
      val loc = java.nio.file.Files.createTempDirectory("verbprobe")
        .toString + "/t"
      val name = "graft_vp.t_" +
        java.util.UUID.randomUUID.toString.replace("-", "").take(12)
      s.sql("CREATE DATABASE IF NOT EXISTS graft_vp")
      def t(label: String)(body: => Unit): Unit = {
        val j0 = jobs
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"VERB round$round $label%-12s ${dt}%6.2f s  jobs=${jobs - j0}")
      }
      t("ctas") { s.sql(s"""CREATE TABLE $name USING graft LOCATION '$loc' AS
        SELECT o_orderkey, o_custkey, o_totalprice,
          CAST(year(o_orderdate) AS BIGINT) AS yr
        FROM orders WHERE o_orderkey % 3 = 0""") }
      t("update") { s.sql(s"""UPDATE $name SET o_totalprice = o_totalprice +
        CAST(o_orderkey % 5 AS DOUBLE) WHERE yr = 1995""") }
      t("delete") { s.sql(s"DELETE FROM $name WHERE yr = 1998") }
      t("merge_full") { s.sql(s"""MERGE INTO $name AS t USING (
        SELECT o_orderkey, o_custkey + 1000000 AS o_custkey, o_totalprice,
          CAST(year(o_orderdate) AS BIGINT) AS yr
        FROM orders WHERE o_orderkey % 4 = 0) AS s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""") }
      t("merge_set") { s.sql(s"""MERGE INTO $name AS t USING (
        SELECT o_orderkey, CAST(o_orderkey % 9 AS DOUBLE) AS bump
        FROM orders WHERE o_orderkey % 5 = 0) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND t.yr >= 1996 THEN UPDATE SET
          o_totalprice = t.o_totalprice + s.bump""") }
      t("merge_del") { s.sql(s"""MERGE INTO $name AS t USING (
        SELECT o_orderkey, o_orderkey % 7 = 0 AS kill
        FROM orders WHERE o_orderkey % 2 = 0) AS s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.kill AND t.o_custkey % 2 = 0 THEN DELETE""") }
      t("history") {
        graft.sources.VersionedTable.history(s, loc).collect(): Unit
      }
      t("final_agg") {
        s.sql(s"""SELECT g.yr, g.n_orders, g.cents, v.seed_rows FROM (
            SELECT yr, CAST(count(*) AS BIGINT) AS n_orders,
              CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(25,6)) * 100
                AS BIGINT)) AS BIGINT) AS cents
            FROM $name GROUP BY yr) g
          CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS seed_rows
                      FROM $name VERSION AS OF 2) v
          ORDER BY g.yr""")
          .write.format("noop").mode("overwrite").save()
      }
      t("drop") { graft.sources.GraftCatalog.drop(s, name) }
    }
    spark.stop()
  }
}
