package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runs the named declared queries on a
  * scale-factor dir, printing per-query wall seconds and (optionally) the
  * formatted plan. Session shape matches Bench (catalog + extensions), so
  * the measured plan is the measured-and-deployed one. Usage:
  *   runMain graft.tools.Profile <sfDir> <query...> [--explain]
  *     [--plans <dir>] [--reps <n>]
  * --plans writes each query's explain("formatted") to <dir>/<name>.txt.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    def optArg(flag: String): Option[String] =
      args.indexOf(flag) match {
        case i if i >= 0 && i + 1 < args.length => Some(args(i + 1))
        case _ => None
      }
    val plansDir = optArg("--plans")
    val reps = optArg("--reps").map(_.toInt).getOrElse(3)
    val flagVals = Seq("--plans", "--reps").flatMap(f => optArg(f)).toSet
    val names = args.drop(1)
      .filterNot(_.startsWith("--")).filterNot(flagVals)
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $name rep$rep%d ${dt}%.2f s")
        if (explain && rep == 1) df.explain("formatted")
        if (rep == 1) plansDir.foreach { dir =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$name.txt"), plan)
        }
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
