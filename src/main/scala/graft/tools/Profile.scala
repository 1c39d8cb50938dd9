package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query profiler: runs the named declared queries on a
  * scale-factor dir, printing per-query wall seconds and (optionally) the
  * formatted plan. Usage:
  *   runMain graft.tools.Profile <sfDir> <query...> [--explain]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.views(spark, sfDir)
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE $name rep$rep%d ${dt}%.2f s")
        if (explain && rep == 1) df.explain("formatted")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
