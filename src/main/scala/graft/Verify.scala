package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args beyond (sfDir, outDir) narrow the dump to named queries while
    // iterating; the driver always passes exactly two
    val Array(sfDir, outDir, rest @ _*) = args: @unchecked
    val only: Option[Set[String]] = if (rest.isEmpty) None else Some(rest.toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // DSv2 session catalog: vanilla spark.sql reads AND writes named
      // versioned tables (q232's INSERT leg); transparent to every
      // non-versioned table (DelegatingCatalogExtension passthrough)
      .config("spark.sql.catalog.spark_catalog",
        "graft.sources.GraftSparkSessionCatalog")
      // production session shape (r17): columnar catalog reads via the
      // ColumnarCatalogRead plan splice, same as Bench — correctness is
      // verified on the configuration that gets measured and deployed
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // coalesce(1), NOT repartition(1): repartition inserts a round-robin
      // shuffle AFTER the query's declared ORDER BY, so the dumped file
      // would lose the ordering the oracle contract requires (and lets the
      // optimizer elide the sort). coalesce keeps the ordered plan intact;
      // the single-task cost is fine at verification scale (sf0.01).
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
