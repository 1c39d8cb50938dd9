package graft

/** Child-JVM mains for the cross-process catalog/commit tests
  * (CatalogSpec spawns these with ProcessBuilder on the test classpath).
  * They are separate PROCESSES, not threads: the commit protocol's
  * put-if-absent (hard links on local FS) and the Hive metastore binding
  * both claim cross-JVM semantics that an in-process test cannot touch.
  */
object ChildCatalogWriter {
  def main(args: Array[String]): Unit = {
    val Array(warehouse, name) = args
    val spark = graft.sources.Catalog.hiveSession(warehouse)
    try {
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(5).selectExpr("id AS k", "id * 10 AS v")
        .createOrReplaceTempView("seed")
      graft.sources.GraftSql.sql(spark,
        s"CREATE VERSIONED TABLE $name AS SELECT k, v FROM seed")
      graft.sources.GraftSql.sql(spark,
        s"INSERT INTO $name VALUES (100, 1000)")
      // stdout contract the parent parses
      println("CHILD_LOCATION=" +
        graft.sources.GraftCatalog.resolve(spark, name).get)
    } finally spark.stop()
    // JVM exit releases the embedded-Derby lock for the next process
    sys.exit(0)
  }
}

/** Appends `count` one-row batches to a versioned table BY PATH from its
  * own JVM — no Hive, no Derby, so it runs CONCURRENTLY with the parent's
  * session. No retry wrapper: the blind-append rebase must absorb every
  * cross-process slot collision internally.
  */
object ChildAppender {
  def main(args: Array[String]): Unit = {
    val Array(table, writerId, countStr) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-child-appender-$writerId")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      (0 until countStr.toInt).foreach { i =>
        graft.sources.VersionedTable.append(spark, table,
          Seq((writerId.toLong, i.toLong)).toDF("k", "v"))
      }
      println("CHILD_APPENDS_OK")
    } finally spark.stop()
    sys.exit(0)
  }
}
