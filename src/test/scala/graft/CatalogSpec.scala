package graft

import graft.sources.Catalog
import org.scalatest.funsuite.AnyFunSuite

/** Hive-metastore-backed registration parity with the temp-view path
  * (VERDICT r1 item 10). Runs in its own forked JVM (see build.sbt
  * testGrouping): catalogImplementation is a static conf.
  */
class CatalogSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("hive catalog tables answer queries identically to temp views") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hive").toString
    val spark = Catalog.hiveSession(tmp)
    try {
      spark.sparkContext.setLogLevel("WARN")
      assert(spark.conf.get("spark.sql.catalogImplementation") == "hive")
      Catalog.registerHiveTables(spark, sfDir)
      Catalog.registerViews(spark, sfDir)
      val viaHive = spark.sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
          |FROM graft.lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin).collect()
      val viaView = spark.sql(
        """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS q
          |FROM lineitem GROUP BY l_returnflag
          |ORDER BY l_returnflag""".stripMargin).collect()
      assert(viaHive.toSeq == viaView.toSeq)
      assert(viaHive.nonEmpty)
      // events parity: the metastore path must expose the SAME ts type and
      // values as the view path (raw registration would leak BIGINT nanos)
      val evHive = spark.table("graft.events")
      val evView = spark.table("events")
      assert(evHive.schema == evView.schema,
        s"hive ${evHive.schema.treeString} vs view ${evView.schema.treeString}")
      val h = evHive.orderBy("event_id").collect()
      val v = evView.orderBy("event_id").collect()
      assert(h.nonEmpty && h.toSeq == v.toSeq)
      // metastore survives: table is listed in the catalog, and external —
      // dropping must not delete the fixture parquet
      assert(spark.catalog.tableExists("graft.lineitem"))
      // ANALYZE feeds CBO: row count + column NDV/min/max land in the
      // metastore, which is what join reordering and broadcast decisions
      // read at planning time on a real warehouse (temp views never carry
      // these). Run before the DROP below retires the table.
      spark.sql("ANALYZE TABLE graft.lineitem COMPUTE STATISTICS " +
        "FOR COLUMNS l_orderkey, l_quantity")
      val tblStats = spark.sql("DESCRIBE TABLE EXTENDED graft.lineitem")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val rowCount = Tables(spark, sfDir, "lineitem").count()
      assert(tblStats("Statistics").contains(s"$rowCount rows"),
        s"CBO table stats missing: ${tblStats.get("Statistics")}")
      val colStats = spark.sql(
        "DESCRIBE TABLE EXTENDED graft.lineitem l_orderkey")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(colStats.get("distinct_count").exists(_.toLong > 0),
        s"column NDV missing: $colStats")
      spark.sql("DROP TABLE graft.lineitem")
      assert(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    } finally spark.stop()
  }
}
