package graft.sources

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Table registration surface (BASELINE "Spark SQL + Hive metastore").
  *
  * Reference mapping: the reference's containers are its "tables" — the
  * transactional hash table (src/primitives.lisp:92–94,220–318) and sorted
  * map (src/primitives.lisp:96–101) with `get-value`/`set-value`
  * enumeration. Here a catalog of schema-on-read parquet tables plays that
  * role, with the metastore replacing in-process object identity.
  *
  * Two registration paths over the same parquet fixtures:
  *  - [[registerViews]] — session-local temp views (the default everywhere;
  *    zero metastore dependency, what Verify/Bench use).
  *  - [[registerHiveTables]] — external tables in a Hive metastore
  *    (`enableHiveSupport`), for a shared multi-session catalog. Tables are
  *    EXTERNAL (`path` option): dropping them never deletes fixture data.
  *
  * Both paths expose identical names to `spark.sql`; CatalogSpec proves
  * query parity between them. At scale the metastore additionally carries
  * partition metadata, enabling partition pruning on partitioned layouts —
  * temp views only get file-level pruning.
  */
object Catalog {

  def registerViews(spark: SparkSession, dir: String): Unit =
    Tables.views(spark, dir)

  /** Register every fixture table as an external Hive table in `database`.
    * Requires a session built with `enableHiveSupport()`; idempotent.
    */
  def registerHiveTables(spark: SparkSession, dir: String,
      database: String = "graft"): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    Tables.names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS $database.$n")
      // USING parquet + explicit path = external, schema from the footer
      spark.sql(
        s"""CREATE TABLE $database.$n
           |USING parquet
           |OPTIONS (path '$dir/$n.parquet')""".stripMargin)
    }
  }

  /** Build a Hive-enabled session (Derby metastore under `warehouseDir`) —
    * used by tests; production clusters point at a real metastore instead.
    */
  def hiveSession(warehouseDir: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-hive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$warehouseDir/warehouse")
      // events.parquet carries TIMESTAMP(NANOS); read as long (see Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$warehouseDir/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
}
