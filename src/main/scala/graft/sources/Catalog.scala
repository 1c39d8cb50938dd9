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
    // idempotent re-registration must handle either object kind under the
    // name (DROP TABLE on a view and vice versa are analysis errors)
    def dropAny(qualified: String): Unit =
      if (spark.catalog.tableExists(qualified)) {
        val kind = spark.catalog.getTable(qualified).tableType
        if (kind == "VIEW") spark.sql(s"DROP VIEW $qualified")
        else spark.sql(s"DROP TABLE $qualified")
      }
    // events has shipped as both parquet TIMESTAMP(MICROS) and
    // TIMESTAMP(NANOS) across fixture generations; branch on the footer
    // exactly like Tables.apply so both catalogs expose identical schema
    // AND values (CatalogSpec asserts parity).
    val eventsMicros = Tables.eventsTsIsNativeMicros(spark, dir)
    Tables.names.foreach { n =>
      val tbl = if (n == "events" && !eventsMicros) "events_raw" else n
      dropAny(s"$database.$n")
      if (n == "events") dropAny(s"$database.events_raw")
      // USING parquet + explicit path = external. events declares its
      // schema explicitly instead of inferring from the footer:
      //  - µs fixtures: ts TIMESTAMP (the footer's isAdjustedToUTC=false
      //    would otherwise infer TIMESTAMP_NTZ and diverge from the view
      //    path; session TZ is UTC, so the instant is identical);
      //  - ns fixtures: ts BIGINT raw nanos to events_raw (footer
      //    inference of TIMESTAMP(NANOS) fails on any session without the
      //    legacy nanosAsLong conf), with `events` a persistent VIEW
      //    applying the same ns→µs conversion as Tables.apply.
      val cols =
        if (n == "events" && eventsMicros)
          s" (${Tables.eventsMicrosSchema.toDDL})"
        else if (n == "events") s" (${Tables.eventsRawSchema.toDDL})"
        else ""
      spark.sql(
        s"""CREATE TABLE $database.$tbl$cols
           |USING parquet
           |OPTIONS (path '$dir/$n.parquet')""".stripMargin)
      if (tbl != n)
        spark.sql(
          s"""CREATE VIEW $database.events AS
             |SELECT event_id, timestamp_micros(ts DIV 1000) AS ts,
             |       user_id, event_type, value, props
             |FROM $database.events_raw""".stripMargin)
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
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$warehouseDir/metastore_db;create=true")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
}
