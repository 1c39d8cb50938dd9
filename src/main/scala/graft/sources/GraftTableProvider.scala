package graft.sources

import java.util

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession,
  SQLContext}
import org.apache.spark.sql.connector.catalog.{Identifier, Table,
  TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.sources.{BaseRelation,
  CreatableRelationProvider, DataSourceRegister, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `graft` data source short name — two public surfaces:
  *
  *  - `spark.read.format("graft").load("<manifest root>")`: a
  *    PATH-ADDRESSED read of the table's latest committed snapshot with
  *    no GraftSql pre-pass (and, with `GraftExtensions` installed, the
  *    same columnar plan splice as catalog reads);
  *    `df.write.format("graft").mode("append"/"overwrite").save(root)`
  *    lands through the same commit protocol as the Scala API.
  *  - `CREATE TABLE db.t (...) USING graft [LOCATION ...]` (and CTAS):
  *    the session-catalog extension recognizes the provider and routes
  *    creation to [[GraftSparkSessionCatalog.createTable]] — Spark only
  *    routes a `USING <name>` statement to the V2 catalog when the name
  *    resolves to a [[TableProvider]], which is this class's other job
  *    (the Delta pattern: `DeltaDataSource` + `DeltaCatalog`).
  *
  * Registered via META-INF/services so `format("graft")`/`USING graft`
  * resolve by name.
  */
class GraftTableProvider extends TableProvider with DataSourceRegister
  with CreatableRelationProvider {

  override def shortName(): String = "graft"

  /** `df.write.format("graft").mode(m).save(<root>)` — the V1 writer
    * seam `DataFrameWriter.save` routes path writes through. All four
    * modes honor versioned-table semantics: Append → one O(new-data)
    * append version (creates the table when the root is empty),
    * Overwrite → one atomic full-replace version (or the creating
    * commit), ErrorIfExists/Ignore gate on existence. Every write goes
    * through the same commit protocol as the API.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val loc = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "format(\"graft\") needs the manifest root: .save(<root>) or " +
          ".option(\"path\", <root>)"))
    val spark = sqlContext.sparkSession
    val exists = VersionedTable.latestVersion(spark, loc).nonEmpty
    mode match {
      case SaveMode.Append =>
        if (exists) VersionedTable.append(spark, loc, data)
        else VersionedTable.commit(spark, data, loc)
      case SaveMode.Overwrite =>
        if (exists) VersionedTable.overwriteWhere(spark, loc, lit(true), data)
        else VersionedTable.commit(spark, data, loc)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalArgumentException(
          s"versioned table already exists at '$loc' (mode ErrorIfExists)")
        VersionedTable.commit(spark, data, loc)
      case SaveMode.Ignore =>
        if (!exists) VersionedTable.commit(spark, data, loc)
    }
    // the relation hands back the table's LATEST snapshot — same rows a
    // follow-up read would see (only materialized if the caller reads it)
    val ctx = sqlContext
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override val schema: StructType =
        VersionedTable.readLatest(spark, loc).schema
      override def buildScan(): RDD[Row] =
        VersionedTable.readLatest(spark, loc).rdd
    }
  }

  /** The engine owns the schema (it IS the committed snapshot's) —
    * user-supplied schemas cannot override it.
    */
  override def supportsExternalMetadata(): Boolean = false

  private def location(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    if (p == null || p.isEmpty)
      throw new IllegalArgumentException(
        "format(\"graft\") needs the manifest root: .load(<root>) or " +
          ".option(\"path\", <root>)")
    p
  }

  /** EMPTY schema when the root holds no versioned table yet — the
    * Delta precedent: a WRITE to a fresh location must reach the V1
    * creation seam ([[createRelation]]) instead of dying here; a READ
    * of a missing table still fails typed, at scan time
    * ("has no committed versions").
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val loc = location(options)
    val spark = SparkSession.active
    if (VersionedTable.latestVersion(spark, loc).isEmpty) new StructType()
    else VersionedTable.readLatest(spark, loc).schema
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val loc = properties.get("path")
    new GraftVersionedSparkTable(
      Identifier.of(Array("graft"), loc), loc)
  }
}
