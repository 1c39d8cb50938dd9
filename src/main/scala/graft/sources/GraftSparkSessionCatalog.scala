package graft.sources

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.connector.catalog.{DelegatingCatalogExtension,
  Identifier, SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder,
  SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo,
  SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter,
  GreaterThan, GreaterThanOrEqual, In, InsertableRelation, LessThan,
  LessThanOrEqual, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Session-catalog extension that makes NAME-ADDRESSED versioned tables
  * readable by VANILLA Spark SQL — `spark.sql("SELECT ... FROM db.t")`
  * and `spark.table("db.t")` resolve to the table's LATEST committed
  * snapshot with zone-map/Bloom file pruning, no [[GraftSql]] pre-pass
  * required (the Delta `DeltaCatalog` move: wrap the built-in session
  * catalog, intercept only tables carrying this engine's marker).
  *
  * Install at session build time:
  * {{{
  *   .config("spark.sql.catalog.spark_catalog",
  *           "graft.sources.GraftSparkSessionCatalog")
  * }}}
  *
  * Resolution: [[GraftCatalog.create]] registers `db.t` as an external
  * parquet entry whose TBLPROPERTIES carry `graft.versioned` +
  * `graft.location`; `loadTable` inspects the delegate's answer and, on
  * the marker, substitutes a [[GraftVersionedSparkTable]] over the
  * manifest root. Foreign tables and views pass through untouched, so
  * the extension is transparent to everything that is not a versioned
  * table. WITHOUT the extension installed, a direct read still hits the
  * registration's empty `_catalog_stub` LOCATION — the fail-safe stays
  * fail-safe; with it, the read is first-class.
  *
  * Read path, two tiers (r17):
  *  - WITH [[graft.functions.GraftExtensions]] installed (the
  *    production session shape), the
  *    [[graft.plans.ColumnarCatalogRead]] optimizer rule replaces the
  *    DSv2 relation with the engine's pruned-read LOGICAL PLAN before
  *    physical planning — the vanilla read is a vectorized parquet
  *    `FileScan` inside whole-stage codegen, with manifest-level
  *    zone-map/Bloom file pruning AND the keep-filter/schema-chain
  *    residuals riding along as ordinary plan nodes (the residuals are
  *    exactly why a `ParquetScan` delegation could not work: they are
  *    not source-Filter expressible — a plan splice carries them for
  *    free).
  *  - WITHOUT the extensions (bare catalog conf), the scan falls back
  *    to the [[V1Scan]] bridge below: pushed filters translate to
  *    [[VersionedTable.ColumnBounds]]/[[VersionedTable.ColumnEquals]]/
  *    [[VersionedTable.ColumnIn]] and drive the SAME manifest-level
  *    file pruning `readLatestPruned` uses; the inner plan still runs
  *    vectorized parquet decode, only the final RDD[Row] conversion at
  *    the seam is extra (the DeltaTableV2 V1-fallback cost class).
  * In both tiers every filter is ALSO reported residual, so Spark
  * re-applies them row-level — pruning here is strictly a superset
  * selection and can never change results.
  *
  * Write path (r17): the table is READ-WRITE — vanilla `INSERT INTO` /
  * `INSERT OVERWRITE` land through a V1 write bridge onto the SAME
  * commit protocol as the Scala API ([[GraftWriteBuilder]]); the richer
  * mutations (MERGE/UPDATE/DELETE/maintenance verbs) stay on the
  * [[GraftSql]] spellings.
  */
class GraftSparkSessionCatalog extends DelegatingCatalogExtension {

  override def loadTable(ident: Identifier): Table = {
    val resolved = super.loadTable(ident)
    val props = resolved.properties()
    if (props != null && "true" == props.get("graft.versioned") &&
        props.get("graft.location") != null)
      new GraftVersionedSparkTable(ident, props.get("graft.location"))
    else resolved
  }

  /** Vanilla TIME TRAVEL: `SELECT ... FROM db.t VERSION AS OF n` —
    * Spark routes the version literal here; the returned table is
    * pinned to that committed snapshot (scan AND schema — an evolved
    * table time-travels its schema too). Foreign tables delegate.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val resolved = super.loadTable(ident)
    val props = resolved.properties()
    if (props != null && "true" == props.get("graft.versioned") &&
        props.get("graft.location") != null) {
      val v = try version.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"VERSION AS OF on a versioned table takes the numeric commit " +
            s"version (history() lists them), got '$version'")
      }
      new GraftVersionedSparkTable(ident, props.get("graft.location"),
        explicitVersion = Some(v))
    } else super.loadTable(ident, version)
  }

  /** Vanilla `... TIMESTAMP AS OF ts` — Spark hands MICROseconds; the
    * engine's as-of resolution (monotonicized commit stamps, Delta
    * convention) picks the newest version at or before it.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val resolved = super.loadTable(ident)
    val props = resolved.properties()
    if (props != null && "true" == props.get("graft.versioned") &&
        props.get("graft.location") != null) {
      val loc = props.get("graft.location")
      val v = VersionedTable.versionAsOf(SparkSession.active, loc,
        timestamp / 1000L)
      new GraftVersionedSparkTable(ident, loc, explicitVersion = Some(v))
    } else super.loadTable(ident, timestamp)
  }

  /** Vanilla `CREATE TABLE db.t (...) USING graft [LOCATION ...]` (and
    * CTAS — Spark creates the table, then writes through the returned
    * table's [[SupportsWrite]], so the SELECT lands as an append
    * version on the empty v1): commits an empty v1 snapshot with the
    * declared schema at the location (user-supplied, or the session
    * catalog's default path) and registers the marker entry — the same
    * [[GraftCatalog.create]] binding the GraftSql spelling makes, so
    * every later statement resolves identically. Vanilla
    * `DROP TABLE db.t` already unbinds through the delegate
    * (metadata-only — versions survive, re-CREATE over the same
    * LOCATION fails on the non-empty root rather than silently
    * rebinding; `DROP VERSIONED TABLE ... PURGE` is the destructive
    * spelling). Non-graft providers pass through untouched.
    */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    if (isGraftProvider(properties))
      createVersioned(ident, schema, partitions, properties)
    else super.createTable(ident, schema, partitions, properties)

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    if (isGraftProvider(properties)) {
      // DEFAULT would silently never exist (the versioned format has no
      // schema-level default store outside the ADD COLUMN chain op) —
      // fail typed rather than let a later INSERT write NULL where the
      // user declared 5. Column COMMENTs are accepted-and-not-recorded
      // (display metadata, never replayed semantics); declared
      // nullability is kept in the creating schema and relaxes on read
      // like every Spark-parquet round trip.
      columns.find(_.defaultValue() != null).foreach(c =>
        throw new IllegalArgumentException(
          s"[graft] column ${c.name()} declares a DEFAULT — the " +
            "versioned format does not record creation-time defaults; " +
            "add the column with ALTER TABLE ... ADD COLUMN ... " +
            "DEFAULT after creation (a chain op), or bake the value " +
            "into the INSERTs"))
      createVersioned(ident, StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name(), c.dataType(),
          c.nullable()))), partitions, properties)
    } else super.createTable(ident, columns, partitions, properties)

  /** Vanilla `ALTER TABLE db.t ADD COLUMN(S) / RENAME COLUMN / DROP
    * COLUMN(S) / ALTER COLUMN ... TYPE` → the engine's O(metadata)
    * schema-evolution chain ops, one atomic version per change (nested
    * `a.b.c` paths included — the verbs take dotted paths natively).
    * Everything else a TableChange can express (comments, nullability,
    * properties) fails typed: the chain records reader semantics, and a
    * silent no-op would misreport what the table replays. The
    * delegate's stub entry is deliberately NOT altered — the live
    * schema comes from `loadTable` (this extension), and the stub is
    * only the no-extension fail-safe.
    */
  override def alterTable(ident: Identifier,
      changes: org.apache.spark.sql.connector.catalog.TableChange*): Table = {
    val resolved = super.loadTable(ident)
    val props = resolved.properties()
    if (props == null || "true" != props.get("graft.versioned") ||
        props.get("graft.location") == null)
      return super.alterTable(ident, changes: _*)
    import org.apache.spark.sql.connector.catalog.TableChange._
    val spark = SparkSession.active
    val loc = props.get("graft.location")
    // VALIDATE every change before applying ANY: each chain op is its
    // own committed version, so a statement that would fail on change
    // k must fail before change 1 publishes — otherwise ALTER becomes
    // silently half-applied. (Per-op verb validation still runs; this
    // pass catches the statement-shape errors: unsupported change
    // kinds, metadata the chain cannot record, duplicate targets.)
    val actions: Seq[() => Unit] = changes.map {
      case c: AddColumn =>
        if (!c.isNullable || c.comment() != null || c.position() != null)
          throw new IllegalArgumentException(
            s"[graft] ADD COLUMN ${c.fieldNames().mkString(".")} " +
              "carries metadata the evolution chain does not record " +
              "(NOT NULL / COMMENT / column position) — a silently " +
              "dropped constraint would misreport what readers replay; " +
              "add the plain nullable column")
        val default = Option(c.defaultValue()).map(_.getSql)
        () => { VersionedTable.addColumn(spark, loc,
          c.fieldNames().mkString("."), c.dataType().sql, default); () }
      case c: RenameColumn =>
        () => { VersionedTable.renameColumn(spark, loc,
          c.fieldNames().mkString("."), c.newName()); () }
      case c: DeleteColumn =>
        () => { VersionedTable.dropColumn(spark, loc,
          c.fieldNames().mkString(".")); () }
      case c: UpdateColumnType =>
        () => { VersionedTable.widenColumn(spark, loc,
          c.fieldNames().mkString("."), c.newDataType().sql); () }
      case other => throw new IllegalArgumentException(
        s"[graft] unsupported ALTER on a versioned table: $other — " +
          "the evolution chain records ADD/RENAME/DROP COLUMN and " +
          "ALTER COLUMN ... TYPE (widen); comments/nullability/" +
          "properties are not chain ops")
    }
    val targets = changes.collect {
      case c: AddColumn => c.fieldNames().mkString(".")
      case c: RenameColumn => c.fieldNames().mkString(".")
      case c: DeleteColumn => c.fieldNames().mkString(".")
      case c: UpdateColumnType => c.fieldNames().mkString(".")
    }
    if (targets.distinct.size != targets.size)
      throw new IllegalArgumentException(
        s"[graft] one ALTER statement names a column twice " +
          s"(${targets.diff(targets.distinct).distinct.mkString(", ")}) " +
          "— each change is its own committed version and a duplicate " +
          "would half-apply; split the statement")
    actions.foreach(_.apply())
    loadTable(ident)
  }

  private def isGraftProvider(props: util.Map[String, String]): Boolean =
    props != null && "graft".equalsIgnoreCase(props.get("provider"))

  private def createVersioned(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (partitions.nonEmpty)
      throw new IllegalArgumentException(
        "USING graft tables do not take PARTITIONED BY — layout is a " +
          "maintenance concern (OPTIMIZE ... CLUSTER BY / ZORDER BY), " +
          "not a creation-time contract")
    if (ident.namespace().length != 1)
      throw new IllegalArgumentException(
        s"versioned table names are db.table identifiers: $ident")
    val spark = SparkSession.active
    val db = ident.namespace()(0)
    val name = s"$db.${ident.name()}"
    val location = Option(properties.get("location")).filter(_.nonEmpty)
      .getOrElse(org.apache.spark.sql.graftshims.SparkInternals
        .defaultTablePath(spark, db, ident.name()))
    if (VersionedTable.latestVersion(spark, location).nonEmpty)
      throw new IllegalArgumentException(
        s"'$location' already holds a versioned table — bind it with " +
          "CREATE VERSIONED TABLE ... LOCATION (adoption), never an " +
          "implicit rebind through CREATE TABLE")
    VersionedTable.commit(spark,
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
      location)
    GraftCatalog.create(spark, name, location)
    loadTable(ident)
  }
}

/** A DSv2 [[Table]] over a [[VersionedTable]] manifest root — readable
  * and INSERT-writable by vanilla Spark SQL.
  * The version is resolved ONCE per Table instance (one `loadTable` =
  * one statement's analysis) and every scan built from it is PINNED to
  * that version: schema and rows always come from the same committed
  * snapshot, even when a schema-changing commit (ALTER / CoW
  * materialization) lands between analysis and execution — re-resolving
  * at execution time made the projection bind against a different shape
  * and fail or mis-read. Two separate statements still observe two
  * versions, exactly like two [[VersionedTable.readLatest]] calls.
  */
private[graft] class GraftVersionedSparkTable(ident: Identifier,
    location: String, explicitVersion: Option[Long] = None)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.TruncatableTable {

  /** The snapshot this Table instance exposes — the caller's time-travel
    * version when given (VERSION/TIMESTAMP AS OF), else the latest,
    * resolved lazily on the first schema()/scan request and then fixed
    * for the instance's life.
    */
  private lazy val pinnedVersion: Long = explicitVersion.getOrElse(
    VersionedTable.latestVersion(SparkSession.active, location).getOrElse(
      throw new IllegalArgumentException(
        s"$location has no committed versions")))

  // resolved ONCE with the version: Spark calls schema() several times
  // per statement during analysis, and each readVersion pays manifest +
  // footer I/O for an answer that cannot change while pinned
  private lazy val pinnedSchema: StructType =
    VersionedTable.readVersion(SparkSession.active, location,
      pinnedVersion).schema

  override def name(): String = ident.toString

  override def schema(): StructType = pinnedSchema

  /** The manifest root / pinned snapshot, for the columnar plan splice
    * ([[graft.plans.ColumnarCatalogRead]]) — same version every scan
    * built from this instance is pinned to.
    */
  private[graft] def graftLocation: String = location
  private[graft] def graftVersion: Long = pinnedVersion

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  /** Vanilla `INSERT INTO db.t` / `INSERT OVERWRITE db.t` land through
    * the SAME commit protocol as the Scala API — a V1Write bridging to
    * [[VersionedTable.append]] (O(new-data): one fresh dir + one
    * manifest, internal rebase against racing commits) and
    * [[VersionedTable.overwriteWhere]] with a TRUE predicate (full
    * replace as one atomic version). CHECK constraints gate both (every
    * commit path validates pre-publish); writes are never pinned to the
    * read snapshot — they rebase on the latest version like any API
    * append, so an INSERT racing a path-API commit resolves internally
    * instead of losing either.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(location)

  /** Vanilla `TRUNCATE TABLE db.t` — one atomic full-replace version
    * with zero rows (schema survives; time travel into the pre-truncate
    * state still works, expiry + vacuum reclaim the bytes later).
    */
  override def truncateTable(): Boolean = {
    import org.apache.spark.sql.functions.lit
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      VersionedTable.readLatest(spark, location).schema)
    VersionedTable.overwriteWhere(spark, location, lit(true), empty)
    true
  }

  override def partitioning(): Array[Transform] = Array.empty

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    m.put("graft.versioned", "true")
    m.put("graft.location", location)
    m
  }

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(location, pinnedVersion, schema())
}

/** V1 write bridge: `truncate()` flags INSERT OVERWRITE (DSv2 models
  * static full overwrite as truncate-then-append); `build()` hands back
  * an [[InsertableRelation]] whose insert routes to the versioned-table
  * verbs. The DataFrame Spark passes is already schema-resolved against
  * the table (append still realigns by name and casts defensively).
  */
private class GraftWriteBuilder(location: String) extends WriteBuilder
  with SupportsTruncate {

  private var replaceAll = false

  override def truncate(): WriteBuilder = { replaceAll = true; this }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          import org.apache.spark.sql.functions.lit
          val spark = data.sparkSession
          if (replaceAll || overwrite)
            VersionedTable.overwriteWhere(spark, location, lit(true), data)
          else VersionedTable.append(spark, location, data)
          ()
        }
      }
  }
}

private class GraftScanBuilder(location: String, version: Long,
    fullSchema: StructType)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = fullSchema
  private var filters: Array[Filter] = Array.empty

  /** Every filter is accepted for FILE pruning and returned as residual:
    * Spark keeps its row-level Filter node, so the scan only ever has to
    * be a conservative superset — the zone-map/Bloom contract.
    */
  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs
    fs
  }

  override def pushedFilters(): Array[Filter] =
    filters.filter(GraftScanBuilder.translatable(fullSchema, _))

  override def pruneColumns(requiredSchema: StructType): Unit =
    // intersect with the table schema defensively (metadata columns a
    // future Spark hands through must not reach the projection)
    required = StructType(requiredSchema.fields.filter(f =>
      fullSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new GraftV1Scan(location, version, fullSchema, required, filters)
}

private object GraftScanBuilder {
  /** Whether a source filter contributes to manifest-level pruning. */
  def translatable(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, v) => simple(schema, a) && v != null
    case In(a, vs) => simple(schema, a) && vs != null && vs.nonEmpty &&
      !vs.contains(null)
    case GreaterThan(a, v) => simple(schema, a) && v != null
    case GreaterThanOrEqual(a, v) => simple(schema, a) && v != null
    case LessThan(a, v) => simple(schema, a) && v != null
    case LessThanOrEqual(a, v) => simple(schema, a) && v != null
    case _ => false
  }
  /** Top-level column of the table (no nested paths, no metadata). */
  def simple(schema: StructType, attr: String): Boolean =
    schema.fieldNames.contains(attr)
}

/** V1Scan bridge: the scan's rows come from [[VersionedTable
  * .readLatestPruned]] — one code path for pruning semantics whether a
  * read arrives via the engine API, GraftSql, or vanilla Spark SQL.
  *
  * This bridge is the FALLBACK seam: sessions built with
  * `GraftExtensions` never execute it — the
  * [[graft.plans.ColumnarCatalogRead]] optimizer rule splices the same
  * pruned-read plan inline BEFORE physical planning, so the scan keeps
  * vectorized parquet decode and whole-stage codegen with no RDD[Row]
  * boundary. Without the extensions (bare catalog config), this V1 path
  * still answers every query correctly — just row-bridged at the seam.
  */
private[graft] class GraftV1Scan(
    private[graft] val location: String,
    private[graft] val version: Long,
    private[graft] val fullSchema: StructType,
    private[graft] val required: StructType,
    private[graft] val filters: Array[Filter]) extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def buildScan(): RDD[Row] = {
        import org.apache.spark.sql.functions.col
        val df = GraftScanBridge.prunedRead(context.sparkSession,
          location, version, fullSchema, filters)
        val projected =
          if (required.isEmpty) df.select()
          else df.select(required.fieldNames.map(col): _*)
        projected.rdd
      }
    }.asInstanceOf[T]
}

/** Shared filter→pruning translation for the catalog read paths (the
  * V1 bridge above and the columnar plan splice in
  * [[graft.plans.ColumnarCatalogRead]]) — ONE code path decides which
  * files a pushed predicate lets the manifest skip.
  */
private[graft] object GraftScanBridge {

  /** Translate the pushed filters into the engine's pruning predicates
    * and hand back the pruned snapshot read. Strict inequalities widen
    * to inclusive bounds — pruning needs a superset, and the residual
    * row filter restores exactness.
    */
  def prunedRead(spark: SparkSession, location: String, version: Long,
      fullSchema: StructType, filters: Array[Filter]): DataFrame = {
    import VersionedTable.{ColumnBounds, ColumnEquals, ColumnIn}
    val eqs = Seq.newBuilder[ColumnEquals]
    val ins = Seq.newBuilder[ColumnIn]
    var lowers = Map.empty[String, Any]
    var uppers = Map.empty[String, Any]
    filters.filter(GraftScanBuilder.translatable(fullSchema, _)).foreach {
      case EqualTo(a, v) => eqs += ColumnEquals(a, v)
      case In(a, vs) => ins += ColumnIn(a, vs.toSeq)
      case GreaterThan(a, v) => lowers += a -> v
      case GreaterThanOrEqual(a, v) => lowers += a -> v
      case LessThan(a, v) => uppers += a -> v
      case LessThanOrEqual(a, v) => uppers += a -> v
      case _ => ()
    }
    val bounds = (lowers.keySet ++ uppers.keySet).toSeq.sorted.map(c =>
      ColumnBounds(c, lowers.get(c), uppers.get(c)))
    VersionedTable.readVersionPruned(spark, location, version, bounds,
      eqs.result(), ins.result())
  }
}
