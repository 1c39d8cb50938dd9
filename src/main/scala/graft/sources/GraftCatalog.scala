package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import scala.util.control.NonFatal

/** Name→path binding for [[VersionedTable]]s in the session's metastore —
  * the piece that turns `MERGE INTO '/data/tables/events_gold'` into
  * `MERGE INTO db.events_gold` (BASELINE's "Spark SQL + Hive metastore"
  * north star; reference analogue: hive-task's containers are NAMED
  * registries looked up by identity — the uuid→channel/port maps of
  * src/scheduler.lisp:31–34 — and the engine's tables get the same
  * by-name indirection here).
  *
  * The binding is an EXTERNAL catalog table entry whose table properties
  * carry the manifest root (`graft.location`) and a format marker
  * (`graft.versioned` = true). It works identically against the
  * in-memory session catalog (single session) and a Hive metastore
  * (`enableHiveSupport` — shared, persistent, multi-session: the
  * [[Catalog.registerHiveTables]] external-table precedent), because
  * both speak the same `CREATE TABLE ... TBLPROPERTIES` /
  * `SHOW TBLPROPERTIES` SQL.
  *
  * The entry's LOCATION deliberately points at an empty `_catalog_stub/`
  * dir under the manifest root, with the creation-time schema declared
  * explicitly: a DIRECT `spark.table("db.t")` read (which cannot route
  * through the versioned reader) returns an EMPTY frame of the right
  * shape instead of scanning manifest internals or stale data dirs —
  * fail-safe, never wrong-answer. All real reads and every mutation verb
  * go through [[GraftSql]], which resolves the name to the manifest root
  * and hands it to the path verbs; the name is the ONLY thing a user
  * types after CREATE.
  *
  * Why a properties-carrying entry instead of a live view: a view would
  * go stale on every commit (its text pins one version) and could not
  * carry the mutation-verb indirection; the property read is one
  * metadata call. Relocating a table = DROP (keep data) + re-CREATE
  * with the new LOCATION — the indirection makes paths swappable
  * without touching a single statement.
  */
object GraftCatalog {

  private val NamePat = "[A-Za-z_][A-Za-z0-9_]*\\.[A-Za-z_][A-Za-z0-9_]*"

  /** True iff `name` has the `db.table` shape this catalog binds. */
  def isQualified(name: String): Boolean = name.matches(NamePat)

  /** Register `db.table` → `location` (a [[VersionedTable]] manifest
    * root that must already have at least one committed version — CREATE
    * commits v1 first, adoption validates). Creates the database if
    * absent. Fails if any object already holds the name: silently
    * rebinding a name a user's queries rely on is the lost-update of
    * catalogs.
    */
  def create(spark: SparkSession, name: String, location: String): Unit = {
    require(isQualified(name),
      s"versioned table names are db.table identifiers: $name")
    require(!location.contains("'"),
      s"location must not contain quotes: $location")
    val Array(db, _) = name.split("\\.")
    VersionedTable.latestVersion(spark, location).getOrElse(
      throw new IllegalArgumentException(
        s"no versioned table at '$location' — nothing to bind $name to"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    require(!spark.catalog.tableExists(name),
      s"$name already exists in the catalog — DROP VERSIONED TABLE it " +
        "first (names never silently rebind)")
    val stub = new Path(location, "_catalog_stub")
    val hfs = stub.getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.mkdirs(stub) // empty: direct catalog reads see zero rows, never
    // stale data — the versioned reader is the only real read path
    val ddl = VersionedTable.readLatest(spark, location).schema.toDDL
    spark.sql(
      s"""CREATE TABLE $name ($ddl)
         |USING parquet
         |LOCATION '${stub.toString}'
         |TBLPROPERTIES (
         |  'graft.versioned' = 'true',
         |  'graft.location' = '$location',
         |  'comment' = 'graft versioned table — read/mutate via GraftSql; direct reads see an empty stub')""".stripMargin)
  }

  /** The manifest root `name` is bound to — None when the name is not a
    * registered versioned table (absent, or a foreign table/view without
    * the `graft.versioned` marker). Never throws: resolution runs
    * speculatively over every qualified token of a statement.
    */
  def resolve(spark: SparkSession, name: String): Option[String] =
    if (!isQualified(name)) None
    else try {
      if (!spark.catalog.tableExists(name)) None
      else {
        val props = spark.sql(s"SHOW TBLPROPERTIES $name").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
        if (props.get("graft.versioned").contains("true"))
          props.get("graft.location")
        else None
      }
    } catch { case NonFatal(_) => None }

  /** Unbind `name`. Metadata-only by default (the manifest root and
    * every version survive — re-CREATE with the same LOCATION re-binds);
    * `purge = true` additionally deletes the manifest root recursively
    * (data, manifests, sidecars, change feed — the irreversible
    * spelling). Returns the location that was bound.
    */
  def drop(spark: SparkSession, name: String, purge: Boolean = false): String = {
    val loc = resolve(spark, name).getOrElse(
      throw new IllegalArgumentException(
        s"$name is not a registered versioned table"))
    spark.sql(s"DROP TABLE $name")
    if (purge) {
      val root = new Path(loc)
      val hfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      hfs.delete(root, /* recursive = */ true)
    }
    loc
  }

  /** Every registered versioned table (name, location) — in `database`
    * when given, across all databases otherwise.
    */
  def list(spark: SparkSession,
      database: Option[String] = None): Seq[(String, String)] = {
    val dbs = database.map(Seq(_)).getOrElse(
      spark.catalog.listDatabases().collect().map(_.name).toSeq)
    dbs.flatMap { db =>
      if (!spark.catalog.databaseExists(db)) Nil
      else spark.catalog.listTables(db).collect().toSeq.flatMap { t =>
        val qualified = s"$db.${t.name}"
        resolve(spark, qualified).map(qualified -> _)
      }
    }
  }
}
