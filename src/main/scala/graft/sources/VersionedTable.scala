package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Transactional versioned parquet snapshots with an atomic manifest
  * commit — the minimal lakehouse transaction layer (the shape of a Delta
  * log) over plain parquet directories. (Analogue of the reference's one
  * deep idea — STM atomicity over shared containers,
  * hive-task src/primitives.lisp:144–322: every multi-step container
  * mutation is observed fully or not at all — re-expressed for a
  * distributed file layout.)
  *
  * Layout under `table/`:
  * {{{
  *   data/v=<n>/  (parquet)      immutable snapshot bodies, one dir per version
  *   _manifests/v<%08d n>.json   the COMMIT RECORD — a version exists iff
  *                               its manifest file exists
  *   _tmp/                       writer scratch, never read
  * }}}
  *
  * Commit protocol (optimistic, lock-free):
  *  1. next = latest committed version + 1;
  *  2. write the snapshot to `data/v=next/` — crash here leaves orphan
  *     data files that NO reader will ever see (no manifest);
  *  3. publish by creating `_manifests/v<next>.json` with
  *     create(overwrite = false) — HDFS's atomic put-if-absent. Two racing
  *     writers picked the same `next`; exactly one create succeeds, the
  *     loser gets a conflict exception and retries from step 1. Version
  *     DISCOVERY needs only the manifest file's NAME, so a reader racing
  *     the content write is harmless.
  *
  * Readers resolve versions from the manifest listing alone — a
  * kilobyte-scale metadata op no matter how many terabytes the snapshots
  * hold. Snapshot bodies are immutable once committed, so `readVersion`
  * is reproducible forever (time travel) and concurrent readers never see
  * a partial overwrite — the isolation property Overwrite-in-place lacks.
  *
  * Object-store caveat: the protocol's atomicity is HDFS
  * create-no-overwrite. S3 needs a DynamoDB-style put-if-absent shim
  * (exactly Delta's S3 LogStore); out of scope in a zero-egress build.
  */
object VersionedTable {

  /** Thrown when a racing writer committed `version` first — retry the
    * whole commit (re-read latest, recompute, re-publish).
    */
  final class CommitConflictException(val version: Long, cause: Throwable)
    extends RuntimeException(
      s"version $version was committed concurrently — retry", cause)

  private def fs(spark: SparkSession, table: String): (FileSystem, Path) = {
    val p = new Path(table)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long) = f"v$v%08d.json"

  private def dataDir(table: Path, v: Long) = new Path(table, s"data/v=$v")

  /** Committed versions, ascending — from the manifest listing only. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val (hfs, root) = fs(spark, table)
    val mDir = new Path(root, "_manifests")
    if (!hfs.exists(mDir)) Seq.empty
    else hfs.listStatus(mDir).iterator
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }.toSeq.sorted
  }

  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption

  /** Commit `df` as the table's next full snapshot; returns the new
    * version. Atomic: the snapshot is invisible until the manifest
    * create succeeds; a concurrent commit of the same version throws
    * [[CommitConflictException]] and changes nothing visible.
    */
  def commit(spark: SparkSession, df: DataFrame, table: String,
      maxRecordsPerFile: Long = 5000000L): Long = {
    val (hfs, root) = fs(spark, table)
    val next = latestVersion(spark, table).getOrElse(0L) + 1L
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "zstd")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(dataDir(root, next).toString)
    publish(spark, table, next)
    next
  }

  /** The put-if-absent publish step of [[commit]]: create the version's
    * manifest with overwrite = false — atomic on HDFS. Throws
    * [[CommitConflictException]] when a racing writer's manifest for the
    * SAME version already landed (the window between version selection
    * and publish). Package-visible so the conflict path is testable
    * without a real race.
    */
  private[graft] def publish(spark: SparkSession, table: String,
      version: Long): Unit = {
    val (hfs, root) = fs(spark, table)
    val manifest = new Path(root, s"_manifests/${manifestName(version)}")
    hfs.mkdirs(manifest.getParent)
    // manifest body is informational only (version discovery needs just
    // the file NAME) — deliberately no row count: that would re-scan the
    // snapshot just written
    val body = s"""{"version":$version,"writer":"${UUID.randomUUID}"}"""
    val out =
      try hfs.create(manifest, /* overwrite = */ false)
      catch { case e: java.io.IOException =>
        throw new CommitConflictException(version, e)
      }
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Time-travel read: snapshot `version` exactly as committed. Throws if
    * the version was never COMMITTED — data files without a manifest (a
    * crashed writer) do not exist as far as readers are concerned.
    */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val (hfs, root) = fs(spark, table)
    val manifest = new Path(root, s"_manifests/${manifestName(version)}")
    require(hfs.exists(manifest),
      s"version $version of $table was never committed")
    spark.read.parquet(dataDir(root, version).toString)
  }

  def readLatest(spark: SparkSession, table: String): DataFrame = {
    val v = latestVersion(spark, table).getOrElse(
      throw new IllegalArgumentException(s"$table has no committed versions"))
    readVersion(spark, table, v)
  }

  /** What changed between two committed snapshots: (key, change ∈
    * added|removed|changed) via [[graft.api.Graft.snapshotDiff]] — the
    * full-outer join runs on (key, 16-byte md5) projections, so snapshot
    * bodies never shuffle.
    */
  def diffVersions(spark: SparkSession, table: String, from: Long, to: Long,
      key: String, hashCols: Seq[String]): DataFrame =
    graft.api.Graft.snapshotDiff(
      readVersion(spark, table, from), readVersion(spark, table, to),
      key, hashCols)

  /** MERGE a CDC change batch into the latest snapshot and commit the
    * result as a new version ([[graft.api.Graft.applyChanges]] semantics:
    * per key the highest-`version` change wins, winning deletes drop the
    * key). The atomic-commit protocol makes the merge transactional: a
    * reader sees the pre-merge or post-merge snapshot, never a partial
    * merge — the STM property, at file granularity.
    */
  def commitMerge(spark: SparkSession, table: String, changes: DataFrame,
      key: String, version: String, op: String): Long = {
    val merged = graft.api.Graft.applyChanges(
      readLatest(spark, table), changes, key, version, op)
    commit(spark, merged, table)
  }
}
