package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Write-sink surface: Parquet / CSV / JSON (SURVEY.md §2B sources/sinks).
  *
  * Scale posture:
  *  - `partitionBy` columns become directory partitions — the reader gets
  *    partition pruning on them; choose low-cardinality keys (date, lang).
  *  - `maxRecordsPerFile` caps file size skew so one hot partition cannot
  *    produce a multi-GB file; no `coalesce(1)` anywhere (a single-task
  *    write serializes the whole job at scale).
  *  - CSV/JSON carry an explicit timestamp format so round-trips are
  *    deterministic and engine-portable.
  */
object Sinks {

  val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  /** zstd: the right default at storage scale — parquet-mr's zstd is both
    * smaller and faster to decode than the legacy snappy default.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L, compression: String = "zstd"): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  def csv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("timestampFormat", TsFmt)
      .csv(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("timestampFormat", TsFmt)
      .json(path)

  /** Z-ordered parquet layout: range-partition + sort by the Morton
    * interleave of two dimension columns (graft.api.Graft.zorderKey), so
    * row-group min/max stats prune range predicates on EITHER dimension.
    * The complement to directory partitioning (low-cardinality keys) and
    * bucketing (equi-join keys): use for the two high-cardinality columns
    * your scans range-filter most (e.g. user_id × time).
    */
  def zorderedParquet(df: DataFrame, path: String, dimA: String,
      dimB: String, nFiles: Int = 8, compression: String = "zstd"): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z",
        graft.api.Graft.zorderKey(col(dimA).cast("long"), col(dimB).cast("long")))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .parquet(path)
  }

  /** Incremental partition refresh: overwrite ONLY the directory
    * partitions present in `df`, leaving every other partition's files
    * untouched (`partitionOverwriteMode=dynamic`, set per-write — never a
    * session-conf mutation). THE backfill shape at 100 TB: recompute the
    * changed days/shards (found via `Graft.snapshotDiff` or upstream CDC)
    * and rewrite just those directories; a full-table overwrite of a
    * petabyte output to fix one day is the anti-pattern this replaces.
    * Combined with `partitionBy` pruning, readers see an atomic-per-
    * partition swap.
    */
  def refreshPartitions(df: DataFrame, path: String,
      partitionCols: Seq[String], compression: String = "zstd"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .option("compression", compression)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** ORC sink: the other columnar format Spark writes natively — kept at
    * parity with the parquet path (zstd, overwrite) for interop with
    * ORC-based warehouses. Round-trip equality is SinksSpec's.
    */
  def orc(df: DataFrame, path: String, compression: String = "zstd"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .orc(path)

  /** Small-file compaction: rewrite a parquet directory into
    * ceil(inputBytes / targetFileBytes) files. Small-file disease is the
    * steady-state failure mode of incremental ingest (every micro-batch
    * writes a file per partition; a year later the NameNode/listing and
    * task-scheduling overhead dominate scans). One round-robin shuffle
    * sized from the ACTUAL input bytes (driver-side metadata listing, no
    * data read) — paid once at maintenance time instead of on every
    * downstream scan. Compressed-size heuristic: output files land near
    * `targetFileBytes` because input and output share codec family.
    * Returns the file count written.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long = 512L << 20,
      compression: String = "zstd"): Int = {
    require(targetFileBytes > 0)
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // RECURSIVE listing: a hive-partitioned layout keeps its data files in
    // key=value subdirectories, so a flat listStatus would size it as 0
    // bytes and collapse any input — 100 TB included — into ONE output
    // file/task. listFiles(recursive = true) walks the tree; still a
    // driver-side metadata call, no data read.
    val it = fs.listFiles(hPath, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // NOTE: the rewrite produces a FLAT layout (partition columns survive
    // as data columns via discovery, the directory structure does not);
    // compact per-partition with refreshPartitions when the layout must
    // be preserved.
    spark.read.parquet(inPath).repartition(n)
      .write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .parquet(outPath)
    n
  }

  /** Bucketed catalog table: rows are hash-partitioned into `nBuckets`
    * files by `bucketCols` at write time, so later equi-joins/aggregations
    * on those columns read co-located data and skip the shuffle entirely
    * (SortMergeJoin with zero Exchange — asserted in SinksSpec). This is
    * the 100 TB fact-to-fact join strategy: pay the partitioning once at
    * ingest, not per query. Requires a catalog (`saveAsTable`); pick
    * nBuckets ~ cluster cores x small multiple.
    */
  def bucketedTable(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
