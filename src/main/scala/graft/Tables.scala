package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType, TimestampNTZType, TimestampType}

/** Fixture-table registry (TESTDATA.md / FIXTURES.md).
  *
  * One Parquet file per table under the scale-factor directory. The reader is
  * Spark's vectorized Parquet scan, so column pruning + predicate pushdown
  * are applied automatically for any downstream `select`/`filter`.
  *
  * `events.ts` has shipped in two physical flavors across fixture
  * generations, so the reader branches on the parquet footer's declared type:
  *
  *  - TIMESTAMP(MICROS) (current fixtures): plain `spark.read.parquet` —
  *    Spark 4 maps µs natively, and predicates on `ts` push into the scan.
  *  - TIMESTAMP(NANOS) (older fixtures): Spark 4 refuses to map nanos to its
  *    µs TimestampType, and footer inference throws. We fall back to reading
  *    `ts` as raw nanos (explicit LongType read schema — no session conf
  *    needed) and convert with `timestamp_micros(ts DIV 1000)` — lossless
  *    (those fixtures had no sub-µs components; DuckDB does the same ns→µs
  *    cast on the oracle side). On that path predicates on the converted
  *    `ts` don't push into the scan; acceptable for a legacy-compat branch.
  *
  * Silently applying the ns path to µs data compresses the event stream
  * 1000× (30 days → ~43 min in 1970) — SmokeSpec carries a tripwire
  * asserting the fixture's time span so dtype drift fails loudly.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Explicit read schema for events, with `ts` requested as raw LongType
    * nanos. A user-supplied schema skips footer inference entirely, so the
    * read needs NO session conf (`nanosAsLong`) — the previous approach of
    * setting that legacy flag inside apply() silently changed how every
    * OTHER ns-timestamp parquet read in the session resolves.
    */
  private[graft] val eventsRawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Read schema for the current µs fixtures: identical, but `ts` requested
    * directly as the engine's TimestampType (µs, UTC session).
    */
  private[graft] val eventsMicrosSchema = StructType(
    eventsRawSchema.fields.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampType) else f))

  /** Footer probe for the events fixture: true when the `ts` column's own
    * parquet logical type is a non-NANOS timestamp (µs/ms — Spark maps
    * both natively). Reads the footer DIRECTLY with the parquet-hadoop
    * API and inspects exactly the `ts` annotation, so the decision can
    * never be confused by an unrelated inference failure (a different
    * exotic column, a transient IO error) — any such error propagates
    * instead of silently selecting the DIV-1000 legacy path and
    * reproducing the 1000× time-compression bug as wrong results.
    * Footer-only — no data pages are touched. Memoized per dir FOR THE
    * LIFE OF THE JVM and never invalidated: fixtures are immutable for a
    * run (Verify/Bench/tests all launch fresh JVMs), and the probe would
    * otherwise run before EVERY events read. A process that REPLACES an
    * events fixture in place and re-reads the same dir would see the
    * stale classification — swap the directory, not the file. Shared
    * with the Hive-catalog registration path so both catalogs branch
    * identically.
    */
  private val microsProbeCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private[graft] def eventsTsIsNativeMicros(spark: SparkSession,
      dir: String): Boolean =
    microsProbeCache.computeIfAbsent(dir, _ => {
      import org.apache.hadoop.fs.Path
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      import org.apache.parquet.schema.LogicalTypeAnnotation.{TimeUnit, TimestampLogicalTypeAnnotation}
      val conf = spark.sparkContext.hadoopConfiguration
      val declared = new Path(s"$dir/events.parquet")
      val fs = declared.getFileSystem(conf)
      // the probe (unlike the pre-r10 declared-schema path) touches the
      // footer at REGISTRATION time, so an absent fixture surfaces here —
      // name the fixture in the error instead of a bare FileNotFound
      val status =
        try fs.getFileStatus(declared)
        catch { case e: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(
            s"events fixture missing at $declared — the catalog probes its " +
              "parquet footer to pick the timestamp read path", e)
        }
      // fixture contract is a single file, but tolerate a Spark-written
      // directory layout by probing its first data file — every part of
      // one write shares a schema
      val file =
        if (status.isDirectory)
          fs.listStatus(declared).iterator
            .map(_.getPath)
            .find(p => p.getName.endsWith(".parquet"))
            .getOrElse(throw new IllegalArgumentException(
              s"$declared contains no parquet files"))
        else declared
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val schema = reader.getFooter.getFileMetaData.getSchema
        if (!schema.containsField("ts")) false
        else {
          val ts = schema.getFields.get(schema.getFieldIndex("ts"))
          ts.getLogicalTypeAnnotation match {
            case t: TimestampLogicalTypeAnnotation =>
              t.getUnit != TimeUnit.NANOS
            case _ =>
              // no annotation: INT96 (Spark's own default timestamp
              // encoding) maps natively to TimestampType → native path;
              // a bare INT64 is the legacy raw-nanos shape → legacy path
              ts.asPrimitiveType().getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96
          }
        }
      } finally reader.close()
    })

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      val path = s"$dir/$name.parquet"
      if (eventsTsIsNativeMicros(spark, dir))
        // User-supplied read schema (not a session conf): request `ts` as
        // TimestampType so µs-NTZ footers map straight to the engine's LTZ
        // type. Session TZ is UTC everywhere in this engine, so the instant
        // is identical and predicate pushdown on `ts` is kept.
        spark.read.schema(eventsMicrosSchema).parquet(path)
      else spark.read.schema(eventsRawSchema).parquet(path)
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every fixture table as a temp view named after itself, for the
    * SQL entry surface (subqueries, UDF-in-SQL, ...). Cheap: only footer
    * metadata is read at registration time.
    */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
