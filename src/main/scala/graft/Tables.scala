package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Fixture-table registry (TESTDATA.md / FIXTURES.md).
  *
  * One Parquet file per table under the scale-factor directory. The reader is
  * Spark's vectorized Parquet scan, so column pruning + predicate pushdown
  * are applied automatically for any downstream `select`/`filter`.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to map to
  * its µs TimestampType. We read it as raw nanos (explicit LongType read
  * schema — no session conf needed) and convert
  * with integer division — lossless here (the fixture has no sub-µs
  * components; DuckDB's reader does the same ns→µs cast on the oracle side).
  * Trade-off noted for scale: predicates on the converted `ts` don't push
  * into the Parquet scan; a production layout would store µs timestamps.
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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.read.schema(eventsRawSchema).parquet(s"$dir/$name.parquet")
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
