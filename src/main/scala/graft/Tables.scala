package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table registry (TESTDATA.md / FIXTURES.md).
  *
  * One Parquet file per table under the scale-factor directory. The reader is
  * Spark's vectorized Parquet scan, so column pruning + predicate pushdown
  * are applied automatically for any downstream `select`/`filter`.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view named after itself, for the
    * SQL entry surface (subqueries, UDF-in-SQL, ...). Cheap: only footer
    * metadata is read at registration time.
    */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
