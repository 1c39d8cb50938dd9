package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query of the engine's operator surface (SURVEY.md §2B).
  *
  * @param name stable key, also the driver's result-directory name
  * @param fn   Spark-side builder: (session, sf-dir) => result DataFrame.
  *             Every result ends with a total ORDER BY over a unique key
  *             (FIXTURES.md normalization rule 1).
  * @param sql  equivalent DuckDB SQL over the same parquet-backed views;
  *             None = engine-verified only (driver does a rows-only check).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])
