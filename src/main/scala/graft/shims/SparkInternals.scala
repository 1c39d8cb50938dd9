/* This file lives in a subpackage of org.apache.spark.sql ON PURPOSE:
 * the two bridges below (logical plan → DataFrame, catalyst Expression →
 * Column) are `private[sql]` in Spark, and placing ecosystem code in an
 * org.apache.spark.sql.* package to reach them is the established
 * pattern of every major Spark table format (Delta ships under
 * org.apache.spark.sql.delta for exactly this reason). Keep this file
 * MINIMAL — it exists only to re-export the two functions; all engine
 * logic stays in the graft.* packages.
 */
package org.apache.spark.sql.graftshims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset,
  ExpressionUtils, SparkSession => ClassicSparkSession}

/** Minimal accessors for two `private[sql]` Spark seams used by the
  * vanilla-DML rule ([[graft.plans.VanillaDml]]):
  *  - `ofRows` turns an ANALYZED logical plan (e.g. a MERGE statement's
  *    source subtree) back into a DataFrame the engine's verbs accept;
  *  - `column` wraps a catalyst Expression as a user-facing Column
  *    (assignment values / conditions harvested from parsed DML plans).
  */
object SparkInternals {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Where the session catalog would put `db.table` — honors the
    * database's locationUri, not just the warehouse dir (used by
    * `CREATE TABLE ... USING graft` without LOCATION).
    */
  def defaultTablePath(spark: SparkSession, db: String,
      table: String): String =
    spark.asInstanceOf[ClassicSparkSession].sessionState.catalog
      .defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
      .toString
}
