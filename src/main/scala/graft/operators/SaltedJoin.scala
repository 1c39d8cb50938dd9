package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (left) side's key into
  * `saltFactor` sub-keys and explode the right side across all salts, so a
  * hot key's rows spread over `saltFactor` shuffle partitions instead of
  * one straggler task.
  *
  * This is the manual escape hatch beyond AQE's skew-join splitting (AQE
  * only splits at shuffle-block granularity and needs the stats to notice;
  * a pathological hot key in a 1000-executor job still wants explicit
  * salting). Result is row-identical to a plain inner equi-join —
  * SaltedJoinSpec asserts that as a property.
  *
  * Cost model: right side is replicated saltFactor times — use for
  * fact-to-small/medium joins where the hot side is the fact. For
  * fact-to-fact skew, prefer AQE or isolate the hot keys and broadcast
  * them separately.
  */
object SaltedJoin {

  def inner(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor))
        .cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        leftKey === rightKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
