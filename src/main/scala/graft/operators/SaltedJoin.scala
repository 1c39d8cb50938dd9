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
  * Reference mapping: the reference's placement policy is a uniform-random
  * worker pick (src/thread-pools.lisp:116–119, src/scheduler.lisp:168–173)
  * — salting is the same randomize-to-balance idea applied to shuffle key
  * routing, where Spark's locality-aware scheduler can't help because the
  * imbalance is in the data, not the workers.
  *
  * Cost model: right side is replicated saltFactor times — use for
  * fact-to-small/medium joins where the hot side is the fact. For
  * fact-to-fact skew, prefer AQE or isolate the hot keys and broadcast
  * them separately.
  */
object SaltedJoin {

  /** @param leftSaltSource a DETERMINISTIC per-row expression on `left`
    *   (typically its unique id). The salt must be a pure function of row
    *   content: deriving it from `monotonically_increasing_id()`/`rand()`
    *   is the SPARK-23207 hazard — a stage retry re-assigns ids, rows land
    *   on different shuffle partitions than the first attempt, and the
    *   fetch-side dedup silently drops or duplicates them. That failure
    *   only manifests with executor loss, i.e. exactly the 1000-executor
    *   run this operator exists for.
    */
  def inner(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftSaltSource: Column,
      saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftSaltSource), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated,
        leftKey === rightKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
