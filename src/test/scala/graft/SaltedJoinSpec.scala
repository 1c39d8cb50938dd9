package graft

import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._

/** Salted join is row-identical to the plain join and spreads hot keys. */
class SaltedJoinSpec extends SparkSpec {

  test("salted inner join equals plain inner join on skewed data") {
    import spark.implicits._
    // skew: 90% of left rows share key 1
    val left = (1 to 2000).map(i => (i.toLong, if (i % 10 == 0) i.toLong % 7 else 1L))
      .toDF("id", "k")
    val right = (0L to 8L).map(k => (k, s"dim_$k")).toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk"))
      .select("id", "k", "name")
    val salted = SaltedJoin.inner(left, right, col("k"), col("rk"), col("id"), 8)
      .select("id", "k", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("replicated side carries every salt value") {
    import spark.implicits._
    val left = Seq((1L, 1L)).toDF("id", "k")
    val right = Seq((1L, "x")).toDF("rk", "name")
    // with one left row only one salt matches, but the join must still find it
    val out = SaltedJoin.inner(left, right, col("k"), col("rk"), col("id"), 16)
    assert(out.count() == 1)
  }

  test("salt is a pure function of the row: identical result under repartitioning") {
    import spark.implicits._
    val left = (1 to 500).map(i => (i.toLong, 1L)).toDF("id", "k")
    val right = Seq((1L, "hot")).toDF("rk", "name")
    val a = SaltedJoin.inner(left, right, col("k"), col("rk"), col("id"), 8)
      .select("id", "k", "name")
    // re-deriving the salt after an arbitrary repartition must route every
    // row identically — this is what monotonically_increasing_id() breaks
    val b = SaltedJoin.inner(left.repartition(7), right, col("k"), col("rk"),
        col("id"), 8)
      .select("id", "k", "name")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
