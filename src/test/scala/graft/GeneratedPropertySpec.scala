package graft

import graft.functions.GraftFunctions
import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generated algebraic laws (SURVEY §5.2): properties hold for
  * arbitrary generated data, not just the fixtures. Spark round-trips are
  * expensive, so generation is bounded (small lists, few cases) — the goal
  * is shrinkable counterexamples for law violations, not fuzz volume.
  */
class GeneratedPropertySpec extends SparkSpec {

  /** Deterministic ScalaCheck sampling (the scalatest bridge artifact is
    * not in the offline cache): n samples from fixed seeds, so failures
    * reproduce exactly.
    */
  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default.withSize(12), Seed(i.toLong)))

  private def forAllSampled[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    samples(ga).zip(samples(gb)).foreach { case (a, b) => f(a, b) }

  private val vecGen: Gen[List[Float]] =
    Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f)
        .suchThat(f => !f.isNaN)))
      .suchThat(v => v.exists(_ != 0.0f))

  test("cosine_sim is symmetric, bounded, and 1 on self (generated vectors)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    forAllSampled(vecGen, vecGen) { (a0: List[Float], b0: List[Float]) =>
      val n = math.min(a0.size, b0.size)
      val (a, b) = (a0.take(n), b0.take(n))
      val row = Seq((a, b)).toDF("a", "b").select(
        call_function("cosine_sim", col("a"), col("b")).as("ab"),
        call_function("cosine_sim", col("b"), col("a")).as("ba"),
        call_function("cosine_sim", col("a"), col("a")).as("aa")).head()
      val (ab, ba, aa) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(ab == ba, s"not symmetric: $ab vs $ba")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"out of range: $ab")
      assert(math.abs(aa - 1.0) < 1e-9, s"self-sim != 1: $aa")
    }
  }

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.chooseNum(1, 15).flatMap { n =>
      Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(k =>
        Gen.listOfN(k, Gen.oneOf("alpha", "beta", "gamma", "delta"))
          .map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    }

  test("keep-first dedup is idempotent and keeps the minimum key (generated docs)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    samples(docsGen).foreach { (docs: List[(Long, String)]) =>
      val df = docs.toDF("doc_id", "text")
      val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
      val dedup = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      // one survivor per distinct text, and it is the smallest doc_id
      val expect = docs.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
      val got = dedup.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      assert(got == expect, s"got $got expect $expect")
      val twice = dedup.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(twice.count() == dedup.count())
    }
  }

  test("salted join equals plain join (generated keys and salt factors)") {
    import spark.implicits._
    val keyGen = Gen.listOfN(30, Gen.chooseNum(0L, 4L))
    forAllSampled(keyGen, Gen.chooseNum(2, 9)) { (ks: List[Long], salt: Int) =>
      val left = ks.zipWithIndex.map { case (k, i) => (i.toLong, k) }
        .toDF("id", "k")
      val right = (0L to 4L).map(k => (k, s"d$k")).toDF("rk", "name")
      val plain = left.join(right, col("k") === col("rk"))
        .select("id", "name")
      val salted = SaltedJoin.inner(left, right, col("k"), col("rk"), col("id"), salt)
        .select("id", "name")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }

  test("topKPerGroup equals per-group sorted take-k (generated groups)") {
    import graft.api.Graft
    import spark.implicits._
    val rowsGen = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 20L)))
    forAllSampled(rowsGen, Gen.chooseNum(1, 4)) { (rows, k) =>
      // unique (grp, v, uid) triples: uid makes the order total
      val df = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("grp", "v", "uid")
      val got = Graft.topKPerGroup(df, Seq(col("grp")),
          Seq(col("v").desc, col("uid")), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val want = rows.zipWithIndex
        .map { case ((g, v), i) => (g, v, i.toLong) }
        .groupBy(_._1).values
        .flatMap(_.sortBy(t => (-t._2, t._3)).take(k))
        .toSet
      assert(got == want, s"k=$k got=${got.size} want=${want.size}")
    }
  }

  test("applyChanges: batched == sequential, and replay is idempotent (generated)") {
    import graft.api.Graft
    import spark.implicits._
    // changes: (key in small space, payload, global version, op)
    val changesGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 99L),
        Gen.oneOf("u", "u", "d")))
    forAllSampled(changesGen, Gen.const(())) { (raw, _) =>
      val base = Seq((0L, 100L), (1L, 101L), (9L, 109L)).toDF("k", "p")
      // version = list index: unique, strictly ordered
      val cs = raw.zipWithIndex.map { case ((k, p, op), i) =>
        (k, p, i.toLong, op)
      }
      val all = cs.toDF("k", "p", "ver", "op")
      val (first, second) = cs.splitAt(cs.size / 2)
      val batched = Graft.applyChanges(base, all, "k", "ver", "op")
      val sequential = Graft.applyChanges(
        Graft.applyChanges(base, first.toDF("k", "p", "ver", "op"),
          "k", "ver", "op"),
        second.toDF("k", "p", "ver", "op"), "k", "ver", "op")
      assert(batched.exceptAll(sequential).isEmpty &&
        sequential.exceptAll(batched).isEmpty,
        "one merge of all changes == two sequential half-merges")
      // replaying the full change set over the merged snapshot is a no-op
      // for every key whose last change was an upsert (deletes drop keys,
      // and base rows rank below changes, so replay re-applies the same
      // winners)
      val replay = Graft.applyChanges(batched, all, "k", "ver", "op")
      assert(replay.exceptAll(batched).isEmpty &&
        batched.exceptAll(replay).isEmpty,
        "replaying the same changes is idempotent")
    }
  }

  test("activityIslands partitions the tick set into non-adjacent runs (generated)") {
    import graft.api.Graft
    import spark.implicits._
    val ticksGen = Gen.listOfN(2,
      Gen.zip(Gen.chooseNum(1L, 3L), Gen.nonEmptyListOf(Gen.chooseNum(0L, 30L))))
    forAllSampled(ticksGen, Gen.const(())) { (byKey, _) =>
      val rows = byKey.flatMap { case (k, ts) => ts.map(k -> _) }
      val islands = Graft.activityIslands(rows.toDF("k", "t"),
          col("k"), col("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      val expect = rows.groupMap(_._1)(_._2).view.mapValues(_.distinct.sorted)
      for ((k, ticks) <- expect) {
        val mine = islands.filter(_._1 == k).sortBy(_._2)
        // islands partition the distinct ticks exactly
        assert(mine.map(i => i._3 - i._2 + 1).sum == ticks.size,
          s"k=$k islands $mine vs ticks $ticks")
        assert(mine.forall(i => i._4 == i._3 - i._2 + 1),
          s"k=$k count != span on consecutive run: $mine")
        // maximality: consecutive islands never touch
        mine.sliding(2).foreach {
          case Array(a, b) => assert(b._2 > a._3 + 1,
            s"k=$k adjacent islands should have merged: $a $b")
          case _ =>
        }
        // every island's ticks are present and its boundary neighbors absent
        val tickSet = ticks.toSet
        assert(mine.forall(i => (i._2 to i._3).forall(tickSet.contains)))
        assert(mine.forall(i =>
          !tickSet.contains(i._2 - 1) && !tickSet.contains(i._3 + 1)))
      }
    }
  }

  test("ksStatistic is symmetric, in [0,1], and 0 iff same multiset (generated)") {
    import graft.api.Graft
    import spark.implicits._
    val listGen = Gen.nonEmptyListOf(Gen.chooseNum(-5.0, 5.0))
    forAllSampled(listGen, listGen) { (xs, ys) =>
      val (a, b) = (xs.toDF("x"), ys.toDF("x"))
      val dAb = Graft.ksStatistic(a, b, col("x")).head.getDouble(2)
      val dBa = Graft.ksStatistic(b, a, col("x")).head.getDouble(2)
      assert(dAb == dBa, s"not symmetric: $dAb vs $dBa")
      assert(dAb >= 0.0 && dAb <= 1.0, s"out of range: $dAb")
      val dAa = Graft.ksStatistic(a, a, col("x")).head.getDouble(2)
      assert(dAa == 0.0, s"self-distance must be 0: $dAa")
      if (xs.sorted != ys.sorted)
        assert(dAb > 0.0, "different multisets must have D > 0")
    }
  }

  test("triangles on disjoint cliques = sum of C(k,3) (generated)") {
    import graft.api.Graft
    import spark.implicits._
    val sizesGen = Gen.listOfN(3, Gen.chooseNum(1, 5))
    forAllSampled(sizesGen, Gen.const(())) { (sizes, _) =>
      var base = 0L
      val edges = sizes.flatMap { k =>
        val ids = (base until base + k)
        base += k + 1 // gap keeps cliques disjoint
        for (a <- ids; b <- ids if a < b) yield (a, b)
      }
      val want = sizes.map(k => k.toLong * (k - 1) * (k - 2) / 6).sum
      val got =
        if (edges.isEmpty) 0L
        else Graft.triangles(edges.toDF("a", "b")).count()
      assert(got == want, s"cliques $sizes: got $got triangles, want $want")
    }
  }

  private val xyGen: Gen[List[(Long, Long)]] =
    Gen.chooseNum(1, 14).flatMap(n => Gen.listOfN(n,
      for (x <- Gen.chooseNum(0L, 9L); y <- Gen.chooseNum(0L, 9L))
        yield (x, y)))

  test("skyline2D equals brute-force dominance on generated point sets") {
    import graft.api.Graft
    import spark.implicits._
    def dominates(q: (Long, Long), p: (Long, Long)): Boolean =
      (q._1 >= p._1 && q._2 > p._2) || (q._1 > p._1 && q._2 >= p._2)
    forAllSampled(xyGen, Gen.const(())) { (pts, _) =>
      val df = pts.zipWithIndex
        .map { case ((x, y), i) => (i.toLong, x, y) }.toDF("id", "x", "y")
      val got = Graft.skyline2D(df, col("x"), col("y"), 100L)
        .collect().map(_.getLong(0)).toSet
      val want = pts.zipWithIndex.collect {
        case ((x, y), i) if !pts.exists(q => dominates(q, (x, y))) => i.toLong
      }.toSet
      assert(got == want, s"points $pts: got $got want $want")
    }
  }

  private val seriesGen: Gen[List[Double]] =
    Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-50.0, 50.0).suchThat(!_.isNaN)))

  test("ewma stays inside the window envelope and is exact on prefixes") {
    import graft.api.Graft
    import spark.implicits._
    forAllSampled(seriesGen, Gen.const(())) { (xs, _) =>
      val df = xs.zipWithIndex.map { case (v, i) => (1L, i, v) }
        .toDF("k", "t", "x")
      val rows = Graft.ewma(df, col("k"), Seq(col("t")), col("x"), 0.7, 4)
        .orderBy("t").collect().map(_.getDouble(3))
      xs.indices.foreach { i =>
        val window = xs.slice(math.max(0, i - 3), i + 1)
        assert(rows(i) >= window.min - 1e-6 && rows(i) <= window.max + 1e-6,
          s"ewma ${rows(i)} outside [${window.min}, ${window.max}] at $i")
        // driver-side recomputation of the renormalized truncated EWMA
        val m = window.size
        val num = window.zipWithIndex
          .map { case (v, j) => v * math.pow(0.7, m - 1 - j) }.sum
        val want = num * 0.3 / (1 - math.pow(0.7, m))
        assert(math.abs(rows(i) - want) < 1e-6, s"at $i: ${rows(i)} vs $want")
      }
    }
  }
}
