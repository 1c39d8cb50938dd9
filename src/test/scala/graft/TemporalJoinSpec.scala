package graft

import graft.api.Graft
import org.apache.spark.sql.functions._

/** Edge semantics of the temporal join operators (Graft.asofJoin /
  * Graft.rangeJoin) on hand-built frames: inclusive equal-timestamp match,
  * left-outer nulls, latest-wins, bucket-straddling intervals, exactness
  * of the bucket candidate join (no duplicate pairs).
  */
class TemporalJoinSpec extends SparkSpec {

  test("asofJoin: latest right row at-or-before each left row, left outer") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, 1.0), // key 1: quotes at t=10, 20
      (1L, 20L, 2.0),
      (2L, 50L, 9.0)
    ).toDF("k", "t", "px")
    val trades = Seq(
      (1L, 5L),  // before any quote -> null
      (1L, 10L), // equal ts -> inclusive match 1.0
      (1L, 15L), // between -> 1.0
      (1L, 25L), // after both -> latest 2.0
      (3L, 99L)  // key with no quotes -> null
    ).toDF("k", "t").withColumn("tid", col("t") * 100)
    val out = Graft.asofJoin(trades, quotes, "k", "t")
      .orderBy("k", "t")
      .select("k", "t", "px")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 5L, null), (1L, 10L, 1.0), (1L, 15L, 1.0), (1L, 25L, 2.0),
      (3L, 99L, null)))
  }

  test("asofJoin: a genuine NULL in a matched right row survives; columns never mix rows") {
    import spark.implicits._
    // key 1: row at t=10 has (px=1.0, sz=100); row at t=20 has (px=null, sz=200).
    // A per-column forward-fill would resurrect px=1.0 at t=25 — mixing fields
    // of two different right rows. Atomic struct fill must keep (null, 200).
    val quotes = Seq(
      (1L, 10L, Some(1.0), Some(100L)),
      (1L, 20L, None, Some(200L))
    ).toDF("k", "t", "px", "sz")
    val trades = Seq((1L, 15L), (1L, 25L)).toDF("k", "t")
      .withColumn("tid", col("t") * 100)
    val out = Graft.asofJoin(trades, quotes, "k", "t")
      .orderBy("t").select("t", "px", "sz").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2)))
    assert(out.toSeq == Seq((15L, 1.0, 100L), (25L, null, 200L)))
  }

  test("asofJoinTolerance: stale matches null out, boundary inclusive") {
    import spark.implicits._
    val quotes = Seq((1L, 90L, 1.0), (1L, 95L, 2.0)).toDF("k", "t", "px")
    val trades = Seq(
      (1L, 100L), // diff to latest quote (95) = 5  <= 110 -> 2.0
      (1L, 205L), // diff 110, boundary INCLUSIVE   -> 2.0
      (1L, 206L), // diff 111, stale                -> null
      (2L, 100L)  // no quote at all                -> null
    ).toDF("k", "t")
    val out = Graft.asofJoinTolerance(trades, quotes, "k", "t",
        tolerance = Some(110L))
      .orderBy("k", "t").select("k", "t", "px").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(out.toSeq == Seq(
      (1L, 100L, 2.0), (1L, 205L, 2.0), (1L, 206L, null), (2L, 100L, null)))
    // tolerance None ≡ plain asofJoin (same operator underneath)
    val plain = Graft.asofJoinTolerance(trades, quotes, "k", "t", None)
      .orderBy("k", "t").select("px").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(plain.toSeq == Seq(2.0, 2.0, 2.0, null))
  }

  test("asofJoinSplit: identical to asofJoin across split boundaries and hot keys") {
    import spark.implicits._
    // quotes sparse (some splits empty -> carry must chain across them),
    // trades dense; key 9 is a "hot" key with every row (the shape the
    // split variant exists for); unique (k, t) so both orders agree
    val quotes = (for (k <- 0L to 3L; i <- 0L to 40L)
      yield (k, 7L + i * 23L + k, (i * 23L + k).toDouble)).toDF("k", "t", "px")
      .union(Seq((9L, 3L, 99.0)).toDF("k", "t", "px")) // one early quote
    val trades = (for (k <- 0L to 3L; i <- 0L to 150L)
      yield (k, i * 7L + k)).toDF("k", "t")
      .union((0L to 900L).map(i => (9L, i + 4L)).toDF("k", "t"))
    val viaSplit = Graft.asofJoinSplit(trades, quotes, "k", "t",
        splitWidth = 100L)
    val viaPlain = Graft.asofJoin(trades, quotes, "k", "t")
    assert(viaSplit.exceptAll(viaPlain).isEmpty &&
      viaPlain.exceptAll(viaSplit).isEmpty,
      "split-window formulation must be value-identical")
    // the hot key's single early quote must carry through EVERY later
    // split (splits 1..9 have no quotes at all)
    assert(viaSplit.filter(col("k") === 9L && col("px").isNull).count() == 0)
    // the data-sized fill must be keyed by (key, split) — only the
    // splits-sized carry window may partition by key alone
    val plan = viaSplit.queryExecution.optimizedPlan.toString
    assert(plan.contains("__split"), plan.take(2000))
  }

  test("asofJoinSplit: equivalence holds at extreme split widths") {
    import spark.implicits._
    // W=1 makes every tick its own split (the carry chain does ALL the
    // matching); W=10^6 collapses to one split (pure in-split fill) —
    // both must agree with the plain operator on irregular data
    // groupBy(k, t) enforces unique right (key, time): duplicate right
    // times are tiebreak-nondeterministic in BOTH formulations and would
    // make the comparison flaky rather than meaningful
    val quotes = (0L to 3L).flatMap(k =>
      (0L to 25L).map(i => (k, (i * i * 13 + k * 5) % 700, (i + k).toDouble)))
      .toDF("k", "t", "px")
      .groupBy(col("k"), col("t")).agg(max(col("px")).as("px"))
    val trades = (0L to 3L).flatMap(k =>
      (0L to 80L).map(i => (k, (i * 31 + k) % 900))).distinct.toDF("k", "t")
    val plain = Graft.asofJoin(trades, quotes, "k", "t")
    Seq(1L, 7L, 1000000L).foreach { w =>
      val split = Graft.asofJoinSplit(trades, quotes, "k", "t", w)
      assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty,
        s"splitWidth=$w diverges from asofJoin")
    }
  }

  test("asofJoin: overlapping value-column names are rejected") {
    import spark.implicits._
    val a = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    val b = Seq((1L, 1L, "y")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] { Graft.asofJoin(a, b, "k", "t") }
  }

  test("rangeJoin: exact containment pairs, intervals straddling buckets, no dups") {
    import spark.implicits._
    val points = Seq(
      (1L, 0L), (1L, 99L), (1L, 100L), (1L, 250L),
      (2L, 50L)
    ).toDF("k", "p")
    val intervals = Seq(
      (1L, 90L, 110L, "a"),  // straddles buckets 0 and 1 (width 100)
      (1L, 0L, 300L, "b"),   // spans 4 buckets, contains all key-1 points
      (2L, 60L, 70L, "c"),   // contains nothing
      (2L, 500L, 400L, "d")  // inverted (lo > hi) -> dropped
    ).toDF("k", "lo", "hi", "tag")
    val out = Graft.rangeJoin(points, intervals, "k", "p", "lo", "hi", 100L)
      .select("k", "p", "tag").orderBy("k", "p", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, 0L, "b"), (1L, 99L, "a"), (1L, 99L, "b"), (1L, 100L, "a"),
      (1L, 100L, "b"), (1L, 250L, "b")))
  }

  test("asofJoin equals the naive theta-join + keep-latest on generated data") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val trades = (1 to 400).map(i =>
      ((i % 5).toLong, (i * 13 % 997).toLong, i.toLong)).toDF("k", "t", "tid")
    val quotes = (1 to 80).map(i =>
      ((i % 5).toLong, (i * 31 % 997).toLong, i * 1.5)).toDF("k", "t", "px")
      // unique (k, t): keep max px per timestamp so "latest" is well-defined
      .groupBy("k", "t").agg(max("px").as("px"))
    val fast = Graft.asofJoin(trades, quotes, "k", "t")
      .select("k", "t", "tid", "px")
    val naive = trades.as("l")
      .join(quotes.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l.k"), col("l.tid"))
          .orderBy(col("r.t").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select(col("l.k").as("k"), col("l.t").as("t"), col("tid"), col("px"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("rangeJoin equals the naive theta join on random-ish data") {
    import spark.implicits._
    val points = (1 to 300).map(i => ((i % 7).toLong, (i * 37 % 1000).toLong))
      .toDF("k", "p")
    val intervals = (1 to 60).map { i =>
      val lo = (i * 53 % 900).toLong
      ((i % 7).toLong, lo, lo + (i % 5) * 40L, i.toLong)
    }.toDF("k", "lo", "hi", "iid")
    val bucketed = Graft.rangeJoin(points, intervals, "k", "p", "lo", "hi", 128L)
      .select("k", "p", "iid")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("lo") <= col("p") && col("p") <= col("hi"))
      .select("k", "p", "iid")
    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
  }
}
