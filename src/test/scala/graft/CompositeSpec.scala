package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the Composite pack (q110-q112): LATERAL decorrelation
  * equivalence, map-HOF semantics, bitwise-aggregate identities.
  */
class CompositeSpec extends SparkSpec {

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("q110 LATERAL top-2 equals the window row_number formulation") {
    val lat = run("q110_lateral")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val o = Tables(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val ref = o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2 && col("o_custkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lat == ref,
      s"missing=${ref -- lat}\nextra=${lat -- ref}")
    assert(lat.nonEmpty)
  }

  test("q110 decorrelates: the plan has a window, not a per-row subquery") {
    val df = run("q110_lateral")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    assert(!p.toLowerCase.contains("cartesian"), p)
  }

  test("q111 map HOFs: doubled string, filter count, and zip sum agree " +
      "with scalar recomputation") {
    val rows = run("q111_map_hof").limit(200).collect()
    assert(rows.nonEmpty)
    val base = Tables(spark, sfDir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("v"),
        length(col("event_type")).as("tl"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2))))
      .toMap
    rows.foreach { r =>
      val (v, tl) = base(r.getLong(0))
      val b = (v * 3) % 97
      assert(r.getString(1) == s"a=${v * 2},b=${b * 2},c=${tl * 2}")
      assert(r.getInt(2) ==
        Seq(v, b, tl).count(_ >= 50))
      assert(r.getLong(3) == 2L * (v + b + tl))
    }
  }

  test("q112 bit aggregates: or covers and, popcount bounds, parity " +
      "reproduces a fold") {
    val rows = run("q112_bitagg").collect()
    assert(rows.size == 6) // 3 returnflags x 2 linestatus
    rows.foreach { r =>
      val (orF, andF) = (r.getInt(2), r.getInt(3))
      assert((orF & andF) == andF, s"and must be subset of or: $r")
      assert(orF >= 0 && orF <= 15)
    }
    // parity check against a driver-side fold on one group
    val flags = Tables(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R" && col("l_linestatus") === "F")
      .select(
        (when(col("l_returnflag") === "R", 1).otherwise(0) +
         when(col("l_linestatus") === "F", 2).otherwise(0) +
         when(col("l_quantity") > 25, 4).otherwise(0) +
         when(col("l_discount") > 0.05, 8).otherwise(0)).as("flag"))
      .collect().map(_.getInt(0))
    val expected = flags.foldLeft(0)(_ ^ _)
    val got = rows.find(r => r.getString(0) == "R" && r.getString(1) == "F")
      .get.getInt(4) // parity column
    assert(got == expected)
  }

  test("q113 allocation: every order's cents sum EXACTLY to its total") {
    val alloc = run("q113_alloc")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("alloc_cents")).as("allocated"))
    val totals = Tables(spark, sfDir, "orders").select(
      col("o_orderkey"),
      (col("o_totalprice").cast("decimal(25,6)") * 100).cast("long")
        .as("t"))
    val bad = alloc.join(totals,
        col("l_orderkey") === col("o_orderkey"))
      .where(col("allocated") =!= col("t"))
    assert(bad.count() == 0)
    // and no allocation is negative
    assert(run("q113_alloc").where(col("alloc_cents") < 0).count() == 0)
  }

  test("q114 grid-cell pairs equal the brute-force cross join") {
    import graft.api.Graft
    val pts = Tables(spark, sfDir, "customer").select(
      col("c_custkey").as("cid"),
      (expr("conv(substring(md5(cast(c_custkey as string)),1,8),16,10)")
        .cast("long") % 1200000L).as("gx"),
      (expr("conv(substring(md5(concat('x', cast(c_custkey as string)))," +
        "1,8),16,10)").cast("long") % 3600000L).as("gy"))
    val fast = Graft.gridNeighborPairs(pts, col("cid"), col("gx"),
        col("gy"), radius = 30000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2 = pts.select(col("cid").as("cid2"), col("gx").as("gx2"),
      col("gy").as("gy2"))
    val brute = pts.crossJoin(p2)
      .where(col("cid") < col("cid2") &&
        ((col("gx") - col("gx2")) * (col("gx") - col("gx2")) +
          (col("gy") - col("gy2")) * (col("gy") - col("gy2")))
          <= 30000L * 30000L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(fast == brute,
      s"missing=${brute -- fast}\nextra=${fast -- brute}")
    assert(fast.nonEmpty)
  }

  test("q115 docsim: scores are in (0,1] and self-similarity of a " +
      "duplicated doc is 1") {
    import graft.api.Graft
    val rows = run("q115_docsim").collect()
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= 0.6 - 1e-9 && c <= 1.0 + 1e-9, r)
    }
    // a corpus of two identical docs scores exactly 1.0 on integer math
    import spark.implicits._
    val two = Seq((1L, "alpha beta beta gamma x y"),
      (2L, "alpha beta beta gamma x y")).toDF("doc_id", "text")
    val out = Graft.cosineSimPairsSparse(two, col("doc_id"), col("text"),
      minDf = 2L, maxDf = 10L, minCos = 0.0).collect()
    // sqrt(n)*sqrt(n) may differ from n by 1 ulp — identical on every
    // IEEE engine, so the oracle's 6dp compare is unaffected
    assert(out.length == 1 &&
      math.abs(out.head.getDouble(3) - 1.0) < 1e-12)
  }

  test("q116 FIFO conservation: per demand line, matched quantity never " +
      "exceeds the line's own quantity, and equals it when supply covers " +
      "the line's interval") {
    // demand ids repeat across parts (the composite omits partkey by
    // design — matching is per part), so the invariant joins on BOTH.
    // The rare fully-tied duplicate row (same part, orderkey, linenumber,
    // suppkey) shares its cumulative interval under RANGE window
    // semantics on both engines; exclude those ids from the invariant.
    val matched = run("q116_fifo")
      .groupBy(col("l_partkey"), col("demand_id"))
      .agg(sum(col("qty")).as("got"))
    val li = Tables(spark, sfDir, "lineitem")
    val demand = li.where(col("l_returnflag") === "N")
      .select(col("l_partkey"),
        ((col("l_orderkey") * 10 + col("l_linenumber")) * 100000 +
          col("l_suppkey")).as("demand_id"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_partkey"), col("demand_id"))
      .agg(sum(col("q")).as("q"), count(lit(1)).as("nrows"))
      .where(col("nrows") === 1)
    val joined = matched.join(demand, Seq("l_partkey", "demand_id"))
    assert(joined.where(col("got") > col("q")).count() == 0,
      "matched more than the demand line's quantity")
    // any match at all implies qty >= 1
    assert(run("q116_fifo").where(col("qty") < 1).count() == 0)
    assert(matched.count() > 0)
  }

  test("q117 ORC roundtrip preserves the parquet-derived aggregate") {
    val viaOrc = run("q117_orc_roundtrip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val direct = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(25,6)") * 100).cast("long")
          .as("cents"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(viaOrc == direct)
  }

  test("q118 LOCF: non-null inputs keep their value; gaps take the " +
      "previous good reading; leading gaps stay null") {
    val events = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getDouble(3)))
    val filled = run("q118_locf").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // replay per user in (ts, event_id) order
    events.groupBy(_._2).foreach { case (_, es) =>
      var lastv: Option[Double] = None
      es.sortBy(e => (e._3, e._1)).foreach { case (eid, _, _, v) =>
        if (v >= 10) lastv = Some(math.rint(v * 1e6) / 1e6)
        assert(filled(eid).map(x => math.rint(x * 1e6) / 1e6) == lastv,
          s"event $eid: got ${filled(eid)}, want $lastv")
      }
    }
  }

  test("q119 weighted median: at least half the weight sits on each side") {
    val med = run("q119_weighted_median").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(med.size == 3)
    val rows = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(25,6)") * 100).cast("long")
          .as("cents"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    med.foreach { case (flag, m) =>
      val grp = rows.filter(_._1 == flag)
      val tot = grp.map(_._3).sum
      val below = grp.filter(_._2 <= m).map(_._3).sum
      val above = grp.filter(_._2 >= m).map(_._3).sum
      assert(below * 2 >= tot, s"$flag: below=$below tot=$tot")
      assert(above * 2 >= tot, s"$flag: above=$above tot=$tot")
    }
  }

  test("q120 sequence match agrees with a driver-side replay") {
    val got = run("q120_seq_match").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3)))).toMap
    val events = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    events.groupBy(_._1).foreach { case (uid, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4).mkString(",")
      val hit = if (seq.matches(".*view.*click.*purchase.*")) 1 else 0
      assert(got(uid) == ((es.size.toLong, hit)), s"user $uid")
    }
  }

  test("q121 CUSUM: final cumulative deviation is ~0 and alarms only " +
      "where |cusum| exceeds 2 sigma") {
    val rows = run("q121_cusum").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getInt(4)))
    // the last cusum per type must return to ~0 (sum of deviations)
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val last = rs.maxBy(_._2)._4
      assert(math.abs(last) < 1e-3, s"$t last cusum $last")
    }
    assert(rows.exists(_._5 == 0))
  }

  test("q122 expectations: clean fixture checks pass; seeded violations " +
      "are counted") {
    val base = run("q122_expectations").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base.size == 5)
    // the fixture is referentially intact and range-clean
    assert(base("lineitem_orderkey_fk") == 0)
    assert(base("lineitem_returnflag_notnull") == 0)
    assert(base("lineitem_discount_range") == 0)
    assert(base("lineitem_quantity_positive") == 0)
    // pk uniqueness reports the known duplicate surplus (>= 0)
    assert(base("lineitem_pk_unique") >= 0)
  }

  test("q123 rolling correlation values lie in [-1, 1] and match a " +
      "driver recomputation") {
    val daily = Tables(spark, sfDir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("y"))
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val got = run("q123_rolling_corr").collect()
      .map(r => r.getDate(0).toString -> r.getDouble(1)).toMap
    daily.sliding(7).foreach { win =>
      if (win.size == 7) {
        val n = 7L
        val (sx, sy) = (win.map(_._2).sum, win.map(_._3).sum)
        val sxx = win.map(t => t._2 * t._2).sum
        val syy = win.map(t => t._3 * t._3).sum
        val sxy = win.map(t => t._2 * t._3).sum
        val den = math.sqrt((n * sxx - sx * sx).toDouble) *
          math.sqrt((n * syy - sy * sy).toDouble)
        val expect = (n * sxy - sx * sy).toDouble / den
        val day = win.last._1
        got.get(day).foreach { c =>
          assert(math.abs(c - expect) < 1e-5, s"$day: $c vs $expect")
          assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
        }
      }
    }
    assert(got.nonEmpty)
  }

  test("q125 union-by-name: widened schema null-fills the missing side " +
      "and keeps every row") {
    val out = run("q125_union_byname")
    val nLi = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    val nO = Tables(spark, sfDir, "orders").count()
    assert(out.count() == nLi + nO)
    assert(out.where(col("src") === "v1" && col("price_cents").isNotNull)
      .count() == 0)
    assert(out.where(col("src") === "v2" && col("qty").isNotNull)
      .count() == 0)
  }

  test("q126 shares: nations sum to 1 within each region, regions sum " +
      "to 1 globally") {
    val rows = run("q126_share_of_parent").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._2).foreach { case (region, rs) =>
      val s = rs.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$region nation shares sum $s")
    }
    val regionShares = rows.map(r => r._2 -> r._5).toMap.values.sum
    assert(math.abs(regionShares - 1.0) < 1e-4)
  }

  test("q127 set-op sizes respect inclusion-exclusion on every row") {
    run("q127_array_setops").collect().foreach { r =>
      val (h, t, i, u, e) = (r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5))
      assert(u == h + t - i, r)
      assert(e == h - i, r)
      assert(i <= math.min(h, t))
    }
  }

  test("q128 A/B arms partition the traffic and rates subtract to lift") {
    val rows = run("q128_ab_lift").collect()
    val (na, nb) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(na + nb == Tables(spark, sfDir, "events").count())
    rows.foreach { r =>
      assert(math.abs(r.getDouble(5) -
        (math.rint((r.getDouble(4) - r.getDouble(3)) * 1e6) / 1e6))
        < 2e-6, r)
    }
  }

  test("q129 k-fold: cells within a stratum differ by at most one doc " +
      "and cover the stratum") {
    val rows = run("q129_kfold").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val counts = rs.map(_._3)
      assert(counts.max - counts.min <= 1, s"$lang folds $counts")
      val total = Tables(spark, sfDir, "documents")
        .where(col("lang") === lang).count()
      assert(counts.sum == total)
    }
  }

  test("q130 CSV roundtrip preserves the parquet-derived aggregate") {
    val viaCsv = run("q130_csv_roundtrip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val direct = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")),
        sum(unix_timestamp(col("ts"))), min(col("event_id")))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(viaCsv == direct)
  }

  test("q131 survival: risk set shrinks over time and hazard is in (0,1]") {
    val rows = run("q131_survival").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 >= b._2,
        s"risk set grew: $a -> $b")
      case _ =>
    }
    rows.foreach { case (_, n, dd, h) =>
      assert(dd >= 1 && dd <= n)
      assert(h > 0 && h <= 1)
    }
  }

  test("q132 reconcile buckets cover every order exactly once") {
    val rows = run("q132_reconcile").collect()
    val n = rows.map(_.getLong(1)).sum
    assert(n == Tables(spark, sfDir, "orders").count())
    rows.foreach { r =>
      if (r.getString(0) == "exact") assert(r.getLong(2) == 0)
    }
  }

  test("q133 clamped inventory equals a sequential replay and is " +
      "never negative") {
    val rows = run("q133_stock_clamp").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3)))
    assert(rows.forall(_._4 >= 0))
    rows.groupBy(_._1).foreach { case (pk, rs) =>
      var pos = 0L
      rs.sortBy(_._2).foreach { case (_, day, net, onHand) =>
        pos = math.max(0L, pos + net)
        assert(onHand == pos, s"part $pk day $day: $onHand != $pos")
      }
    }
  }

  test("q138 nested totals equal the flat relational aggregation") {
    val nested = run("q138_nested_orders").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val flat = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(25,6)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(col("l_returnflag") === "N", col("cents"))),
          lit(0L)).as("nf"),
        sum(col("cents")).as("tot"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(nested == flat)
    assert(nested.nonEmpty)
  }

  test("q141 kappa is bounded and po/pe are probabilities") {
    val rows = run("q141_kappa").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (po, pe) = (r.getDouble(4), r.getDouble(5))
      assert(po >= 0 && po <= 1, s"po=$po")
      assert(pe > 0 && pe < 1, s"pe=$pe")
      if (!r.isNullAt(6)) {
        val k = r.getDouble(6)
        assert(k >= -1.000001 && k <= 1.000001, s"kappa=$k")
      }
    }
  }

  test("q142 robust scaling: each language has medians centred at 0") {
    val rows = run("q142_robust_scale").collect()
      .map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
    assert(rows.nonEmpty)
    // about half of each language's docs scale below 0, half above
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val finite = rs.filter(t => !t._3.isNaN)
      if (finite.length >= 10) {
        val neg = finite.count(_._3 < 0).toDouble / finite.length
        assert(neg > 0.2 && neg < 0.8, s"$lang: neg share $neg")
      }
    }
  }

  test("q124 velocity counts include the event itself and are >= 1") {
    val rows = run("q124_velocity").collect()
    assert(rows.forall(_.getLong(2) >= 1))
    // flag agrees with the count
    rows.foreach { r =>
      assert((r.getLong(2) > 3) == (r.getInt(3) == 1))
    }
  }
}
