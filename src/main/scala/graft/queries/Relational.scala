package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Relational core: scan/projection, filter, the join family, cross join,
  * multi-way join, sort/limit/top-k, set operations (SURVEY.md §2B
  * Q01–Q10, Q19–Q21).
  *
  * Scale notes (100 TB posture):
  *  - Projections/filters are declared on the scan so Catalyst pushes them
  *    into the Parquet reader (verify `PushedFilters`/`ReadSchema`).
  *  - Dimension tables (region/nation/customer at dim scale) are broadcast
  *    explicitly; fact-fact joins shuffle on their equi-keys and AQE picks
  *    SMJ/SHJ + skew splitting at runtime.
  */
object Relational {

  val qs: Seq[Q] = Seq(
    Q("q01_scan",
      (s, d) => {
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q02_filter",
      (s, d) => {
        Tables(s, d, "orders")
          .filter(col("o_totalprice") > 1000.0 && col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority
             |FROM orders WHERE o_totalprice > 1000 AND o_orderstatus = 'F'
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q03_join_inner",
      (s, d) => {
        val o = Tables(s, d, "orders")
        val c = Tables(s, d, "customer")
        o.join(c, o("o_custkey") === c("c_custkey"), "inner")
          .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
            col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_custkey, c_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_orderkey""".stripMargin)),

    Q("q04_join_broadcast",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val n = Tables(s, d, "nation")
        val r = Tables(s, d, "region")
        // nation/region are fixed-size dims: always broadcast, never shuffle
        // the customer side on nationkey.
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, n_name, r_name
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |ORDER BY c_custkey""".stripMargin)),

    Q("q05_join_left",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("order_cnt"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, COUNT(o_orderkey) AS order_cnt
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("q06_join_semi",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q07_join_anti",
      (s, d) => {
        val c = Tables(s, d, "customer")
        val o = Tables(s, d, "orders").select(col("o_custkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    Q("q08_join_theta",
      (s, d) => {
        val l = Tables(s, d, "lineitem")
        val p = Tables(s, d, "part")
        // Equi-key + residual predicate: executes as a hash/SMJ on
        // l_partkey with the range condition applied as a post-join filter —
        // never a nested-loop cross product.
        l.join(p, l("l_partkey") === p("p_partkey") &&
            l("l_extendedprice") > p("p_retailprice"))
          .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"),
            col("l_extendedprice"), col("p_retailprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, p_partkey, l_extendedprice,
             |  p_retailprice
             |FROM lineitem JOIN part
             |  ON l_partkey = p_partkey AND l_extendedprice > p_retailprice
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("q09_join_cross",
      (s, d) => {
        Tables(s, d, "region").crossJoin(Tables(s, d, "nation"))
          .select(col("r_name"), col("n_name"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""SELECT r_name, n_name FROM region CROSS JOIN nation
             |ORDER BY r_name, n_name""".stripMargin)),

    Q("q10_join_multiway",
      (s, d) => {
        val cutoff = lit("1998-07-01 00:00:00").cast(TimestampType)
        val c = Tables(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = Tables(s, d, "orders").filter(col("o_orderdate") < cutoff)
        val l = Tables(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
          .select(col("o_orderkey"), col("revenue"),
            col("o_orderdate"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(s"""SELECT o_orderkey,
              |  ${Exact.sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
              |  CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1998-07-01 00:00:00'
              |  AND l_shipdate > TIMESTAMP '1998-07-01 00:00:00'
              |GROUP BY o_orderkey, o_orderdate
              |ORDER BY revenue DESC, o_orderkey
              |LIMIT 10""".stripMargin)),

    Q("q19_topk",
      (s, d) => {
        // orderBy().limit() compiles to TakeOrderedAndProject: per-partition
        // top-k then a k-row merge on the driver — no global sort/shuffle.
        Tables(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber"))
          .limit(25)
      },
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 25""".stripMargin)),

    Q("q20_union_all",
      (s, d) => {
        val c = Tables(s, d, "customer").select(
          col("c_custkey").as("ent_key"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"), lit("customer").as("src"))
        val sup = Tables(s, d, "supplier").select(
          col("s_suppkey").as("ent_key"), col("s_name").as("name"),
          col("s_acctbal").as("acctbal"), lit("supplier").as("src"))
        c.union(sup).orderBy(col("src"), col("ent_key"))
      },
      Some("""SELECT c_custkey AS ent_key, c_name AS name, c_acctbal AS acctbal,
             |  'customer' AS src FROM customer
             |UNION ALL
             |SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier
             |ORDER BY src, ent_key""".stripMargin)),

    Q("q20_union_distinct",
      (s, d) => {
        val c = Tables(s, d, "customer")
          .select(col("c_nationkey").as("nationkey"))
        val sup = Tables(s, d, "supplier")
          .select(col("s_nationkey").as("nationkey"))
        c.union(sup).distinct().orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    Q("q21_intersect",
      (s, d) => {
        Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .intersect(Tables(s, d, "supplier")
            .select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    Q("q21_except",
      (s, d) => {
        Tables(s, d, "customer").select(col("c_nationkey").as("nationkey"))
          .except(Tables(s, d, "supplier")
            .select(col("s_nationkey").as("nationkey")))
          .orderBy(col("nationkey"))
      },
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // Full outer join: customers with no orders AND orders with no
    // customer both survive, keys coalesced for a total result ordering.
    Q("q05_join_full",
      (s, d) => {
        val c = Tables(s, d, "customer")
          .filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey"), col("c_name"))
        val o = Tables(s, d, "orders")
          .filter(col("o_custkey") % 3 === 1)
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        c.join(o, c("c_custkey") === o("o_custkey"), "full")
          .select(coalesce(col("c_custkey"), col("o_custkey")).as("k"),
            col("c_name"), col("n_orders"))
          .orderBy(col("k"))
      },
      Some("""SELECT coalesce(c_custkey, o_custkey) AS k, c_name, n_orders
             |FROM (SELECT c_custkey, c_name FROM customer
             |      WHERE c_custkey % 3 = 0) c
             |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders
             |                 FROM orders WHERE o_custkey % 3 = 1
             |                 GROUP BY o_custkey) o
             |  ON c_custkey = o_custkey
             |ORDER BY k""".stripMargin)),

    // Multiset set operations: EXCEPT ALL / INTERSECT ALL keep
    // multiplicities (bag semantics), unlike q21's set variants.
    Q("q21_setops_all",
      (s, d) => {
        val c = Tables(s, d, "customer").select(col("c_nationkey").as("nk"))
        val su = Tables(s, d, "supplier").select(col("s_nationkey").as("nk"))
        c.exceptAll(su).groupBy(col("nk")).agg(count(lit(1)).as("n_except"))
          .join(
            c.intersectAll(su).groupBy(col("nk"))
              .agg(count(lit(1)).as("n_intersect")),
            Seq("nk"), "full")
          .orderBy(col("nk"))
      },
      Some("""WITH ex AS (
             |  SELECT nk, count(*) AS n_except FROM (
             |    SELECT c_nationkey AS nk FROM customer
             |    EXCEPT ALL
             |    SELECT s_nationkey FROM supplier)
             |  GROUP BY nk),
             |ix AS (
             |  SELECT nk, count(*) AS n_intersect FROM (
             |    SELECT c_nationkey AS nk FROM customer
             |    INTERSECT ALL
             |    SELECT s_nationkey FROM supplier)
             |  GROUP BY nk)
             |SELECT coalesce(ex.nk, ix.nk) AS nk, n_except, n_intersect
             |FROM ex FULL OUTER JOIN ix ON ex.nk = ix.nk
             |ORDER BY nk""".stripMargin)),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys
    // match each other, unlike plain =. The fixtures are null-free, so
    // nulls are synthesized deterministically with nullif.
    Q("q03_nullsafe_join",
      (s, d) => {
        val c = Tables(s, d, "customer")
          .select(col("c_custkey"), nullif(pmod(col("c_nationkey"), lit(5)), lit(3)).as("k"))
        val n = Tables(s, d, "nation")
          .filter(col("n_nationkey") < 5)
          .select(nullif(pmod(col("n_nationkey"), lit(5)), lit(3)).as("nk"),
            col("n_name"))
        c.join(n, col("k") <=> col("nk"))
          .select(col("c_custkey"), col("k"), col("n_name"))
          .orderBy(col("c_custkey"), col("n_name"))
      },
      Some("""SELECT c_custkey, k, n_name FROM
             |  (SELECT c_custkey, nullif(c_nationkey % 5, 3) AS k
             |   FROM customer) c
             |JOIN (SELECT nullif(n_nationkey % 5, 3) AS nk, n_name
             |      FROM nation WHERE n_nationkey < 5) n
             |  ON k IS NOT DISTINCT FROM nk
             |ORDER BY c_custkey, n_name""".stripMargin)),

    // Pagination: ORDER BY ... LIMIT ... OFFSET — deterministic because
    // the ordering key is unique.
    Q("q19_offset",
      (s, d) => {
        Tables(s, d, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .offset(50)
          .limit(25)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 25 OFFSET 50""".stripMargin)),

    // Q46 — grouped top-k (Graft.topKPerGroup): top-3 orders by price per
    // order status, deterministic via the unique orderkey tiebreak. One
    // hash shuffle; row_number streams each group (no per-group buffering).
    Q("q46_topk_grouped",
      (s, d) => {
        graft.api.Graft.topKPerGroup(
            Tables(s, d, "orders")
              .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice")),
            keys = Seq(col("o_orderstatus")),
            order = Seq(col("o_totalprice").desc, col("o_orderkey")),
            k = 3)
          .orderBy(col("o_orderstatus"), col("o_totalprice").desc,
            col("o_orderkey"))
      },
      Some("""SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
             |  SELECT o_orderstatus, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_orderstatus
             |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
             |  FROM orders)
             |WHERE rk <= 3
             |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey"""
        .stripMargin)),

    // Q44 — as-of (point-in-time) join: each click gets the latest
    // same-user purchase at-or-before it. Spark side is the union+window
    // forward-fill operator (Graft.asofJoin — one shuffle, never |L|·|R|);
    // oracle is DuckDB's native ASOF LEFT JOIN.
    Q("q44_asof_join",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("value").as("last_purchase_value"))
        graft.api.Graft.asofJoin(clicks, purch, "user_id", "ts")
          .select(col("event_id"), col("user_id"), col("last_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'click'),
             |purch AS (
             |  SELECT user_id, ts, value AS last_purchase_value FROM events
             |  WHERE event_type = 'purchase')
             |SELECT c.event_id, c.user_id, p.last_purchase_value
             |FROM clicks c ASOF LEFT JOIN purch p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY c.event_id""".stripMargin)),

    // Q44b — as-of join with a staleness bound (pandas merge_asof
    // tolerance): a prior purchase older than 1 h is no match — the row
    // survives with null. Same one-shuffle fill shape; the tolerance test
    // is row-local on the packed struct. Oracle mirrors Spark's
    // seconds-granularity arithmetic (floor each side, then diff) so
    // boundary rows agree bit-for-bit.
    Q("q44_asof_tolerance",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("value").as("last_purchase_value"))
        graft.api.Graft.asofJoinTolerance(clicks, purch, "user_id", "ts",
            tolerance = Some(3600L))
          .select(col("event_id"), col("user_id"), col("last_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'click'),
             |purch AS (
             |  SELECT user_id, ts, value AS last_purchase_value FROM events
             |  WHERE event_type = 'purchase')
             |SELECT c.event_id, c.user_id,
             |  CASE WHEN (epoch_us(c.ts) // 1000000)
             |         - (epoch_us(p.ts) // 1000000) <= 3600
             |       THEN p.last_purchase_value END AS last_purchase_value
             |FROM clicks c ASOF LEFT JOIN purch p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY c.event_id""".stripMargin)),

    // Q44c — the hot-key formulation (Graft.asofJoinSplit): value-
    // identical to q44_asof_join (SAME oracle — the strongest identity
    // statement available) but the fill window partitions by (user, day)
    // with per-day carry rows from a splits-sized exclusive window, so a
    // billion-row key spreads across range/86400 tasks instead of one.
    Q("q44_asof_split",
      (s, d) => {
        val ev = Tables(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"),
            col("value").as("last_purchase_value"))
        graft.api.Graft.asofJoinSplit(clicks, purch, "user_id", "ts",
            splitWidth = 86400L)
          .select(col("event_id"), col("user_id"), col("last_purchase_value"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id, user_id, ts FROM events
             |  WHERE event_type = 'click'),
             |purch AS (
             |  SELECT user_id, ts, value AS last_purchase_value FROM events
             |  WHERE event_type = 'purchase')
             |SELECT c.event_id, c.user_id, p.last_purchase_value
             |FROM clicks c ASOF LEFT JOIN purch p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY c.event_id""".stripMargin)),

    // Q45 — range (interval-containment) join: clicks within ±1 h of a
    // same-user purchase. Spark side is the bucketed range join
    // (Graft.rangeJoin — equi-join on (key, time-bucket), exact after the
    // containment re-check); oracle is the plain inequality join, feasible
    // at oracle scale.
    Q("q45_range_join",
      (s, d) => {
        val hourUs = 3600000000L
        val ev = Tables(s, d, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            unix_micros(col("ts")).as("cus"))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            (unix_micros(col("ts")) - hourUs).as("lo"),
            (unix_micros(col("ts")) + hourUs).as("hi"))
        graft.api.Graft.rangeJoin(clicks, purch, "user_id", "cus", "lo", "hi",
            bucketWidth = hourUs)
          .select(col("click_id"), col("user_id"), col("purchase_id"))
          .orderBy(col("click_id"), col("purchase_id"))
      },
      Some("""WITH clicks AS (
             |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cus
             |  FROM events WHERE event_type = 'click'),
             |purch AS (
             |  SELECT event_id AS purchase_id, user_id,
             |    epoch_us(ts) - 3600000000 AS lo,
             |    epoch_us(ts) + 3600000000 AS hi
             |  FROM events WHERE event_type = 'purchase')
             |SELECT c.click_id, c.user_id, p.purchase_id
             |FROM clicks c JOIN purch p
             |  ON c.user_id = p.user_id AND p.lo <= c.cus AND c.cus <= p.hi
             |ORDER BY click_id, purchase_id""".stripMargin)),

    // Q47 — skew-salted equi-join (operators.SaltedJoin): the hot side's
    // key is salted into 8 sub-keys (salt = pure function of l_orderkey —
    // deterministic under stage retry, see SPARK-23207) and the supplier
    // side replicates across salts, so a pathological hot supplier spreads
    // over 8 reducers instead of one straggler. Result is row-identical to
    // the plain join — the oracle IS the plain join, proving that identity
    // end-to-end, not just in SaltedJoinSpec.
    Q("q47_salted_join",
      (s, d) => {
        graft.operators.SaltedJoin.inner(
            Tables(s, d, "lineitem"), Tables(s, d, "supplier"),
            leftKey = col("l_suppkey"), rightKey = col("s_suppkey"),
            leftSaltSource = col("l_orderkey"), saltFactor = 8)
          .groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_items"),
            Exact.dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy(col("s_nationkey"))
      },
      Some(s"""SELECT s_nationkey, count(*) AS n_items,
             |  ${Exact.sqlSum("l_extendedprice")} AS sum_price
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY s_nationkey
             |ORDER BY s_nationkey""".stripMargin)),

    // Q48 — CDC apply-changes / MERGE upsert (Graft.applyChanges): fold a
    // change stream into a base snapshot — per key the highest-version row
    // wins, a winning delete drops the key. Fixture: customer as base;
    // orders replayed as changes (version = o_orderkey, final-status
    // orders act as deletes). One keyed window shuffle — the relational
    // core lakehouse MERGE INTO compiles to.
    Q("q48_upsert",
      (s, d) => {
        val base = Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val changes = Tables(s, d, "orders")
          .select(col("o_custkey").as("c_custkey"),
            concat(lit("upd#"), col("o_orderkey").cast(StringType))
              .as("c_name"),
            col("o_totalprice").as("c_acctbal"),
            col("o_orderkey").as("ver"),
            when(col("o_orderstatus") === "F", "d").otherwise("u").as("op"))
        graft.api.Graft.applyChanges(base, changes, key = "c_custkey",
            version = "ver", op = "op")
          .orderBy(col("c_custkey"))
      },
      Some("""WITH b AS (
             |  SELECT c_custkey, c_name, c_acctbal,
             |    CAST(-9223372036854775808 AS BIGINT) AS ver, 'u' AS op
             |  FROM customer),
             |c AS (
             |  SELECT o_custkey AS c_custkey,
             |    'upd#' || CAST(o_orderkey AS VARCHAR) AS c_name,
             |    o_totalprice AS c_acctbal, o_orderkey AS ver,
             |    CASE WHEN o_orderstatus = 'F' THEN 'd' ELSE 'u' END AS op
             |  FROM orders),
             |r AS (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY c_custkey ORDER BY ver DESC) AS rn
             |  FROM (SELECT * FROM b UNION ALL SELECT * FROM c))
             |SELECT c_custkey, c_name, c_acctbal
             |FROM r WHERE rn = 1 AND op <> 'd'
             |ORDER BY c_custkey""".stripMargin))
  )
}
