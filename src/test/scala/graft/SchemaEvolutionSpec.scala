package graft

import graft.sources.{GraftSql, VersionedTable => VT}
import org.apache.spark.sql.functions._

/** ALTER TABLE ADD/RENAME/DROP COLUMN / ALTER COLUMN TYPE — O(metadata)
  * schema evolution on [[graft.sources.VersionedTable]]: the mapping
  * chain applies at read time per dir, copy-on-write verbs materialize
  * it, time travel shows each era's schema, existing deferred deletes
  * ride THROUGH evolution (the raw-frame filter binds before the
  * mapping), and the guards keep the directions that cannot compose
  * refused (a NEW delete under a mapping, referenced columns).
  */
class SchemaEvolutionSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-schevo").toString

  /** Raw manifest body of `version` — the test-side observability seam
    * for materialization (a version under a mapping carries a "schema"
    * field; a materialized one must not).
    */
  private def manifestBody(table: String, version: Long): String = {
    val p = java.nio.file.Paths.get(table, "_manifests",
      f"v$version%08d.json")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private def freshNation(t: String): Long =
    VT.commit(spark, Tables(spark, sfDir, "nation"), t)

  test("ADD COLUMN backfills the default without rewriting a byte") {
    val t = tmp() + "/t"
    freshNation(t)
    val v2 = VT.addColumn(spark, t, "tier", "INT", Some("7"))
    assert(v2 == 2L)
    // the new version reuses v1's dir verbatim — O(metadata)
    val d1 = manifestBody(t, 1L)
    val d2 = manifestBody(t, 2L)
    def dir(s: String) = """"dir":"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
    assert(dir(d1) == dir(d2), "schema version must reuse the base dirs")
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.contains("tier"))
    assert(latest.schema("tier").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(latest.filter(col("tier") === 7).count() == latest.count())
    // time travel: the pre-evolution snapshot has no such column
    assert(!VT.readVersion(spark, t, 1L).columns.contains("tier"))
  }

  test("ADD COLUMN without default reads NULL") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.addColumn(spark, t, "note", "STRING")
    val latest = VT.readLatest(spark, t)
    assert(latest.filter(col("note").isNull).count() == latest.count())
  }

  test("RENAME COLUMN maps at read time; old versions keep the old name") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.renameColumn(spark, t, "n_name", "nation_name")
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.contains("nation_name") &&
      !latest.columns.contains("n_name"))
    // values ride the rename untouched
    val orig = Tables(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name").as("nation_name"))
    assert(latest.select("n_nationkey", "nation_name")
      .exceptAll(orig).isEmpty)
    assert(VT.readVersion(spark, t, 1L).columns.contains("n_name"))
  }

  test("DROP COLUMN projects away at read time; history keeps it") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.dropColumn(spark, t, "n_regionkey")
    assert(!VT.readLatest(spark, t).columns.contains("n_regionkey"))
    assert(VT.readVersion(spark, t, 1L).columns.contains("n_regionkey"))
  }

  test("append after rename: mixed-vintage dirs read as one logical table") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.renameColumn(spark, t, "n_name", "nation_name")
    val extra = spark.createDataFrame(Seq(
      (900, "ATLANTIS", 0), (901, "LEMURIA", 1)))
      .toDF("n_nationkey", "nation_name", "n_regionkey")
    VT.append(spark, t, extra)
    val latest = VT.readLatest(spark, t)
    assert(latest.count() == 25 + 2)
    assert(latest.columns.sorted.toSeq ==
      Seq("n_nationkey", "n_regionkey", "nation_name"))
    assert(latest.filter(col("nation_name") === "ATLANTIS").count() == 1)
    // the pre-rename rows still map: every original name present
    assert(latest.filter(col("nation_name") === "CANADA").count() ==
      Tables(spark, sfDir, "nation")
        .filter(col("n_name") === "CANADA").count())
  }

  test("chain composes: rename a->b then re-add a reads both correctly") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.renameColumn(spark, t, "n_name", "nation_name")
    VT.addColumn(spark, t, "n_name", "STRING", Some("'redacted'"))
    val latest = VT.readLatest(spark, t)
    assert(latest.filter(col("n_name") === "redacted").count() ==
      latest.count())
    assert(latest.filter(col("nation_name").isNotNull).count() ==
      latest.count())
  }

  test("copy-on-write materializes the mapping; pruning resumes after") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.renameColumn(spark, t, "n_name", "nation_name")
    assert(manifestBody(t, 2L).contains("\"schema\""))
    // CoW UPDATE reads the mapped snapshot and writes real columns
    val v3 = VT.updateWhere(spark, t, col("n_nationkey") === 0,
      Map("nation_name" -> lit("ZERO")))
    assert(!manifestBody(t, v3).contains("\"schema\""),
      "CoW version must not carry the chain — it materialized it")
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.contains("nation_name"))
    assert(latest.filter(col("nation_name") === "ZERO").count() == 1)
    // and the mapped INTERMEDIATE version still time-travels correctly
    assert(VT.readVersion(spark, t, 2L).columns.contains("nation_name"))
  }

  test("pruned reads degrade (not break) under a mapping, then recover") {
    val t = tmp() + "/t"
    VT.commitClustered(spark, Tables(spark, sfDir, "nation"), t,
      clusterCols = Seq("n_nationkey"), numFiles = 3)
    VT.renameColumn(spark, t, "n_nationkey", "nation_key")
    // bounds reference the NEW logical name; the stats sidecar holds the
    // old physical one — the read must degrade to a full mapped scan and
    // still answer correctly
    val got = VT.readLatestPruned(spark, t,
      bounds = Seq(graft.sources.VersionedTable.ColumnBounds(
        "nation_key", Some(3), Some(5))))
    assert(got.count() == 3)
    assert(got.columns.contains("nation_key"))
  }

  test("readChanges on a schema version is an EMPTY batch, not a stall") {
    val t = tmp() + "/t"
    freshNation(t)
    val v2 = VT.addColumn(spark, t, "tier", "INT", Some("1"))
    val ch = VT.readChanges(spark, t, v2)
    assert(ch.count() == 0)
    assert(ch.columns.contains("__op") && ch.columns.contains("__ver"))
    assert(ch.columns.contains("tier"),
      "the empty batch carries the POST-evolution logical schema")
  }

  test("shallow clone of an evolved table reads the evolved schema") {
    val t = tmp() + "/src"
    val c = tmp() + "/clone"
    freshNation(t)
    VT.renameColumn(spark, t, "n_name", "nation_name")
    VT.shallowClone(spark, c, t)
    val cloned = VT.readLatest(spark, c)
    assert(cloned.columns.contains("nation_name"))
    assert(cloned.count() == 25)
  }

  test("compaction retires schema-carrying manifests; mapping survives") {
    // r14: the checkpoint folds each version's schema-sidecar ref next
    // to its dir, so the chain keeps applying after the per-version
    // manifests retire — previously schema-carrying manifests were
    // permanently compaction-exempt (an unbounded un-compactable
    // listing on drip-append evolved tables)
    val t = tmp() + "/t"
    freshNation(t)
    VT.addColumn(spark, t, "tier", "INT", Some("3"))
    // pile on mapped appends so compaction retires CHAIN-carrying
    // manifests, not just unmapped ones
    (1 to 4).foreach(_ => VT.append(spark, t,
      VT.readLatest(spark, t).limit(1)))
    VT.compactManifests(spark, t, keepRecent = 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, "_manifests", "v00000002.json")),
      "the schema version's manifest must fold and retire")
    // every version still reads with the mapping intact, from the
    // checkpoint-folded refs
    assert(VT.readVersion(spark, t, 2L).columns.contains("tier"))
    assert(VT.readVersion(spark, t, 3L).columns.contains("tier"))
    assert(VT.readLatest(spark, t).columns.contains("tier"))
    assert(VT.readLatest(spark, t).filter(col("tier") === 3).count() ==
      VT.readLatest(spark, t).count())
    // and a LATER alter keeps composing on top of the folded chain
    VT.renameColumn(spark, t, "tier", "tier2")
    assert(VT.readLatest(spark, t).columns.contains("tier2"))
    assert(VT.readVersion(spark, t, 2L).columns.contains("tier"))
  }

  test("guards: referenced / duplicate / reserved / last-column cases") {
    val t = tmp() + "/t"
    freshNation(t)
    VT.addConstraints(spark, t, Map("key_pos" -> "n_nationkey >= 0"))
    intercept[IllegalArgumentException] {
      VT.renameColumn(spark, t, "n_nationkey", "nk")
    }
    intercept[IllegalArgumentException] {
      VT.dropColumn(spark, t, "n_nationkey")
    }
    intercept[IllegalArgumentException] { // target name taken
      VT.renameColumn(spark, t, "n_name", "n_regionkey")
    }
    intercept[IllegalArgumentException] { // duplicate add
      VT.addColumn(spark, t, "n_name", "STRING")
    }
    intercept[IllegalArgumentException] { // reserved CDC prefix
      VT.addColumn(spark, t, "__ver", "INT")
    }
    intercept[IllegalArgumentException] { // nondeterministic default
      VT.addColumn(spark, t, "lucky", "DOUBLE", Some("rand()"))
    }
  }

  test("deferred deletes COMPOSE with evolution: delete then ALTER") {
    // r14: the del sidecar travels forward by name through ALTER verbs —
    // sound because readVersion filters each dir's RAW frame BEFORE the
    // chain suffix maps it, and recorded predicates always bind to their
    // scoped dirs' physical names (deletes are refused while a chain is
    // active, so every predicate predates every op added after it)
    val t = tmp() + "/t"
    freshNation(t) // 25 rows
    VT.deleteWhereLazy(spark, t, "n_nationkey = 24")
    VT.addColumn(spark, t, "tier", "INT", Some("7"))
    // renaming the very column the predicate references still binds
    VT.renameColumn(spark, t, "n_nationkey", "nation_key")
    val latest = VT.readLatest(spark, t)
    assert(latest.count() == 24)
    assert(latest.columns.contains("nation_key") &&
      latest.columns.contains("tier"))
    assert(latest.filter(col("nation_key") === 24).count() == 0)
    assert(latest.filter(col("tier") === 7).count() == 24)
    // the pruned read path degrades to the mapped scan but stays correct
    assert(VT.readLatestPruned(spark, t, bounds = Nil).count() == 24)
    // CDC: the schema versions are empty batches in the mapped schema
    assert(VT.readChanges(spark, t, 3L).isEmpty)
    assert(VT.readChanges(spark, t, 4L).columns.contains("nation_key"))
    // time travel: v2 (delete, pre-chain) filters without mapping
    assert(VT.readVersion(spark, t, 2L).count() == 24 &&
      VT.readVersion(spark, t, 2L).columns.contains("n_nationkey"))
    // a CoW verb materializes BOTH the mapping and the deletes at once
    val vCow = VT.optimize(spark, t)
    assert(!manifestBody(t, vCow).contains("\"schema\"") &&
      !manifestBody(t, vCow).contains("\"del\""))
    assert(VT.readLatest(spark, t).count() == 24)
  }

  test("guard kept: a NEW deferred delete under an active mapping refuses") {
    // the reverse direction cannot compose: the new predicate binds to
    // LOGICAL names but evaluates against each dir's RAW frame
    val t2 = tmp() + "/t2"
    freshNation(t2)
    VT.renameColumn(spark, t2, "n_name", "nation_name")
    intercept[IllegalArgumentException] {
      VT.deleteWhereLazy(spark, t2, "n_nationkey = 24")
    }
    // and the documented escape hatch works: materialize, then proceed
    VT.optimize(spark, t2)
    VT.deleteWhereLazy(spark, t2, "n_nationkey = 24")
    assert(VT.readLatest(spark, t2).count() == 24)
  }

  test("appends under a chain share ONE schema sidecar (O(#alters) bytes)") {
    // drip-append ingest after an ALTER must not rewrite an ever-growing
    // position map per batch: appends reference the base's sidecar by
    // name; the NEXT alter is what pins the since-appended dirs
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(2).select(col("id"), lit(0L).as("v")), t)
    VT.addColumn(spark, t, "c", "INT", Some("1"))                    // v2
    VT.append(spark, t, spark.createDataFrame(Seq((100L, 0L, 5)))
      .toDF("id", "v", "c"))                                         // v3
    VT.append(spark, t, spark.createDataFrame(Seq((101L, 0L, 6)))
      .toDF("id", "v", "c"))                                         // v4
    def ref(v: Long): String =
      """"schema":"([^"]+)"""".r.findFirstMatchIn(manifestBody(t, v))
        .get.group(1)
    assert(ref(2L) == ref(3L) && ref(3L) == ref(4L),
      "appends must share the ALTER's sidecar by name")
    VT.renameColumn(spark, t, "c", "c2")                             // v5
    assert(ref(5L) != ref(4L), "an ALTER writes a fresh sidecar")
    val latest = VT.readLatest(spark, t)
    assert(latest.filter(col("c2") === 5).count() == 1)
    assert(latest.filter(col("c2") === 6).count() == 1)
    assert(latest.filter(col("c2") === 1).count() == 2) // backfilled base
  }

  test("ALTER COLUMN TYPE widens at read time; appends store wide") {
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(3).select(col("id"),
      lit(7).cast("int").as("n")), t)
    val v2 = VT.widenColumn(spark, t, "n", "BIGINT")
    assert(v2 == 2L)
    // O(metadata): v2 reuses v1's dir verbatim
    def dir(s: String) =
      """"dir":"([^"]+)"""".r.findFirstMatchIn(s).get.group(1)
    assert(dir(manifestBody(t, 1L)) == dir(manifestBody(t, 2L)))
    val latest = VT.readLatest(spark, t)
    assert(latest.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(latest.filter(col("n") === 7L).count() == 3)
    // time travel keeps the narrow era narrow
    assert(VT.readVersion(spark, t, 1L).schema("n").dataType ==
      org.apache.spark.sql.types.IntegerType)
    // a post-widen append stores the wide type physically and the
    // mixed-vintage read is one logical type
    VT.append(spark, t, spark.createDataFrame(Seq((100L, 9L)))
      .toDF("id", "n"))
    val mixed = VT.readLatest(spark, t)
    assert(mixed.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(mixed.count() == 4 && mixed.filter(col("n") === 9L).count() == 1)
    // CDC rides through: the widen version is an empty batch, wide
    assert(VT.readChanges(spark, t, 2L).isEmpty)
    assert(VT.readChanges(spark, t, 2L).schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // CoW materializes the wide type into real parquet
    val vc = VT.optimize(spark, t)
    assert(!manifestBody(t, vc).contains("\"schema\""))
    assert(VT.readLatest(spark, t).schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(VT.readLatest(spark, t).count() == 4)
  }

  test("widen composes mid-chain: positions confine replay (widen era)") {
    // narrow dir -> widen -> APPEND (wide dir) -> rename: the appended
    // dir replays only the rename, never the widen (harmless here, but
    // the position contract must hold for every op kind)
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(1).select(col("id"),
      lit(3).cast("int").as("n")), t)
    VT.widenColumn(spark, t, "n", "BIGINT")
    VT.append(spark, t, spark.createDataFrame(Seq((100L, 8L)))
      .toDF("id", "n"))
    VT.renameColumn(spark, t, "n", "m")
    val got = VT.readLatest(spark, t).select("id", "m").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 100L -> 8L), got.toString)
  }

  test("lazy delete composes with a WIDEN of the predicate's own column") {
    // the recorded predicate binds to the raw (narrow) frames of its
    // scoped dirs even after the very column it filters is widened
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(6).select(col("id"),
      lit(5).cast("int").as("n")), t)
    VT.deleteWhereLazy(spark, t, "n = 5 AND id >= 4") // removes 2 rows
    VT.widenColumn(spark, t, "n", "BIGINT")
    val latest = VT.readLatest(spark, t)
    assert(latest.count() == 4)
    assert(latest.schema("n").dataType ==
      org.apache.spark.sql.types.LongType)
    // a post-widen append is outside the predicate's dir scope: its
    // id>=4 rows are NOT retro-deleted
    VT.append(spark, t, spark.createDataFrame(Seq((100L, 9000000000L)))
      .toDF("id", "n"))
    assert(VT.readLatest(spark, t).count() == 5)
    // CoW materializes deletes and widen together
    VT.optimize(spark, t)
    assert(VT.readLatest(spark, t).count() == 5)
    assert(VT.readLatest(spark, t)
      .filter(col("id") === 100L).head().getLong(1) == 9000000000L)
  }

  test("MERGE INTO an evolved table reads mapped and materializes") {
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(3).select(col("id"),
      lit(1).cast("int").as("n")), t)
    VT.widenColumn(spark, t, "n", "BIGINT")
    VT.renameColumn(spark, t, "n", "m")
    VT.mergeInto(spark, t,
      spark.createDataFrame(Seq((0L, 9000000000L), (10L, 7L)))
        .toDF("id", "m"), key = "id")
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.sorted.toSeq == Seq("id", "m"))
    assert(latest.schema("m").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(latest.count() == 4)
    assert(latest.filter(col("id") === 0L).head()
      .getAs[Long]("m") == 9000000000L)
    val v = VT.latestVersion(spark, t).get
    assert(!manifestBody(t, v).contains("\"schema\""),
      "merge is copy-on-write — it must materialize the chain")
  }

  test("widen guards: narrowing, lossy, same-type, decimal headroom") {
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(3).select(col("id"),
      lit(1.5f).cast("float").as("x"), lit(2).cast("int").as("n"),
      lit(java.math.BigDecimal.valueOf(100, 2)).cast("decimal(10,2)")
        .as("d")), t)
    // narrowing / lossy re-encodings refuse
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "n", "SMALLINT") }       // narrowing
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "n", "STRING") }         // re-encoding
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "id", "DOUBLE") }        // lossy long→dbl
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "d", "DECIMAL(10,4)") }  // headroom shrinks
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "n", "INT") }            // same type
    // value-preserving widenings pass: float→double, decimal headroom
    VT.widenColumn(spark, t, "x", "DOUBLE")
    VT.widenColumn(spark, t, "d", "DECIMAL(20,4)")
    val sch = VT.readLatest(spark, t).schema
    assert(sch("x").dataType == org.apache.spark.sql.types.DoubleType)
    assert(sch("d").dataType ==
      org.apache.spark.sql.types.DecimalType(20, 4))
    assert(VT.readLatest(spark, t)
      .filter(col("d") === lit(new java.math.BigDecimal("1.0000")))
      .count() == 3)
  }

  test("widen guards: session-TZ-dependent casts refuse (date/timestamp)") {
    // DATE→TIMESTAMP and TIMESTAMP↔TIMESTAMP_NTZ pass Cast.canUpCast but
    // replay through spark.sql.session.timeZone — the same stored bytes
    // would read as DIFFERENT values in sessions with different TZs,
    // breaking the chain's bit-preservation promise. The whitelist must
    // route them to a CoW rewrite.
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(3).select(col("id"),
      lit(java.sql.Date.valueOf("2024-03-01")).as("d"),
      lit(java.sql.Timestamp.valueOf("2024-03-01 12:00:00")).as("ts"),
      expr("timestamp_ntz '2024-03-01 12:00:00'").as("tsn")), t)
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "d", "TIMESTAMP") }      // TZ-dependent
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "tsn", "TIMESTAMP") }    // NTZ→instant
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "ts", "TIMESTAMP_NTZ") } // instant→NTZ
  }

  test("nested ALTERs: add/rename/widen/drop inside a struct, per-dir") {
    import org.apache.spark.sql.types._
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(3).select(col("id"),
      struct(col("id").cast("int").as("n"),
        concat(lit("u"), col("id")).as("who")).as("props")), t)
    // ADD with default: existing rows read it; NULL-struct rows stay NULL
    VT.addColumn(spark, t, "props.score", "INT", Some("7"))
    val afterAdd = VT.readLatest(spark, t)
    assert(afterAdd.select(col("props.score")).collect()
      .forall(_.getInt(0) == 7))
    // the add is O(metadata): same dir as v1
    def dir(v: Long) = """"dir":"([^"]+)"""".r
      .findFirstMatchIn(manifestBody(t, v)).get.group(1)
    assert(dir(1L) == dir(2L))
    // WIDEN a nested field in place (position preserved)
    VT.widenColumn(spark, t, "props.n", "BIGINT")
    val widened = VT.readLatest(spark, t).schema("props").dataType
      .asInstanceOf[StructType]
    assert(widened("n").dataType == LongType)
    assert(widened.fieldNames.head == "n", "widen must preserve position")
    // RENAME moves the field to the struct tail (documented withField
    // semantics); values ride untouched
    VT.renameColumn(spark, t, "props.who", "owner")
    val renamed = VT.readLatest(spark, t).schema("props").dataType
      .asInstanceOf[StructType]
    assert(renamed.fieldNames.toSeq == Seq("n", "score", "owner"))
    assert(VT.readLatest(spark, t).where(col("props.owner") === "u1")
      .count() == 1)
    // DROP a nested field; time travel shows each era's struct
    VT.dropColumn(spark, t, "props.score")
    assert(VT.readLatest(spark, t).schema("props").dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("n", "owner"))
    assert(VT.readVersion(spark, t, 2L).schema("props").dataType
      .asInstanceOf[StructType].fieldNames.contains("score"))
    assert(VT.readVersion(spark, t, 1L).schema("props").dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("n", "who"))
    // CoW materializes the whole nested chain (manifest drops "schema")
    val v = VT.updateWhere(spark, t, col("id") === 0L,
      Map("id" -> (col("id") + lit(100L))))
    assert(!manifestBody(t, v).contains("\"schema\""))
    assert(VT.readLatest(spark, t).schema("props").dataType
      .asInstanceOf[StructType].fieldNames.toSeq == Seq("n", "owner"))
  }

  test("nested mid-chain append replays only its op suffix") {
    // add props.a -> APPEND (dir physically has a) -> add props.b: the
    // appended dir must replay ONLY `add b` — a replay of `add a` would
    // be masked by the presence guard here, so assert through VALUES: the
    // appended dir stores a=5 physically; a spurious replay of the add
    // would overwrite it with the default 1
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(2).select(col("id"),
      struct(col("id").cast("int").as("n")).as("props")), t)
    VT.addColumn(spark, t, "props.a", "INT", Some("1"))
    VT.append(spark, t, spark.range(10, 12).select(col("id"),
      struct(col("id").cast("int").as("n"),
        lit(5).cast("int").as("a")).as("props")))
    VT.addColumn(spark, t, "props.b", "INT", Some("2"))
    val rows = VT.readLatest(spark, t).orderBy("id")
      .select(col("id"), col("props.a"), col("props.b")).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((0L, 1, 2), (1L, 1, 2), (10L, 5, 2), (11L, 5, 2)),
      s"got ${rows.toSeq}")
  }

  test("nested ALTER guards: shapes, references, and CDC ride-through") {
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(2).select(col("id"),
      struct(col("id").cast("int").as("n")).as("props"),
      col("id").as("flat")), t)
    // parent must exist and be a struct
    intercept[IllegalArgumentException] {
      VT.addColumn(spark, t, "flat.x", "INT") }
    intercept[IllegalArgumentException] {
      VT.addColumn(spark, t, "nope.x", "INT") }
    // absent leaf / duplicate leaf
    intercept[IllegalArgumentException] {
      VT.dropColumn(spark, t, "props.ghost") }
    intercept[IllegalArgumentException] {
      VT.addColumn(spark, t, "props.n", "INT") }
    // cannot drop a struct's last field
    intercept[IllegalArgumentException] {
      VT.dropColumn(spark, t, "props.n") }
    // lossy nested widen refuses like the top-level one
    intercept[IllegalArgumentException] {
      VT.widenColumn(spark, t, "props.n", "STRING") }
    // a CHECK constraint referencing the nested path blocks rename/drop
    VT.addConstraints(spark, t, Map("pos_n" -> "props.n >= 0"))
    intercept[IllegalArgumentException] {
      VT.renameColumn(spark, t, "props.n", "m") }
    // CDC: a feed-enabled table rides nested ALTERs as skipped (schema)
    // versions — no phantom change batches
    VT.enableChangeFeed(spark, t)
    VT.addColumn(spark, t, "props.extra", "INT", Some("9"))
    assert(VT.mirrorChangeFeed(spark, t).isEmpty,
      "a nested ALTER version must not mirror a change batch")
    // statements drive the nested spellings end-to-end
    GraftSql.sql(spark, s"ALTER TABLE '$t' RENAME COLUMN props.extra TO ex")
    GraftSql.sql(spark, s"ALTER TABLE '$t' DROP COLUMN props.ex")
    assert(VT.readLatest(spark, t).schema("props").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq == Seq("n"))
  }

  test("legacy (marker-less, pos-less) sidecars keep replay-all semantics") {
    // Pre-pinning builds wrote sidecars with NO pos map and NO fmt
    // marker; their readers replayed the FULL chain on every dir. A
    // fmt-2 default (absent dir = chain tip) would silently read such a
    // table UN-evolved — single-dir tables lose their added column
    // without error. The fmt classifier must keep default-0 for them.
    val t = tmp() + "/t"
    freshNation(t)
    val dir = """"dir":"([^"]+)"""".r
      .findFirstMatchIn(manifestBody(t, 1L)).get.group(1)
    // hand-write the legacy artifacts: a marker-less sidecar + a v2
    // manifest referencing it over v1's dir (what an old build left)
    val side = s"schema-${java.util.UUID.randomUUID}.json"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_manifests", side),
      """{"ops":[{"k":"add","n":"tier","t":"INT","d":"7"}],"pos":{}}"""
        .getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(t, "_manifests", "v00000002.json"),
      (s"""{"version":2,"dir":"$dir","ts":${System.currentTimeMillis()},""" +
        s""""schema":"$side","op":"schema","writer":"legacy-test"}""")
        .getBytes("UTF-8"))
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.contains("tier"),
      "legacy sidecar must replay its chain on the (unpinned) base dir")
    assert(latest.filter(col("tier") === 7).count() == latest.count())
    // extending a legacy chain pins the unpinned dirs at 0 (their legacy
    // position) and upgrades the sidecar to fmt 2 — both ops still apply
    VT.renameColumn(spark, t, "tier", "tier2")
    val evolved = VT.readLatest(spark, t)
    assert(evolved.columns.contains("tier2") &&
      !evolved.columns.contains("tier"))
    assert(evolved.filter(col("tier2") === 7).count() == evolved.count())
    // and the pre-extension read is unchanged (time travel to v2)
    assert(VT.readVersion(spark, t, 2L).columns.contains("tier"))
  }

  test("mid-chain append never replays ops it was born after (hammer bug)") {
    // add pp0 -> rename pp0->pp1 -> APPEND (dir physically has pp1) ->
    // rename pp1->pp2: without per-dir chain positions, the appended dir
    // re-fires `add pp0` (it lacks pp0) and grows an extra column — the
    // 8-writer hammer caught this as a union-width mismatch. The recorded
    // position must confine the dir to the ops that postdate it.
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(1).select(col("id"), lit(0L).as("v")), t)
    VT.addColumn(spark, t, "pp0", "INT", Some("0"))
    VT.renameColumn(spark, t, "pp0", "pp1")
    VT.append(spark, t, spark.createDataFrame(Seq((100L, 0L, 42)))
      .toDF("id", "v", "pp1"))
    VT.renameColumn(spark, t, "pp1", "pp2")
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.sorted.toSeq == Seq("id", "pp2", "v"),
      latest.columns.mkString(","))
    // and the appended row's REAL value survived (not a replayed default)
    assert(latest.filter(col("id") === 100L).head().getAs[Int]("pp2") == 42)
    assert(latest.filter(col("id") === 0L).head().getAs[Int]("pp2") == 0)
  }

  test("drop-then-re-add with a mid-chain append keeps real values") {
    // add c -> APPEND (c=99 stored) -> drop c -> add c default 2 ->
    // APPEND (c=7 stored): the first appended dir's c was dropped by the
    // LATER drop (correct — the drop postdates it); the second appended
    // dir must keep its stored 7 (a positionless replay would re-fire
    // the drop and overwrite it with the re-add's default)
    val t = tmp() + "/t"
    VT.commit(spark, spark.range(1).select(col("id"), lit(0L).as("v")), t)
    VT.addColumn(spark, t, "c", "INT", Some("1"))
    VT.append(spark, t, spark.createDataFrame(Seq((100L, 0L, 99)))
      .toDF("id", "v", "c"))
    VT.dropColumn(spark, t, "c")
    VT.addColumn(spark, t, "c", "INT", Some("2"))
    VT.append(spark, t, spark.createDataFrame(Seq((200L, 0L, 7)))
      .toDF("id", "v", "c"))
    val got = VT.readLatest(spark, t).select("id", "c").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(0L -> 2, 100L -> 2, 200L -> 7), got.toString)
  }

  test("rollup refresh rides incrementally through an unrelated ALTER") {
    // merge -> ALTER ADD COLUMN (not a rollup column) -> merge: the
    // schema version is a zero-row EMPTY delta, so the refresh must stay
    // on the incremental path (target commits op "merge", never the
    // wholesale "rollup") and still equal the from-scratch aggregate
    val base = tmp() + "/base"
    val roll = tmp() + "/roll"
    VT.commit(spark, spark.createDataFrame(
      Seq((1L, 10L, 5.0), (2L, 10L, 7.0), (3L, 20L, 1.0)))
      .toDF("id", "grp", "x"), base)
    VT.refreshRollup(spark, base, roll, keys = Seq("grp"),
      sumCols = Seq("x"))
    VT.mergeInto(spark, base, spark.createDataFrame(Seq((4L, 20L, 2.0)))
      .toDF("id", "grp", "x"), key = "id")
    VT.addColumn(spark, base, "note", "STRING")
    VT.mergeInto(spark, base,
      spark.createDataFrame(Seq((5L, 30L, 9.0, "n")))
        .toDF("id", "grp", "x", "note"), key = "id")
    VT.refreshRollup(spark, base, roll, keys = Seq("grp"),
      sumCols = Seq("x"))
    val ops = VT.history(spark, roll).select("op").collect()
      .map(_.getString(0)).toSeq
    assert(ops.count(_ == "rollup") == 1 && ops.contains("merge"),
      s"refresh fell back to wholesale recompute: $ops")
    val got = VT.readLatest(spark, roll).select("grp", "n", "sum_x")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == Set((10L, 2L, 12.0), (20L, 2L, 3.0), (30L, 1L, 9.0)),
      got.toString)
    // but an ALTER that RENAMES a rollup column forces (and survives)
    // the wholesale path under the new name
    VT.renameColumn(spark, base, "x", "y")
    VT.refreshRollup(spark, base, roll, keys = Seq("grp"),
      sumCols = Seq("y"))
    val afterOps = VT.history(spark, roll).select("op").collect()
      .map(_.getString(0)).toSeq
    assert(afterOps.count(_ == "rollup") == 2,
      s"rename of a summed column must force the wholesale path: $afterOps")
    assert(VT.readLatest(spark, roll).columns.contains("sum_y"))
  }

  test("a compaction-retired manifest slot is never reclaimable") {
    // the hammer-caught lost update: a writer reads base v4, spends
    // "seconds" writing its snapshot, and publishes at v5 AFTER a
    // compaction folded v5 into the checkpoint and deleted its manifest
    // file — the bare put-if-absent would win the retired slot and the
    // commit would vanish into history (the surviving chain derives from
    // the slot's original owner). The folded-horizon guard must turn
    // that claim into a conflict and leave the original binding intact.
    val t = tmp() + "/t"
    (1 to 8).foreach { i =>
      VT.commit(spark, spark.range(1)
        .select(lit(i.toLong).as("writer"), lit(0L).as("commits")), t)
    }
    VT.compactManifests(spark, t, keepRecent = 2) // retires manifests <= v6
    intercept[VT.CommitConflictException] {
      VT.publish(spark, t, 5L, "data/bogus-recycled-claim")
    }
    assert(VT.versions(spark, t) == (1L to 8L))
    assert(VT.readVersion(spark, t, 5L)
      .where(col("writer") === 5L).count() == 1,
      "the retired slot's original binding must survive the stale claim")
  }

  test("SQL spellings drive all four ALTERs; history shows the op") {
    val t = tmp() + "/t"
    freshNation(t)
    GraftSql.sql(spark, s"ALTER TABLE '$t' ADD COLUMN score DOUBLE DEFAULT 0.5")
    GraftSql.sql(spark, s"ALTER TABLE '$t' RENAME COLUMN n_name TO nation_name")
    GraftSql.sql(spark, s"ALTER TABLE '$t' DROP COLUMN n_regionkey")
    GraftSql.sql(spark, s"ALTER TABLE '$t' ALTER COLUMN n_nationkey TYPE BIGINT")
    val latest = VT.readLatest(spark, t)
    assert(latest.columns.sorted.toSeq ==
      Seq("n_nationkey", "nation_name", "score"))
    assert(latest.schema("n_nationkey").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(latest.filter(col("score") === 0.5).count() == 25)
    val ops = VT.history(spark, t).select("op")
      .collect().map(_.getString(0)).toSeq
    assert(ops.count(_ == "schema") == 4, ops.toString)
  }

  test("ADD COLUMN statement parses nested and multi-word DDL types") {
    // the type is validated by DataType.fromDDL, not the statement
    // grammar — MAP<STRING,ARRAY<INT>> (inner '>'s) and a bad type must
    // both surface as GRAFT errors, never fall through to spark.sql
    val t = tmp() + "/t"
    freshNation(t)
    GraftSql.sql(spark,
      s"ALTER TABLE '$t' ADD COLUMN tags MAP<STRING,ARRAY<INT>>")
    val latest = VT.readLatest(spark, t)
    assert(latest.schema("tags").dataType ==
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.IntegerType)))
    // a garbage type errors out of addColumn (fromDDL), not spark.sql
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      GraftSql.sql(spark, s"ALTER TABLE '$t' ADD COLUMN bad NOTATYPE")
    }
  }
}
