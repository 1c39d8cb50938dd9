package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Multi-writer concurrency hammer for the versioned-table commit
  * protocol — the runnable artifact behind the optimistic-concurrency
  * claims (the spec-sized version lives in SinksSpec; this one runs a
  * larger mixed-verb brawl and records the evidence).
  *
  * Shape: N merge writers each upsert THEIR OWN key `perWriter` times
  * (read-modify-write against latest, so any lost update shows up as a
  * final count below `perWriter`); one DML writer bumps a dedicated row
  * through copy-on-write `updateWhere`; one append writer drip-inserts
  * fresh rows through O(new-data) `append`; one maintenance thread loops
  * `optimize` + `compactManifests` + `vacuum` against the churn. Every
  * verb retries on [[VersionedTable.CommitConflictException]] — the
  * protocol's contract is "conflict, retry", never "silently lose".
  *
  * Invariants checked after the brawl (exit non-zero on any failure):
  *  - the version chain is GAP-FREE 1..latest: every successful verb
  *    claimed exactly one version, no manifest was overwritten or lost;
  *  - zero lost updates: each merge writer's final count == perWriter,
  *    the DML row's count == its successful updates, the appended row
  *    count == successful appends;
  *  - every version still resolves and reads after compaction + vacuum
  *    ran concurrently with the writers;
  *  - conflicts were actually OBSERVED (a race that never collided
  *    would prove nothing).
  *
  * Usage (writes HAMMER.json):
  * {{{
  *   sbt -batch "set fork := true" "runMain graft.Hammer"
  * }}}
  */
object Hammer {

  def main(args: Array[String]): Unit = {
    val writers = sys.env.getOrElse("SPARK_GRAFT_HAMMER_WRITERS", "12").toInt
    val perWriter = sys.env.getOrElse("SPARK_GRAFT_HAMMER_COMMITS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val t = java.nio.file.Files.createTempDirectory("graft-hammer")
      .toString + "/table"
    val DmlKey = -999L
    VersionedTable.commit(spark,
      Seq((DmlKey, 0L)).toDF("writer", "commits"), t)

    val conflicts = new AtomicLong(0)
    val updates = new AtomicLong(0)
    val appends = new AtomicLong(0)
    val optimizes = new AtomicLong(0)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stopMaint = new java.util.concurrent.atomic.AtomicBoolean(false)

    def guarded(body: => Unit): Unit =
      try body catch { case e: Throwable => failures.add(e) }

    val mergeThreads = (0 until writers).map { w =>
      new Thread(() => guarded {
        var done = 0
        while (done < perWriter && failures.isEmpty) {
          val mine = VersionedTable.readLatest(spark, t)
            .where(col("writer") === w.toLong).collect()
          val cur = if (mine.isEmpty) 0L else mine.head.getLong(1)
          try {
            VersionedTable.mergeInto(spark, t,
              Seq((w.toLong, cur + 1L)).toDF("writer", "commits"),
              key = "writer")
            done += 1
          } catch {
            case _: VersionedTable.CommitConflictException =>
              conflicts.incrementAndGet()
          }
        }
      }, s"merge-$w")
    }
    val dmlThread = new Thread(() => guarded {
      var done = 0
      while (done < perWriter && failures.isEmpty) {
        try {
          VersionedTable.updateWhere(spark, t, col("writer") === DmlKey,
            Map("commits" -> (col("commits") + lit(1L))))
          done += 1; updates.incrementAndGet()
        } catch {
          case _: VersionedTable.CommitConflictException =>
            conflicts.incrementAndGet()
        }
      }
    }, "dml")
    val appendThread = new Thread(() => guarded {
      var done = 0
      while (done < perWriter && failures.isEmpty) {
        try {
          VersionedTable.append(spark, t,
            Seq((1000L + appends.get(), 0L)).toDF("writer", "commits"))
          done += 1; appends.incrementAndGet()
        } catch {
          case _: VersionedTable.CommitConflictException =>
            conflicts.incrementAndGet()
        }
      }
    }, "append")
    val maintThread = new Thread(() => guarded {
      while (!stopMaint.get() && failures.isEmpty) {
        try {
          VersionedTable.optimize(spark, t, targetFileBytes = 1L << 30)
          optimizes.incrementAndGet()
        } catch {
          case _: VersionedTable.CommitConflictException =>
            conflicts.incrementAndGet()
        }
        VersionedTable.compactManifests(spark, t, keepRecent = 4)
        // generous grace: losers' orphans reclaim, in-flight writers safe
        VersionedTable.vacuum(spark, t, graceMs = 3600L * 1000L)
      }
    }, "maintenance")

    val t0 = System.nanoTime()
    val all = mergeThreads ++ Seq(dmlThread, appendThread)
    all.foreach(_.start()); maintThread.start()
    all.foreach(_.join(600000))
    stopMaint.set(true); maintThread.join(600000)
    val wallS = (System.nanoTime() - t0) / 1e9

    var failed = failures.size()
    failures.forEach(e => System.err.println(s"[hammer] writer died: $e"))
    def check(name: String, ok: Boolean, detail: => String): Unit =
      if (!ok) { failed += 1; System.err.println(s"[hammer] FAIL $name: $detail") }

    val vs = VersionedTable.versions(spark, t)
    val expectVersions =
      1L + writers * perWriter + updates.get() + appends.get() + optimizes.get()
    check("gap-free chain", vs == (1L to vs.last) && vs.last == expectVersions,
      s"versions=$vs expected 1..$expectVersions")
    val finalRows = VersionedTable.readLatest(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    check("no lost merge updates",
      (0 until writers).forall(w => finalRows.get(w.toLong)
        .contains(perWriter.toLong)),
      s"final=$finalRows")
    check("no lost DML updates",
      finalRows.get(DmlKey).contains(updates.get()), s"final=$finalRows")
    check("no lost appends",
      finalRows.keys.count(_ >= 1000L) == appends.get(), s"final=$finalRows")
    check("every version reads post-compaction",
      vs.forall(v => VersionedTable.readVersion(spark, t, v).count() >= 1L),
      "a compacted/vacuumed version failed to resolve")
    check("races actually collided", conflicts.get() > 0,
      "zero conflicts observed — raise writers/commits")

    val lost = (0 until writers).count(w =>
      !finalRows.get(w.toLong).contains(perWriter.toLong)) +
      (if (finalRows.get(DmlKey).contains(updates.get())) 0 else 1)
    val json = s"""{"writers":$writers,"per_writer":$perWriter,""" +
      s""""merges":${writers * perWriter},"dml_updates":${updates.get()},""" +
      s""""appends":${appends.get()},"optimizes":${optimizes.get()},""" +
      s""""conflicts":${conflicts.get()},"versions":${vs.last},""" +
      s""""lost_updates":$lost,"failures":$failed,""" +
      f""""wall_s":$wallS%.1f}"""
    println(s"[hammer] $json")
    java.nio.file.Files.write(java.nio.file.Paths.get("HAMMER.json"),
      json.getBytes("UTF-8"))
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
