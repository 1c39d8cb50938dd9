package graft

import java.sql.Timestamp
import graft.streaming.{StockFlow, Streams, UserEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Session windows, custom flatMapGroupsWithState, and file-source
  * streaming — the rest of the streaming surface beyond Q38/Q39.
  */
case class Ev(event_id: Long, user_id: Long, ts: Timestamp, value: Double)

class StatefulSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("streaming session_window closes sessions at the 30-min gap") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = Streams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sess_golden")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 40-min gap
      // (second session); advance watermark far to close everything
      input.addData(Ev(1, 1, ts(0), 1.0), Ev(2, 1, ts(10), 2.0),
        Ev(3, 1, ts(50), 4.0))
      query.processAllAvailable()
      input.addData(Ev(4, 2, ts(600), 8.0))
      query.processAllAvailable()
      val rows = spark.table("sess_golden")
        .select(col("user_id"), col("sess_start"), col("n_events"),
          col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
          r.getLong(2), r.getDouble(3))).sortBy(t => (t._1, t._2))
      assert(rows.contains((1L, "2024-01-01 00:00:00.0", 2L, 3.0)),
        s"first session wrong: ${rows.mkString(", ")}")
      assert(rows.contains((1L, "2024-01-01 00:50:00.0", 1L, 4.0)),
        s"second session wrong: ${rows.mkString(", ")}")
    } finally query.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val query = Streams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("totals_golden")
      .outputMode("append").start()
    try {
      input.addData(UserEvent(1, 7, ts(0), 1.0), UserEvent(2, 7, ts(1), 2.0))
      query.processAllAvailable()
      input.addData(UserEvent(3, 7, ts(2), 4.0), UserEvent(4, 9, ts(3), 8.0))
      query.processAllAvailable()
      val rows = spark.table("totals_golden")
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      // user 7 emits (1,1.0),(2,3.0) in batch 1 and (3,7.0) in batch 2 —
      // state carried across batches; user 9 starts fresh
      assert(rows == Set((7L, 1L, 1.0), (7L, 2L, 3.0), (7L, 3L, 7.0),
        (9L, 1L, 8.0)), s"got: $rows")
    } finally query.stop()
  }

  test("streaming TTL dedup anchors on kept events across micro-batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    // ttl = 30 min
    val query = Streams.ttlDedupEvents(input.toDS(), 1800L)
      .writeStream.format("memory").queryName("ttl_golden")
      .outputMode("append").start()
    try {
      // batch 1: minute 0 kept; minute 10 within ttl of 0 -> dropped
      input.addData(UserEvent(1, 7, ts(0), 0.0), UserEvent(2, 7, ts(10), 0.0))
      query.processAllAvailable()
      // batch 2: minute 20 still within ttl of the BATCH-1 anchor ->
      // dropped (state carried); minute 40 kept; minute 55 within ttl of
      // 40 -> dropped; other user unaffected
      input.addData(UserEvent(3, 7, ts(20), 0.0), UserEvent(4, 7, ts(40), 0.0),
        UserEvent(5, 7, ts(55), 0.0), UserEvent(6, 9, ts(21), 0.0))
      query.processAllAvailable()
      val kept = spark.table("ttl_golden")
        .collect().map(_.getAs[Long]("event_id")).toSet
      assert(kept == Set(1L, 4L, 6L), s"got: $kept")
    } finally query.stop()
  }

  test("transformWithState keeps composite per-user state across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // transformWithState requires the RocksDB state store; scope the
    // provider to this query and restore the session default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserEvent]
      val query = Streams.userSnapshots(input.toDS(), recentN = 3)
        .writeStream.format("memory").queryName("tws_golden")
        .outputMode("append").start()
      try {
        input.addData(UserEvent(1, 7, ts(0), 1.0), UserEvent(2, 7, ts(1), 2.0))
        query.processAllAvailable()
        input.addData(UserEvent(3, 7, ts(2), 4.0), UserEvent(5, 7, ts(4), 16.0),
          UserEvent(4, 9, ts(3), 8.0))
        query.processAllAvailable()
        val rows = spark.table("tws_golden")
          .collect().map(r => (r.getAs[Long]("user_id"),
            r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"),
            r.getAs[String]("recent_ids"))).toSet
        // user 7: ValueState total carries across batches; ListState keeps
        // only the last 3 ids (1 falls off in batch 2); user 9 starts fresh
        assert(rows == Set(
          (7L, 2L, 3.0, "1,2"),
          (7L, 4L, 23.0, "2,3,5"),
          (9L, 1L, 8.0, "4")), s"got: $rows")
      } finally query.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("velocityFlags rate rule counts the trailing window across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[UserEvent]
      // window = 10 min, limit = 3 — mirrors the batch q124_velocity rule
      val query = Streams.velocityFlags(input.toDS(), 600L, 3)
        .writeStream.format("memory").queryName("vel_golden")
        .outputMode("append").start()
      try {
        // batch 1: user 7 fires at minutes 0,2,4,6 — counts 1..4, the
        // 4th breaches limit=3
        input.addData(UserEvent(1, 7, ts(0), 0.0), UserEvent(2, 7, ts(2), 0.0),
          UserEvent(3, 7, ts(4), 0.0), UserEvent(4, 7, ts(6), 0.0))
        query.processAllAvailable()
        // batch 2: minute 11 still sees 2,4,6 in its trailing 10 min
        // (state carried) -> n=4 flagged; user 9 starts fresh
        input.addData(UserEvent(5, 7, ts(11), 0.0),
          UserEvent(6, 9, ts(11), 0.0))
        query.processAllAvailable()
        // batch 3: a LATE event at minute 5 counts only [min -5, min 5]
        // = {2, 4, itself} -> n=3 unflagged (epochs LATER than the event
        // — 6, 11 — must not count: the batch RANGE frame ends at
        // CURRENT ROW); then minute 25 trims state to itself -> n=1
        input.addData(UserEvent(7, 7, ts(5), 0.0),
          UserEvent(8, 7, ts(25), 0.0))
        query.processAllAvailable()
        val rows = spark.table("vel_golden")
          .collect().map(r => (r.getAs[Long]("event_id"),
            r.getAs[Long]("n_win"), r.getAs[Int]("flagged"))).toSet
        assert(rows == Set((1L, 1L, 0), (2L, 2L, 0), (3L, 3L, 0),
          (4L, 4L, 1), (5L, 4L, 1), (6L, 1L, 0), (7L, 3L, 0),
          (8L, 1L, 0)), s"got: $rows")
      } finally query.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("clampedInventory floors at zero and carries on_hand across batches") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    def day(d: Int): java.sql.Date = java.sql.Date.valueOf(f"2024-01-$d%02d")
    val input = MemoryStream[StockFlow]
    val query = Streams.clampedInventory(input.toDS())
      .writeStream.format("memory").queryName("clamp_golden")
      .outputMode("append").start()
    try {
      // part 5: +10 -> 10; -15 clamps to 0 (5 units of demand lost, not
      // borrowed); +3 -> 3
      input.addData(StockFlow(5, day(1), 10L), StockFlow(5, day(2), -15L),
        StockFlow(5, day(3), 3L))
      query.processAllAvailable()
      // batch 2: the carried on_hand=3 absorbs -1 -> 2; a fresh part
      // starting with demand clamps immediately
      input.addData(StockFlow(5, day(4), -1L), StockFlow(6, day(1), -7L))
      query.processAllAvailable()
      val rows = spark.table("clamp_golden")
        .collect().map(r => (r.getAs[Long]("part"),
          r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("on_hand")))
        .toSet
      assert(rows == Set((5L, "2024-01-01", 10L), (5L, "2024-01-02", 0L),
        (5L, "2024-01-03", 3L), (5L, "2024-01-04", 2L),
        (6L, "2024-01-01", 0L)), s"got: $rows")
      // agreement with the batch dual's prefix identity on the same flows:
      // S_t - min(0, min S_i) over part 5 = 10, -5->0, 3, 2 — identical
    } finally query.stop()
  }

  test("foreachBatch sink commits batches idempotently") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fbsink").toString
    val input = MemoryStream[Ev]
    val query = Streams.startIdempotentParquetSink(
      input.toDF(), dir, "fb_golden")
    try {
      input.addData(Ev(1, 1, ts(0), 1.0), Ev(2, 1, ts(1), 2.0))
      query.processAllAvailable()
      input.addData(Ev(3, 2, ts(2), 4.0))
      query.processAllAvailable()
      assert(spark.read.parquet(dir).count() == 3)
      // replay batch 0 through the SINK'S commit path (failure recovery):
      // it must overwrite, never duplicate
      Streams.commitBatch(dir)(
        Seq(Ev(1, 1, ts(0), 1.0), Ev(2, 1, ts(1), 2.0)).toDF(), 0L)
      val replayed = spark.read.parquet(dir)
      assert(replayed.count() == 3)
      assert(replayed.select("event_id").collect().map(_.getLong(0)).sorted
        .toSeq == Seq(1L, 2L, 3L))
    } finally query.stop()
  }

  test("file source streams the fixture events through the watermarked aggregate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("filestream").toString
    // stage a small slice of the fixture as the incoming file drop
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("ts"), col("value")).limit(200)
    ev.write.mode("overwrite").parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(ev.schema)
      .parquet(s"$dir/in")
    val query = Streams.hourlyCounts(stream)
      .writeStream.format("memory").queryName("file_golden")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // append mode emits only watermark-closed windows; the batch dual
      // computed on the same rows bounds them from above
      val streamed = spark.table("file_golden").count()
      val batch = ev.groupBy(window(col("ts"), "1 hour")).count().count()
      assert(streamed <= batch)
      assert(query.lastProgress.sources.nonEmpty)
    } finally query.stop()
  }
}
