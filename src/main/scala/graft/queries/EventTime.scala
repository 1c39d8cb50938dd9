package graft.queries

import graft.{Exact, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windows as batch queries (SURVEY.md §2B Q35–Q38; the
  * streaming duals Q38–Q39 are engine-verified as MemoryStream golden
  * tests in StreamingSpec).
  *
  * Scale notes:
  *  - Tumbling/sliding windows are plain hash aggregates on the bucketed
  *    timestamp — partial aggregation applies; a sliding window emits
  *    (window/slide) rows per event before the partial agg, constant here.
  *  - Sessionization partitions by user_id: one shuffle, per-user ordered
  *    scan — no global sort except the declared final ORDER BY.
  *  - The q38 batch dual keeps the streaming watermark definition but over
  *    a single global arrival order (event_id) — correct but serial; the
  *    production path is the streaming query (per-partition watermarks),
  *    the batch dual exists for cross-engine verification.
  */
object EventTime {

  val qs: Seq[Q] = Seq(
    // Q35 — tumbling 1h event-time window.
    Q("q35_tumbling",
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("win_start"), col("n_events"),
            col("sum_value"))
          .orderBy(col("win_start"))
      },
      Some(s"""SELECT date_trunc('hour', ts) AS win_start,
              |  count(*) AS n_events, ${Exact.sqlSum("value")} AS sum_value
              |FROM events GROUP BY win_start
              |ORDER BY win_start""".stripMargin)),

    // Q36 — 1h window sliding every 30min (each event lands in 2 windows).
    Q("q36_sliding",
      (s, d) => {
        Tables(s, d, "events")
          .groupBy(window(col("ts"), "1 hour", "30 minutes"))
          .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("win_start"), col("n_events"),
            col("sum_value"))
          .orderBy(col("win_start"))
      },
      Some(s"""SELECT win_start, count(*) AS n_events,
              |  ${Exact.sqlSum("value")} AS sum_value
              |FROM (
              |  SELECT value, unnest([bucket, bucket - INTERVAL 30 MINUTE])
              |    AS win_start
              |  FROM (SELECT value,
              |          make_timestamp(epoch_us(ts) -
              |            (epoch_us(ts) % 1800000000)) AS bucket
              |        FROM events))
              |GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // Q37 — sessionization, 30-min inactivity gap per user
    // (gaps-and-islands: lag + running count of session starts).
    Q("q37_session",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
              .otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(byUser))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
            count(lit(1)).as("n_events"),
            Exact.dsum(col("value")).as("sum_value"))
          .select(col("user_id"), col("sess_start"), col("sess_end"),
            col("n_events"), col("sum_value"))
          .orderBy(col("user_id"), col("sess_start"))
      },
      Some(s"""SELECT user_id, min(ts) AS sess_start, max(ts) AS sess_end,
              |  count(*) AS n_events, ${Exact.sqlSum("value")} AS sum_value
              |FROM (
              |  SELECT user_id, ts, value,
              |    SUM(new_sess) OVER (PARTITION BY user_id
              |      ORDER BY ts, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS sess_id
              |  FROM (
              |    SELECT user_id, ts, event_id, value,
              |      CASE WHEN prev_us IS NULL
              |             OR epoch_us(ts) - prev_us > 1800000000
              |           THEN 1 ELSE 0 END AS new_sess
              |    FROM (
              |      SELECT user_id, ts, event_id, value,
              |        lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
              |          ORDER BY ts, event_id) AS prev_us
              |      FROM events)))
              |GROUP BY user_id, sess_id
              |ORDER BY user_id, sess_start""".stripMargin)),

    // Q38 — watermark/late-data semantics, deterministic batch dual:
    // arrival order = event_id; a row is late (dropped) if its event time
    // is >10min behind the max event time seen strictly before it. The
    // running max is Graft.prefixMaxExclusive — the two-level chunked
    // prefix scan — NOT a bare Window.orderBy(event_id), which would move
    // the whole table through one task (the production path remains the
    // streaming query with real per-partition watermarks, Streams.scala).
    Q("q38_late_data",
      (s, d) => {
        graft.api.Graft.prefixMaxExclusive(Tables(s, d, "events"),
            order = col("event_id"), value = unix_micros(col("ts")),
            out = "wm_us")
          .filter(col("wm_us").isNull ||
            unix_micros(col("ts")) >= col("wm_us") - 600L * 1000000L)
          .groupBy(window(col("ts"), "1 hour"))
          .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("sum_value"))
          .select(col("window.start").as("win_start"), col("n_events"),
            col("sum_value"))
          .orderBy(col("win_start"))
      },
      Some(s"""SELECT date_trunc('hour', ts) AS win_start,
              |  count(*) AS n_events, ${Exact.sqlSum("value")} AS sum_value
              |FROM (
              |  SELECT ts, value,
              |    max(epoch_us(ts)) OVER (ORDER BY event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              |      AS wm_us
              |  FROM events)
              |WHERE wm_us IS NULL OR epoch_us(ts) >= wm_us - 600000000
              |GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // Q49c — cohort retention: users grouped by first-seen week, activity
    // counted per weeks-since-cohort — the standard retention matrix.
    // Two keyed aggregations plus one equi-join on user_id; the
    // first-seen table is user-sized (small relative to events) and
    // AQE-broadcastable; at corpus scale it shuffles keyed, both sides
    // co-partitioned on user_id.
    Q("q49_cohort",
      (s, d) => {
        val ev = Tables(s, d, "events").select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("wk"))
        val first = ev.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cohort"))
        ev.join(first, Seq("user_id"))
          .groupBy(col("cohort"),
            floor(datediff(col("wk"), col("cohort")) / lit(7.0)).cast("int")
              .as("week_n"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort"), col("week_n"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
             |  FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY user_id)
             |SELECT cohort,
             |  CAST(floor(datediff('day', cohort, wk) / 7.0) AS INT) AS week_n,
             |  count(DISTINCT user_id) AS n_users
             |FROM ev JOIN f USING (user_id)
             |GROUP BY cohort, week_n ORDER BY cohort, week_n""".stripMargin)),

    // Q50 — hourly resample + forward fill (Graft.resampleFfill): complete
    // per-user hour spine over the data's range, per-slot exact average,
    // gaps forward-filled with the two-window trick (running non-null
    // count -> fill groups -> per-group max). Both windows are partitioned
    // by user — no single-task global window. Oracle replays the identical
    // slot arithmetic and fill groups.
    Q("q50_resample",
      (s, d) => {
        graft.api.Graft.resampleFfill(Tables(s, d, "events"),
            key = col("user_id"), time = col("ts"), value = col("value"),
            stepSeconds = 3600)
          .select(col("key").as("user_id"),
            timestamp_seconds(col("slot") * 3600).as("slot_ts"),
            col("n_events"), col("v_avg"), col("v_ffill"))
          .orderBy(col("user_id"), col("slot_ts"))
      },
      Some(s"""WITH sl AS (
              |  SELECT user_id AS key,
              |    CAST(floor((epoch_us(ts) // 1000000) / 3600.0) AS BIGINT)
              |      AS slot,
              |    value AS v
              |  FROM events),
              |agg AS (
              |  SELECT key, slot, count(*) AS n_events,
              |    ${Exact.sqlAvg("v")} AS v_avg
              |  FROM sl GROUP BY key, slot),
              |b AS (SELECT min(slot) AS lo, max(slot) AS hi FROM sl),
              |keys AS (SELECT DISTINCT key FROM sl),
              |spine AS (
              |  SELECT key, unnest(range(b.lo, b.hi + 1)) AS slot
              |  FROM keys CROSS JOIN b),
              |j AS (
              |  SELECT s.key, s.slot, COALESCE(a.n_events, 0) AS n_events,
              |    a.v_avg
              |  FROM spine s LEFT JOIN agg a ON s.key = a.key AND s.slot = a.slot),
              |g AS (
              |  SELECT *, count(v_avg) OVER (PARTITION BY key ORDER BY slot
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              |  FROM j)
              |SELECT key AS user_id, make_timestamp(slot * 3600 * 1000000)
              |    AS slot_ts,
              |  n_events, v_avg,
              |  max(v_avg) OVER (PARTITION BY key, grp) AS v_ffill
              |FROM g ORDER BY user_id, slot_ts""".stripMargin))
  )
}
