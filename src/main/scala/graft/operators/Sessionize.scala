package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Gap-based sessionization: group each user's event stream into sessions
  * separated by more than `gapMinutes` of inactivity — the classic
  * clickstream/behavior-analytics operator (and the batch twin of Structured
  * Streaming's session windows).
  *
  * Shape: ONE shuffle, on user_id. Both windows (the lag that detects gaps
  * and the running sum that numbers sessions) share the same
  * `partitionBy(user_id) orderBy ts` spec, so Catalyst plans a single
  * exchange + sort and evaluates both functions in one Window operator. The
  * per-session rollup then partial-aggregates map-side on (user_id,
  * session_seq) riding the SAME partitioning — no second exchange. At 100 TB
  * this is the minimal-movement plan: everything after the one shuffle is
  * partition-local.
  */
object Sessionize {
  type Q = (SparkSession, String) => DataFrame

  /** Events tagged with a per-user `session_seq` (1-based, in time order).
    * Ties in `ts` break by event_id so numbering is total and deterministic.
    */
  def tagSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    // gap compares at µs precision in BOTH engines (Spark unix_timestamp
    // truncates to seconds; DuckDB epoch() keeps fractions — either mix
    // misclassifies gaps within a second of the threshold)
    val isNew = when(prevTs.isNull, 1L)
      .when(unix_micros(col("ts")) - unix_micros(prevTs) > gapMinutes * 60L * 1000000L, 1L)
      .otherwise(0L)
    events.withColumn("session_seq", sum(isNew).over(
      Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
  }

  /** Per-session rollup: bounds, event count, value sum, distinct types. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    tagSessions(events, gapMinutes)
      .groupBy("user_id", "session_seq")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("value_sum"),
        countDistinct(col("event_type")).as("n_event_types"))

  /** Time-series gap filling (the generate_series / resample family): each
    * user's daily event rollup densified onto that user's own
    * [min_day, max_day] calendar — missing days appear with zero counts so
    * downstream trend/window math sees a regular grid.
    *
    * Shape: the daily rollup is one shuffle on (user_id, day) with
    * map-side partials; the calendar comes from a per-user `sequence`
    * explode over the span row (never a driver-side calendar), and the
    * fill join keys on (user_id, day). At 100 TB grid rows are
    * users × span-days — dwarfed by the events they summarize.
    */
  def gapFillDaily(events: DataFrame): DataFrame = {
    import graft.queries.Fmt
    val daily = events
      .groupBy(col("user_id"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"),
        Fmt.dec(sum(Fmt.dec(col("value")))).as("vs"))
    val grid = daily.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        Fmt.dbl(coalesce(col("vs"), lit(0))).as("value_sum"))
  }

  val queries: Map[String, Q] = Map(
    // Daily gap-fill for a bounded user slice (DuckDB replays the calendar)
    "ts_gap_fill" -> ((s, dir) =>
      gapFillDaily(Tables.events(s, dir).filter(col("user_id") < 8))
        .orderBy("user_id", "day")),

    // Session rollup for a bounded user slice — bounds, sizes, checksums
    "sessionize_stats" -> ((s, dir) =>
      sessionStats(Tables.events(s, dir).filter(col("user_id") < 40), gapMinutes = 30)
        .orderBy("user_id", "session_seq")),

    // Corpus-level session profile: one row the driver can eyeball
    "sessionize_profile" -> ((s, dir) =>
      sessionStats(Tables.events(s, dir), gapMinutes = 30)
        .agg(
          count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"))
  ))

  // DuckDB twin: identical lag/gap/cumsum construction. Session numbering is
  // integer arithmetic on identical event orderings (ties broken by
  // event_id), so the comparison is exact; value_sum rounds to 4 on an
  // ordering-independent SUM of doubles at bounded magnitude.
  private val tagged =
    raw"""WITH ordered AS (
           SELECT user_id, event_id, ts, event_type, value,
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         flagged AS (
           SELECT *, CASE WHEN prev_ts IS NULL THEN 1
                          WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
                          ELSE 0 END AS is_new
           FROM ordered),
         tagged AS (
           SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS BIGINT) AS session_seq
           FROM flagged)"""

  val oracle: Map[String, String] = Map(
    "ts_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                  COUNT(*) AS n_events,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS vs
           FROM events WHERE user_id < 8 GROUP BY 1, 2),
         span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                  FROM daily GROUP BY 1),
         grid AS (SELECT user_id,
                    CAST(UNNEST(generate_series(CAST(d0 AS TIMESTAMP),
                      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
                  FROM span)
         SELECT g.user_id, g.day,
                COALESCE(d.n_events, 0) AS n_events,
                CAST(COALESCE(d.vs, 0) AS DOUBLE) AS value_sum
         FROM grid g LEFT JOIN daily d
           ON g.user_id = d.user_id AND g.day = d.day
         ORDER BY g.user_id, g.day""",
    "sessionize_stats" -> (tagged +
      """
         SELECT user_id, session_seq,
                MIN(ts) AS session_start, MAX(ts) AS session_end,
                COUNT(*) AS n_events,
                round(SUM(value), 4) AS value_sum,
                COUNT(DISTINCT event_type) AS n_event_types
         FROM tagged WHERE user_id < 40
         GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq"""),
    "sessionize_profile" -> (tagged +
      """
         , stats AS (
           SELECT user_id, session_seq, COUNT(*) AS n_events
           FROM tagged GROUP BY user_id, session_seq)
         SELECT COUNT(*) AS n_sessions,
                COUNT(DISTINCT user_id) AS n_users,
                CAST(SUM(n_events) AS BIGINT) AS n_events,
                MAX(n_events) AS max_session_events
         FROM stats""")
  )
}
