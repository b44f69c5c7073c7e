package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gap-based sessionization: numbering semantics on hand-built streams and
  * the one-shuffle plan shape.
  */
class SessionizeSpec extends SparkSpec {

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-03-01 10:$minute%02d:00")

  private def events = {
    import spark.implicits._
    Seq(
      // user 1: two sessions split by a 45-minute gap (31+ breaks at gap=30)
      (1L, 100L, ts(0), "click", 1.0),
      (1L, 101L, ts(10), "view", 2.0),
      (1L, 102L, ts(55), "click", 4.0),
      // user 2: one session, gaps exactly AT the threshold stay together
      (2L, 200L, ts(0), "click", 1.0),
      (2L, 201L, ts(30), "view", 1.0),
      // user 3: single event
      (3L, 300L, ts(5), "purchase", 9.0)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
  }

  test("gap strictly greater than the threshold starts a new session") {
    val tagged = Sessionize.tagSessions(events, gapMinutes = 30)
      .select("user_id", "event_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(tagged((1L, 100L)) === 1L)
    assert(tagged((1L, 101L)) === 1L)
    assert(tagged((1L, 102L)) === 2L, "45-min gap splits")
    assert(tagged((2L, 200L)) === 1L)
    assert(tagged((2L, 201L)) === 1L, "exactly-30-min gap does NOT split")
    assert(tagged((3L, 300L)) === 1L)
  }

  test("session stats roll up bounds and counts per (user, session)") {
    val stats = Sessionize.sessionStats(events, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    val s11 = stats((1L, 1L))
    assert(s11.getLong(s11.fieldIndex("n_events")) === 2L)
    assert(s11.getTimestamp(s11.fieldIndex("session_start")) === ts(0))
    assert(s11.getTimestamp(s11.fieldIndex("session_end")) === ts(10))
    val s12 = stats((1L, 2L))
    assert(s12.getLong(s12.fieldIndex("n_events")) === 1L)
    assert(stats((2L, 1L)).getLong(s11.fieldIndex("n_events")) === 2L)
  }

  test("tagging and rollup share ONE exchange (windows + agg ride the same shuffle)") {
    val plan = Sessionize.sessionStats(events, gapMinutes = 30)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected exactly one hash exchange:\n$plan")
  }

  test("gapFillDaily densifies each user's own span with zero rows") {
    import spark.implicits._
    def day(d: Int) = Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    val ev = Seq(
      (1L, 100L, day(1), "click", 1.5),
      (1L, 101L, day(1), "view", 2.5), // two events day 1
      (1L, 102L, day(4), "click", 4.0), // gap: days 2 and 3 missing
      (2L, 200L, day(7), "view", 9.0) // single-day user -> one row
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val r = Sessionize.gapFillDaily(ev).orderBy("user_id", "day").collect()
      .map(x => (x.getLong(0), x.getDate(1).toString, x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq(
      (1L, "2024-03-01", 2L, 4.0),
      (1L, "2024-03-02", 0L, 0.0),
      (1L, "2024-03-03", 0L, 0.0),
      (1L, "2024-03-04", 1L, 4.0),
      (2L, "2024-03-07", 1L, 9.0)),
      s"grid must cover each user's span exactly: ${r.toSeq}")
  }
}
