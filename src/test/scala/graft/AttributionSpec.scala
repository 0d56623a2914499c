package graft

import java.sql.Timestamp

import graft.ops.Sessions
import org.apache.spark.sql.functions._

/** Last-touch attribution (`events_attribution_last_touch`): the
  * linear-output production sibling of the all-pairs
  * `events_attribution`. The value contract is oracle-checked; these
  * pin what the oracle cannot show — the OUTPUT BOUND on a hot user
  * (all-pairs is quadratic there, last-touch stays one row per click)
  * and the atomic null-out past the window horizon. */
class AttributionSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(1700000000000L + minutes * 60000L)

  /** Write an events fixture and return its dir. */
  private def eventsFixture(rows: Seq[(Long, Timestamp, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-attr").toString
    rows.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("hot user: all-pairs is quadratic, last-touch stays one row per click") {
    val nV = 50; val nC = 40
    val hot = (0 until nV).map(i => (i.toLong, ts(i), 1L, "view")) ++
      (0 until nC).map(i => (1000L + i, ts(i) /* same minute as view i */, 1L, "click"))
    val dir = eventsFixture(hot)
    val allPairs = Sessions.eventsAttribution(spark, dir).count()
    val lastTouch = Sessions.eventsAttributionLastTouch(spark, dir).count()
    // all-pairs: click at minute i (within the 6 h window) pairs with
    // every view at minutes 0..i → Σ(i+1) = quadratic in activity
    assert(allPairs == (1 to nC).map(_.toLong).sum,
      s"all-pairs emitted $allPairs")
    assert(lastTouch == nC.toLong, s"last-touch must emit one row per click, got $lastTouch")
  }

  test("last-touch picks the latest in-window view; nulls out atomically past the window") {
    val rows = Seq(
      // user 1: two views then a click — latest wins
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "view"),
      (3L, ts(20), 1L, "click"),
      // user 2: view 7 h before the click — outside the 6 h window
      (4L, ts(0), 2L, "view"), (5L, ts(7 * 60), 2L, "click"),
      // user 3: click with no view at all
      (6L, ts(5), 3L, "click"),
      // user 4: two views at the SAME instant — max view_id wins
      (7L, ts(0), 4L, "view"), (8L, ts(0), 4L, "view"),
      (9L, ts(1), 4L, "click"),
      // user 5: view strictly after the click — not attributable
      (10L, ts(30), 5L, "click"), (11L, ts(40), 5L, "view"))
    val dir = eventsFixture(rows)
    val got = Sessions.eventsAttributionLastTouch(spark, dir)
      .select(col("click_id"), col("view_id"),
        unix_micros(col("view_ts").cast("timestamp")).as("view_us"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toSeq
    def us(t: Timestamp): Long = t.getTime * 1000L
    assert(got == Seq(
      (3L, Some(2L), Some(us(ts(10)))),
      (5L, None, None),           // out of window: BOTH fields null
      (6L, None, None),
      (9L, Some(8L), Some(us(ts(0)))), // same-instant tie → max id
      (10L, None, None)))
  }

  test("last-touch plans as the log-merge: no join operator, bounded exchanges") {
    val plan = Sessions.eventsAttributionLastTouch(spark, sf)
      .queryExecution.executedPlan.toString
    // the as-of union-window formulation: the pair set never exists,
    // so no join of ANY kind may appear in the plan
    assert(!plan.contains("Join"), s"as-of log-merge planned a join:\n$plan")
    assert(plan.contains("Window"), "the last(ignoreNulls) carry window is missing")
    // one exchange for the view-instant dedup aggregate, one on
    // user_id for the log-merge window, one range exchange for the
    // output order; a 4th would mean the union re-shuffled
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <= 3 exchanges, got $exchanges:\n$plan")
  }

  test("every click appears exactly once, attributed or not") {
    val out = Sessions.eventsAttributionLastTouch(spark, sf)
    val clicks = Sessions.events(spark, sf).filter(col("event_type") === "click")
    assert(out.count() == clicks.count())
    assert(out.select("click_id").distinct().count() == clicks.count())
  }
}
