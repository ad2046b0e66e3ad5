package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ext.Events

/** Behavior of the event-sequence analytics (ext/Events.scala):
  * anchored funnel and cohort retention.
  */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  // microsecond-exact (a plain ms constructor would floor us=10 to 0)
  private def ts(us: Long) = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }
  private val DAY = 86400000000L

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, k) => (u, ts(t), k) }.toDF("user_id", "ts", "etype")

  private def depths(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("funnel: anchored greedy semantics, strict ordering, window cap") {
    val e = ev(
      // u1 completes: view, click, purchase in order
      (1L, 1000L, "view"), (1L, 2000L, "click"), (1L, 3000L, "purchase"),
      // u2 skips click: purchase cannot advance without it
      (2L, 1000L, "view"), (2L, 3000L, "purchase"),
      // u3: click BEFORE the first view never counts; no later click
      (3L, 500L, "click"), (3L, 1000L, "view"),
      // u4: click at the SAME us as the anchor view fails strict >
      (4L, 1000L, "view"), (4L, 1000L, "click"),
      // u5: click outside the window of the FIRST view (greedy anchor)
      (5L, 1000L, "view"), (5L, 1000L + 2 * DAY, "click"),
      // u6: no view at all, only later steps -> depth 0
      (6L, 1000L, "click"), (6L, 2000L, "purchase"),
      // u7: full chain, purchase just inside the window
      (7L, 0L, "view"), (7L, 10L, "click"), (7L, DAY, "purchase"))
    val got = depths(Events.funnel(e, "user_id", "ts", "etype",
      Seq("view", "click", "purchase"), DAY))
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1, 5L -> 1,
      6L -> 0, 7L -> 3))
  }

  test("funnel: window anchors at the FIRST step-0 event, not the best one") {
    // a later view WOULD complete the funnel, but greedy anchors at us=0
    val e = ev(
      (1L, 0L, "view"), (1L, 5 * DAY, "view"), (1L, 5 * DAY + 1, "click"))
    val got = depths(Events.funnel(e, "user_id", "ts", "etype",
      Seq("view", "click"), DAY))
    assert(got == Map(1L -> 1))
  }

  test("funnel: single-step funnel and step-order validation") {
    val e = ev((1L, 10L, "a"), (2L, 10L, "b"))
    val got = depths(Events.funnel(e, "user_id", "ts", "etype", Seq("a"), 100L))
    assert(got == Map(1L -> 1)) // u2 has no step-type event at all -> no row
    intercept[IllegalArgumentException] {
      Events.funnel(e, "user_id", "ts", "etype", Seq("a", "a"), 100L)
    }
  }

  test("retention: cohort by first-event day, offsets count distinct users") {
    val e = ev(
      // u1: days 0, 1, 3 (two events on day 1 count once)
      (1L, 0L, "x"), (1L, DAY + 5L, "x"), (1L, DAY + 6L, "x"),
      (1L, 3 * DAY, "x"),
      // u2: cohort day 1, returns day 3 (offset 2)
      (2L, DAY + 1L, "x"), (2L, 3 * DAY + 1L, "x"),
      // u3: cohort day 0 only
      (3L, 10L, "x"))
    val got = Events.retention(e, "user_id", "ts", DAY)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("eventPaths: first-N types in (ts, type) order, counted across users") {
    val e = ev(
      (1L, 100L, "a"), (1L, 200L, "b"), (1L, 300L, "c"),
      (2L, 10L, "a"), (2L, 20L, "b"), (2L, 30L, "c"),
      // u3: same path but truncated at maxLen=2
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 3L, "z"),
      // u4: tie at the same us orders by type name (b before c)
      (4L, 5L, "c"), (4L, 5L, "b"))
    val got = Events.eventPaths(e, "user_id", "ts", "etype", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a>b" -> 3L, "b>c" -> 1L))
  }

  test("sessionize: gap splits sessions, counts per session") {
    val e = ev(
      (1L, 0L, "x"), (1L, 1000L, "x"),          // session 1: 2 events
      (1L, 10000000L, "x"),                     // > 5s gap -> session 2
      (2L, 500L, "x"))
    val got = Events.sessionize(e, "user_id", "ts", 5000000L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 2L), (1L, 10000L, 1L), (2L, 0L, 1L)))
  }

  test("null types/timestamps never shift funnel, paths, transitions or retention") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType),
      StructField("etype", StringType)))
    val rows = java.util.Arrays.asList(
      Row(1L, ts(1000L), "view"), Row(1L, null, "click"), // null ts
      Row(1L, ts(2000L), "click"), Row(1L, ts(2500L), null), // null type
      Row(1L, ts(3000L), "purchase"))
    val e = spark.createDataFrame(rows, schema)
    val clean = ev((1L, 1000L, "view"), (1L, 2000L, "click"),
      (1L, 3000L, "purchase"))
    def all(df: org.apache.spark.sql.DataFrame) = (
      depths(Events.funnel(df, "user_id", "ts", "etype",
        Seq("view", "click", "purchase"), DAY)),
      Events.eventPaths(df, "user_id", "ts", "etype", 5)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap,
      Events.transitions(df, "user_id", "ts", "etype")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      Events.retention(df, "user_id", "ts", DAY)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap)
    assert(all(e) == all(clean))
  }

  test("retention: bucket boundary is exact (no double-division drift)") {
    // one event 1 us before the day boundary, one exactly on it
    val e = ev((1L, DAY - 1L, "x"), (2L, DAY, "x"))
    val got = Events.retention(e, "user_id", "ts", DAY)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 1L, (1L, 0L) -> 1L))
  }

  test("capped funnel: depth is computed over the EARLIEST cap events only") {
    val e = ev(
      // u1: click arrives as the 5th event — visible uncapped, not
      // under cap 4 (the 4 earliest are all views)
      (1L, 1000L, "view"), (1L, 1100L, "view"), (1L, 1200L, "view"),
      (1L, 1300L, "view"), (1L, 1400L, "click"),
      // u2: completes within the first 3 events; the later flood of
      // views cannot change the prefix
      (2L, 1000L, "view"), (2L, 2000L, "click"), (2L, 3000L, "purchase"),
      (2L, 4000L, "view"), (2L, 5000L, "view"), (2L, 6000L, "view"))
    val steps = Seq("view", "click", "purchase")
    val un = depths(Events.funnel(e, "user_id", "ts", "etype", steps, DAY))
    val cap = depths(Events.funnel(e, "user_id", "ts", "etype", steps, DAY,
      maxEventsPerUser = 4))
    assert(un == Map(1L -> 2, 2L -> 3))
    assert(cap == Map(1L -> 1, 2L -> 3))
  }

  test("capped funnel/transitions: a 1M-event bot user runs in bounded state") {
    // one bot with 1M events (completing the funnel in its first 3),
    // one small user — the heap aggregate holds <= 8 entries per user
    val bot = spark.range(0, 1000000).select(lit(1L).as("user_id"),
      (col("id") * 1000 + 1000).as("us"),
      when(col("id") === 0, "view").when(col("id") === 1, "click")
        .when(col("id") === 2, "purchase").otherwise("view").as("etype"))
      .select(col("user_id"), to_timestamp(col("us") / 1000000.0).as("ts"),
        col("etype"))
    val small = ev((2L, 1000L, "view"), (2L, 2000L, "click"))
    val e = bot.unionByName(small)
    val cap = depths(Events.funnel(e, "user_id", "ts", "etype",
      Seq("view", "click", "purchase"), 7L * DAY, maxEventsPerUser = 8))
    assert(cap == Map(1L -> 3, 2L -> 2))
    val tr = Events.transitions(e, "user_id", "ts", "etype",
      maxEventsPerUser = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // bot prefix: view>click>purchase>view; small: view>click
    assert(tr == Map(("view", "click") -> 2L, ("click", "purchase") -> 1L,
      ("purchase", "view") -> 1L))
  }

  test("capped funnel ties at the same timestamp keep step order (like uncapped)") {
    // 5 events at the SAME us; cap 3 must keep (view, click, purchase)
    // by the zero-padded step payload, not arbitrary heap order
    val e = ev((1L, 1000L, "purchase"), (1L, 1000L, "view"),
      (1L, 1000L, "click"), (1L, 1000L, "purchase"), (1L, 1000L, "view"))
    val steps = Seq("view", "click", "purchase")
    val cap = depths(Events.funnel(e, "user_id", "ts", "etype", steps, DAY,
      maxEventsPerUser = 3))
    // all same ts: anchor = view, but strict ts increase blocks click
    assert(cap == Map(1L -> 1))
    assert(cap == depths(Events.funnel(e, "user_id", "ts", "etype", steps, DAY)))
  }
}
