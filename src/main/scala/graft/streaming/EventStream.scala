package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Event-time streaming over the `events` table shape: watermarked
  * tumbling-window aggregation and stateful sessionization via
  * `flatMapGroupsWithState`.
  *
  * Semantics intentionally match the batch operators in
  * [[graft.ops.Sessions]] (same 30-min gap, same 1-h windows) — the
  * DuckDB oracle that gates the batch versions therefore also pins these;
  * the streaming specs assert stream ≡ batch on the fixture.
  */
object EventStream {

  def eventsSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream of events parquet, normalized to micro NTZ
    * exactly like the batch reader ([[graft.ops.Sessions.normalizeTs]]).
    * The fixture's physical `ts` shape has varied across generations
    * (nanos-as-long vs timestamp[us]); a one-time driver-side batch
    * metadata read pins the actual type, and the stream itself still
    * gets an explicit schema so it never infers per micro-batch. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    graft.ops.Sessions.normalizeTs(
      spark.readStream.schema(eventsSchema(tsType)).parquet(dir))
  }

  /** Watermarked tumbling 1-h counts per event type. Late data beyond
    * 2 h is dropped; state for closed windows is evicted — bounded state
    * at any scale. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast(TimestampType)) // watermarks need an instant
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast(TimestampNTZType).as("window_start"),
        col("event_type"), col("n_events"))

  case class Ev(user_id: Long, tsMicros: Long)
  case class SessionState(sessionCount: Int, lastTs: Long)
  case class UserSessions(user_id: Long, n_sessions: Int, n_events: Long)

  /** Stateful sessionization: per-user session counting with the same
    * 30-min gap rule as [[graft.ops.Sessions.sessionize]], kept in a
    * `GroupState` so it spans micro-batches. State is O(users), the
    * stream is never re-sorted globally.
    *
    * Correct only when each user's events arrive in event-time order
    * across batches (true for the replay-a-sorted-log test shape; a
    * production job would buffer out-of-order events with a timeout —
    * noted rather than implemented, the fixture replay is ordered). */
  def sessionCounts(events: DataFrame)(implicit spark: SparkSession): Dataset[UserSessions] = {
    import spark.implicits._
    val evs = events
      .select(col("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("tsMicros"))
      .as[Ev]
    evs.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.NoTimeout())(
      (user: Long, batch: Iterator[Ev], state: GroupState[SessionState]) => {
        val sorted = batch.toSeq.sortBy(_.tsMicros)
        var st = state.getOption.getOrElse(SessionState(0, Long.MinValue))
        var events = 0L
        sorted.foreach { e =>
          val gap = e.tsMicros - st.lastTs
          val newSession = st.lastTs == Long.MinValue || gap > graft.ops.Sessions.SessionGapMicros
          st = SessionState(st.sessionCount + (if (newSession) 1 else 0), e.tsMicros)
          events += 1
        }
        state.update(st)
        Iterator(UserSessions(user, st.sessionCount, events))
      })
  }

  case class FunnelEv(user_id: Long, tsMicros: Long, event_id: Long, event_type: String)
  case class FunnelState(nEvents: Long, viewTs: Option[Long],
                         clickTs: Option[Long], purchaseTs: Option[Long])
  case class UserFunnel(user_id: Long, n_events: Long, view_us: Option[Long],
                        click_us: Option[Long], purchase_us: Option[Long], stage: Int)

  /** Ordered stage priority at equal timestamps: a click logged in the
    * same microsecond as the first view still converts (the batch
    * operator's inclusive `>=`), which in arrival order means views
    * must be folded before clicks before purchases within a tie. */
  private def stageOrder(tp: String): Int = tp match {
    case "view" => 0; case "click" => 1; case "purchase" => 2; case _ => 3
  }

  /** Streaming funnel: per-user view → click → purchase progression
    * kept in `GroupState`, the streaming dual of
    * [[graft.ops.Sessions.eventsFunnel]] with identical semantics —
    * stage k's timestamp is the EARLIEST event of its type at-or-after
    * stage k-1's (ties resolved view-before-click-before-purchase, the
    * inclusive-`>=` arrival-order equivalent).
    *
    * State is four longs per user — O(users), never an event buffer —
    * and each update emits the user's current funnel row (Update
    * mode), so a dashboard sees conversion move in real time. Same
    * ordered-arrival caveat as [[sessionCounts]]: cross-batch
    * correctness relies on per-user event-time-ordered arrival (true
    * for the replay shape; equal-ts pairs split across micro-batches
    * in reverse stage order would need an out-of-order buffer). */
  def funnelStream(events: DataFrame)(implicit spark: SparkSession): Dataset[UserFunnel] = {
    import spark.implicits._
    val evs = events
      .select(col("user_id"),
        unix_micros(col("ts").cast(TimestampType)).as("tsMicros"),
        col("event_id"), col("event_type"))
      .as[FunnelEv]
    evs.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.NoTimeout())(
      (user: Long, batch: Iterator[FunnelEv], state: GroupState[FunnelState]) => {
        val sorted = batch.toSeq.sortBy(e => (e.tsMicros, stageOrder(e.event_type), e.event_id))
        var st = state.getOption.getOrElse(FunnelState(0L, None, None, None))
        sorted.foreach { e =>
          val viewTs = st.viewTs.orElse(
            if (e.event_type == "view") Some(e.tsMicros) else None)
          val clickTs = st.clickTs.orElse(
            if (e.event_type == "click" && viewTs.exists(e.tsMicros >= _))
              Some(e.tsMicros) else None)
          val purchaseTs = st.purchaseTs.orElse(
            if (e.event_type == "purchase" && clickTs.exists(e.tsMicros >= _))
              Some(e.tsMicros) else None)
          st = FunnelState(st.nEvents + 1, viewTs, clickTs, purchaseTs)
        }
        state.update(st)
        val stage = Seq(st.viewTs, st.clickTs, st.purchaseTs).count(_.isDefined)
        Iterator(UserFunnel(user, st.nEvents, st.viewTs, st.clickTs, st.purchaseTs, stage))
      })
  }

  /** Streaming as-of enrichment: attach to each in-flight event the
    * latest reference row at or before its timestamp — the streaming
    * dual of [[graft.ops.AsOf.asofJoin]], with identical semantics
    * (inclusive at equal timestamps, nulls before the first reference).
    *
    * Formulation: the STATIC reference side is precomputed into SCD-2
    * validity intervals ([refTs, next refTs) per key, one batch window
    * pass), after which the as-of match is a plain stream-static LEFT
    * join whose condition hits exactly one interval per event — no
    * stream-side aggregation, no arbitrary state, fully declarative.
    * Spark broadcasts the static side, so at scale this is the
    * broadcast-dimension enrichment shape (ref = checkpoint/dimension
    * table, orders of magnitude smaller than the stream); a
    * stream-STREAM as-of would instead compose the session operators'
    * `flatMapGroupsWithState` pattern.
    *
    * `ref` column names must not collide with the stream's (rename
    * before calling); `refTs` is carried through as the matched
    * instant, like the batch operator. */
  def asofEnrich(events: DataFrame, ref: DataFrame, key: String = "user_id",
                 probeTs: String = "ts", refTs: String = "asof_ts"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(refTs)
    val iv = ref.withColumn("__until", lead(col(refTs), 1).over(w))
    events.alias("e").join(iv.alias("r"),
      col(s"e.$key") === col(s"r.$key") &&
        col(s"e.$probeTs") >= col(s"r.$refTs") &&
        (col("r.__until").isNull || col(s"e.$probeTs") < col("r.__until")),
      "left")
      .select(events.columns.map(c => col(s"e.$c")) ++
        ref.columns.filterNot(_ == key).map(c => col(s"r.$c")): _*)
  }

  /** Streaming anomaly gate: score each arriving event against a
    * PRECOMPUTED per-type baseline (n, Σv, Σv² from
    * [[graft.ops.Sessions.anomalyStats]] over a reference corpus) and
    * pass only |z| > [[graft.ops.Sessions.AnomalyZ]].
    *
    * This is the production shape of anomaly detection: moments are
    * trained on a batch snapshot (types-count rows — a broadcast
    * dimension), the live stream is a stateless map-side join + filter
    * per micro-batch — no stream-side aggregation, no state store, no
    * watermark needed for correctness. The z arithmetic is the SAME
    * shared expression as the batch operator, so the batch oracle that
    * checks `events_anomaly` pins this filter too (spec: streaming the
    * corpus against its own baseline reproduces the batch rows). */
  def anomalyFilter(events: DataFrame, stats: DataFrame): DataFrame =
    events.join(broadcast(stats), "event_type")
      .withColumn("z", graft.ops.Sessions.zExpr)
      .where(abs(col("z")) > graft.ops.Sessions.AnomalyZ)
      .select(events.columns.map(col) :+ round(col("z"), 6).as("z"): _*)

  /** Drain to an in-memory table (test/debug sink). */
  def runToMemory(df: DataFrame, name: String): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }

  /** Drain an append-mode (watermarked) stream to parquet. */
  def runAppendToParquet(df: DataFrame, outDir: String, checkpointDir: String): StreamingQuery = {
    val q = df.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q
  }
}
