package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Temporal joins Spark's built-in operators don't express directly:
  * as-of join (each probe row picks the latest reference row at or
  * before its timestamp) and interval range join (aggregate fact rows
  * falling inside derived time intervals).
  *
  * Both are built from Spark primitives chosen for the 100 TB shape —
  * NOT from an inequality join, which Catalyst can only execute as a
  * broadcast-nested-loop / cartesian-with-filter:
  *
  *  - As-of: union both sides and run one `last(_, ignoreNulls)` window
  *    per reference column. Exactly one shuffle on the join key, state
  *    per partition is a single row of carried values, no pair blow-up
  *    — the classic log-merge formulation. (Each side is scanned once;
  *    at 1000 executors the merge is per-key-partition local.)
  *  - Range: bucketize time, explode each interval into the hour
  *    buckets it covers (bounded: interval width / bucket width + 1),
  *    equi-join on (key, bucket), then filter exact containment. The
  *    equi-join shuffles on (key, bucket) — skew-safe under AQE — and
  *    the cartesian never materializes.
  */
object AsOf {

  /** Generic as-of join. For every probe row, attaches the reference
    * row with the greatest `refTs <= probeTs` within the same `keys`
    * group (DuckDB `ASOF JOIN ... ON probe.ts >= ref.ts` semantics,
    * inclusive); probe rows with no earlier reference keep nulls.
    *
    * Payload column names must be disjoint between the two frames
    * (rename before calling); reference rows should be unique per
    * (keys, refTs) — with duplicates, which duplicate wins is
    * unspecified on BOTH this implementation and DuckDB.
    *
    * `strictUniqueRef = true` turns that "unspecified winner" into a
    * loud error: one extra partial-aggregated count job over the
    * REFERENCE side only (the small side in the as-of shape — map-side
    * combine means the shuffled rows are one per distinct (keys, refTs)
    * per input partition, and the probe/fact side is never touched).
    * Off by default: the check is an extra action, and the default
    * contract matches DuckDB.
    */
  def asofJoin(probe: DataFrame, ref: DataFrame, keys: Seq[String],
               probeTs: String, refTs: String,
               strictUniqueRef: Boolean = false): DataFrame = {
    if (strictUniqueRef) {
      val grp = (keys :+ refTs).map(col)
      val dup = ref.groupBy(grp: _*).agg(count(lit(1)).as("__n"))
        .where(col("__n") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"asofJoin strictUniqueRef: duplicate reference rows per " +
          s"(${keys.mkString(",")}, $refTs), e.g. ${dup.headOption.orNull}")
    }
    val refPayload = ref.columns.filterNot(keys.contains).toSeq // refTs included: the matched instant
    val probePayload = probe.columns.filterNot(keys.contains).toSeq
    val clash = refPayload.intersect(probePayload)
    require(clash.isEmpty, s"asofJoin payload name clash: ${clash.mkString(",")}")

    def nullAs(src: DataFrame, c: String): Column =
      lit(null).cast(src.schema(c).dataType).as(c)

    // One unioned frame, ref rows flagged 0 so they sort BEFORE probe
    // rows at an equal timestamp — that tiebreak IS the >= inclusivity.
    //
    // The reference payload rides as ONE STRUCT, not per-column
    // last() windows (r16): a per-column carry mixes values from
    // DIFFERENT reference rows whenever the latest row holds a NULL
    // in some payload column (its last() reaches back to an older
    // row — a frankenrow DuckDB's whole-row ASOF attach never
    // produces). The struct is non-null exactly when the ROW is a
    // reference row, so one last(ignoreNulls) carries the whole row
    // atomically, NULL fields included.
    val keyCols = keys.map(col)
    val refStruct = org.apache.spark.sql.types.StructType(
      refPayload.map(c => ref.schema(c)))
    val pSide = probe.select(
      keyCols ++ Seq(col(probeTs).as("__ts"), lit(1).as("__side")) ++
        probePayload.map(col) :+ lit(null).cast(refStruct).as("__ref"): _*)
    val rSide = ref.select(
      keyCols ++ Seq(col(refTs).as("__ts"), lit(0).as("__side")) ++
        probePayload.map(nullAs(probe, _)) :+
        struct(refPayload.map(col): _*).as("__ref"): _*)

    val w = Window.partitionBy(keyCols: _*).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = pSide.unionByName(rSide)
      .withColumn("__ref", last(col("__ref"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 1)
      .select(keyCols ++ probePayload.map(col) ++
        refPayload.map(c => col("__ref").getField(c).as(c)): _*)
  }

  /** `events_asof`: for each event, the user's most recent checkpoint
    * (every 10th event, deduped per instant) at or before the event —
    * the "latest quote for each trade" shape. One window shuffle on
    * user_id; oracled by DuckDB's native ASOF LEFT JOIN. */
  def eventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sessions.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    // Checkpoints: every 10th event. Dedup to one row per (user, instant)
    // (max value) — ties at the same instant are unspecified in BOTH
    // engines, so the fixture must not contain any.
    val cp = ev.where(col("event_id") % 10 === 0)
      .groupBy(col("user_id"), col("ts").as("asof_ts"))
      .agg(max(col("value")).as("asof_value"))
    asofJoin(ev, cp, Seq("user_id"), "ts", "asof_ts")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        col("asof_ts"), col("asof_value"))
      .orderBy("event_id")
  }

  val eventsAsofOracle: String =
    """WITH ev AS (SELECT event_id, user_id, ts, value FROM events),
      |cp AS (SELECT user_id, ts AS asof_ts, max(value) AS asof_value
      |       FROM ev WHERE event_id % 10 = 0 GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id, e.ts, e.value, c.asof_ts, c.asof_value
      |FROM ev e ASOF LEFT JOIN cp c
      |  ON e.user_id = c.user_id AND e.ts >= c.asof_ts
      |ORDER BY e.event_id""".stripMargin

  /** Range-join bucket width (1 h) and interval width (2 h), micros. */
  val BucketMicros: Long = 3600L * 1000 * 1000
  val IntervalMicros: Long = 2 * BucketMicros

  /** `events_range_join`: count/sum the events inside each derived
    * 2-hour interval ([anchor ts, +2h), anchors = every 25th event).
    * Implemented as the bucketed interval join: each interval explodes
    * into its <=3 covered hour buckets, events equi-join on
    * (user_id, bucket), exact containment filtered after — so the
    * shuffle key is (user_id, bucket) and no inequality join exists in
    * the plan. Inner join is exact here: every anchor contains at least
    * its own event. */
  def eventsRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sessions.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
    val iv = ev.where(col("event_id") % 25 === 0)
      .select(col("event_id").as("interval_id"), col("user_id").as("iv_user"),
        col("ts").as("start_ts"), col("us").as("start_us"),
        (col("us") + IntervalMicros).as("end_us"))
    // `div`: exact integer division; timestamps are post-epoch so the
    // floor-vs-truncate distinction never bites.
    val ivB = iv.withColumn("bucket",
      explode(sequence(expr(s"start_us div $BucketMicros"),
        expr(s"(end_us - 1) div $BucketMicros"))))
    val evB = ev.withColumn("bucket", expr(s"us div $BucketMicros"))
    ivB.alias("i").join(evB.alias("e"),
        col("i.iv_user") === col("e.user_id") && col("i.bucket") === col("e.bucket") &&
          col("e.us") >= col("i.start_us") && col("e.us") < col("i.end_us"))
      .groupBy(col("i.interval_id").as("interval_id"),
        col("i.iv_user").as("user_id"), col("i.start_ts").as("start_ts"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DecimalType(18, 2))
          .cast("double").as("sum_value"))
      .orderBy("interval_id")
  }

  val eventsRangeJoinOracle: String =
    """WITH ev AS (SELECT event_id, user_id, ts, value FROM events),
      |iv AS (SELECT event_id AS interval_id, user_id, ts AS start_ts,
      |              ts + INTERVAL 2 HOUR AS end_ts
      |       FROM ev WHERE event_id % 25 = 0)
      |SELECT i.interval_id, i.user_id, i.start_ts, count(*) AS n_events,
      |       CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
      |FROM iv i JOIN ev e
      |  ON e.user_id = i.user_id AND e.ts >= i.start_ts AND e.ts < i.end_ts
      |GROUP BY 1, 2, 3 ORDER BY interval_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_asof" -> (eventsAsof _),
    "events_range_join" -> (eventsRangeJoin _),
  )

  def oracleSql: Map[String, String] = Map(
    "events_asof" -> eventsAsofOracle,
    "events_range_join" -> eventsRangeJoinOracle,
  )
}
