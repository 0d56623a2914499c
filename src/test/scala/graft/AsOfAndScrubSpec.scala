package graft

import graft.ops.{AsOf, Sessions, TextAnalysis}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the round-15 additions: the as-of join against a
  * brute-force per-row maximum, the bucketed range join against a
  * naive inequality join, the events-ts normalization dispatch across
  * fixture generations, and structural invariants of the sampling /
  * PII-scrub operators (value-level gate is the DuckDB oracle).
  */
class AsOfAndScrubSpec extends SparkSpec {

  import spark.implicits._

  test("asofJoin == brute-force latest-ref-at-or-before, incl. equal-ts inclusivity") {
    // Hand fixture with every edge: probe before any ref (null), probe
    // exactly ON a ref ts (inclusive match), refs interleaved across keys.
    val probe = Seq(
      (1L, 5L, "p1"), (1L, 10L, "p2"), (1L, 11L, "p3"), (1L, 30L, "p4"),
      (2L, 10L, "p5"), (3L, 7L, "p6")).toDF("k", "ts", "p")
    val ref = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (2L, 10L, "c"), (2L, 11L, "d"))
      .toDF("k", "rts", "rv")
    val out = AsOf.asofJoin(probe, ref, Seq("k"), "ts", "rts")
      .select("k", "ts", "p", "rts", "rv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.getString(4))))
      .toSet
    assert(out == Set(
      (1L, 5L, "p1", None, None),             // before first ref
      (1L, 10L, "p2", Some(10L), Some("a")),  // equal ts → inclusive
      (1L, 11L, "p3", Some(10L), Some("a")),
      (1L, 30L, "p4", Some(20L), Some("b")),
      (2L, 10L, "p5", Some(10L), Some("c")),  // later ref (11) not taken
      (3L, 7L, "p6", None, None)))            // key with no refs at all
  }

  test("asofJoin attaches the matched reference row ATOMICALLY (null payloads ride along)") {
    // The frankenrow trap: per-column last(ignoreNulls) would fill the
    // latest row's NULL column from an OLDER row — DuckDB's ASOF
    // attaches the whole row, NULLs included.
    val probe = Seq((1L, 30L, "p1")).toDF("k", "ts", "p")
    val ref = Seq((1L, 1L, Some("a1"), Some("b1")), (1L, 2L, None, Some("b2")))
      .toDF("k", "rts", "ra", "rb")
    val out = AsOf.asofJoin(probe, ref, Seq("k"), "ts", "rts")
      .select("rts", "ra", "rb").head()
    assert(out.getLong(0) == 2L, "latest ref row must match")
    assert(out.isNullAt(1), s"ra must be the matched row's NULL, not an older row's value: $out")
    assert(out.getString(2) == "b2")
  }

  test("asofJoin strictUniqueRef: duplicate (keys, refTs) ref rows error; unique pass") {
    val probe = Seq((1L, 10L, "p1")).toDF("k", "ts", "p")
    val dupRef = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 20L, "c"))
      .toDF("k", "rts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(probe, dupRef, Seq("k"), "ts", "rts", strictUniqueRef = true)
    }
    assert(e.getMessage.contains("strictUniqueRef"))
    // same key at DIFFERENT instants is fine — uniqueness is per (keys, refTs)
    val okRef = Seq((1L, 10L, "a"), (1L, 20L, "c"), (2L, 10L, "d"))
      .toDF("k", "rts", "rv")
    val strictOut = AsOf.asofJoin(probe, okRef, Seq("k"), "ts", "rts",
      strictUniqueRef = true).select("k", "ts", "p", "rts", "rv").collect()
    val defaultOut = AsOf.asofJoin(probe, okRef, Seq("k"), "ts", "rts")
      .select("k", "ts", "p", "rts", "rv").collect()
    assert(strictOut.toSeq == defaultOut.toSeq, "strict must not change results")
  }

  test("events_asof == brute-force on the fixture, and every asof_ts <= ts") {
    val out = AsOf.eventsAsof(spark, sf)
    val rows = out.collect()
    val ev = Sessions.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val cps = ev.filter(_._1 % 10 == 0)
      .groupBy(e => (e._2, e._3)).map { case ((u, us), es) =>
        (u, us, es.map(_._4).max) }.toSeq
    val byUser = cps.groupBy(_._1)
    val expected = ev.map { case (id, u, us, _) =>
      val cand = byUser.getOrElse(u, Seq.empty).filter(_._2 <= us)
      id -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)))
    }.toMap
    assert(rows.length == ev.length)
    rows.foreach { r =>
      val id = r.getAs[Long]("event_id")
      val got = Option(r.getAs[java.time.LocalDateTime]("asof_ts")).map { ldt =>
        (r.getAs[Long]("user_id"),
          ldt.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
            ldt.getNano / 1000L,
          r.getAs[Double]("asof_value"))
      }
      assert(got == expected(id), s"event $id")
    }
  }

  test("events_range_join == naive inequality join") {
    val naive = {
      val ev = Sessions.events(spark, sf)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"), col("value"))
      val iv = ev.where(col("event_id") % 25 === 0)
        .select(col("event_id").as("interval_id"), col("user_id").as("iu"),
          col("us").as("s"), (col("us") + AsOf.IntervalMicros).as("e"))
      iv.join(ev, col("iu") === col("user_id") &&
          col("us") >= col("s") && col("us") < col("e"))
        .groupBy("interval_id").agg(count(lit(1)).as("n"))
        .as[(Long, Long)].collect().toMap
    }
    val got = AsOf.eventsRangeJoin(spark, sf)
      .select(col("interval_id"), col("n_events"))
      .as[(Long, Long)].collect().toMap
    assert(got == naive)
    assert(got.nonEmpty && got.values.forall(_ >= 1L)) // anchor contains itself
  }

  test("normalizeTs dispatches all three fixture ts shapes to micro NTZ") {
    val base = Seq((1L, 1723500000000000L)) // us since epoch
    // long column = the nanos-as-long generation (value in ns)
    val asLong = base.map { case (id, us) => (id, us * 1000L) }.toDF("event_id", "ts")
    val outLong = Sessions.normalizeTs(asLong)
    assert(outLong.schema("ts").dataType == TimestampNTZType)
    // NTZ column = the timestamp[us] generation: identity
    val asNtz = asLong.withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    val outNtz = Sessions.normalizeTs(asNtz)
    assert(outNtz.schema("ts").dataType == TimestampNTZType)
    // instant TIMESTAMP: cast under the session's pinned UTC zone
    val asTs = asLong.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val outTs = Sessions.normalizeTs(asTs)
    assert(outTs.schema("ts").dataType == TimestampNTZType)
    val vals = Seq(outLong, outNtz, outTs).map(
      _.select(unix_micros(col("ts").cast("timestamp"))).as[Long].head())
    assert(vals.distinct == Seq(base.head._2), s"got $vals")
    // anything else is a loud error, not a silent misread
    intercept[IllegalArgumentException] {
      Sessions.normalizeTs(Seq((1L, "x")).toDF("event_id", "ts"))
    }
  }

  test("as-of plan: ONE Window operator (carried columns collapse), no nested loop") {
    // The fold of last(ignoreNulls) columns must collapse into a single
    // Window operator — N window operators would mean N sorts of the
    // unioned frame. And neither temporal join may degrade to the
    // nested-loop plan Catalyst uses for raw inequality joins.
    val asofPlan = AsOf.eventsAsof(spark, sf)
      .queryExecution.executedPlan.toString
    val nWindow = "Window \\[".r.findAllIn(asofPlan).size
    assert(nWindow == 1, s"expected exactly one Window node, got $nWindow:\n$asofPlan")
    assert(!asofPlan.contains("BroadcastNestedLoopJoin") &&
      !asofPlan.contains("CartesianProduct"))
    val rangePlan = AsOf.eventsRangeJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!rangePlan.contains("BroadcastNestedLoopJoin") &&
      !rangePlan.contains("CartesianProduct"),
      s"range join must stay an equi-key join:\n$rangePlan")
  }

  test("corpus_sample: deterministic, stratified, weight = inverse keep-rate") {
    val out = TextAnalysis.corpusSample(spark, sf)
    val a = out.collect()
    val b = TextAnalysis.corpusSample(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "same content → same sample, no RNG state")
    assert(a.nonEmpty && a.length < ops.Docs.documents(spark, sf).count())
    a.foreach { r =>
      val w = r.getAs[Double]("weight")
      val expected = r.getAs[String]("lang") match {
        case "en" => 2.0; case "zh" => 4.0; case _ => 8.0
      }
      assert(w == expected)
    }
  }

  test("corpus_sample_weighted: DLT priority sampling — top-k by priority, threshold estimator") {
    val out = TextAnalysis.corpusSampleWeighted(spark, sf).collect()
    assert(out.length == TextAnalysis.SampleWeightedK)
    // deterministic: same content → same sample
    assert(out.toSeq == TextAnalysis.corpusSampleWeighted(spark, sf).collect().toSeq)
    // brute-force replay of the draw: the kept set IS the k highest
    // priorities (q = w·2^32/(v+1), v = first 32 md5 bits)
    val docs = ops.Docs.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
    val byPriority = docs.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(("wsmp:" + r.getString(1)).getBytes("UTF-8"))
      val v = java.lang.Long.parseLong(
        md.take(4).map("%02x".format(_)).mkString, 16)
      (r.getLong(0), 4294967296.0 * r.getLong(2) / (v + 1), r.getLong(2))
    }.sortBy { case (id, q, _) => (-q, id) }
    val wantIds = byPriority.take(TextAnalysis.SampleWeightedK).map(_._1).toSeq
    assert(out.map(_.getLong(0)).toSeq == wantIds,
      "kept set is not the k highest priorities")
    // estimator contract: w_hat = max(w, tau) with tau the (k+1)-th
    // priority — every kept doc's w_hat >= its weight, and the
    // total-sum estimate sum(w_hat) lands near sum(w) (one fixed draw,
    // generous band: the arithmetic sanity check, not a statistics test)
    val tau = byPriority(TextAnalysis.SampleWeightedK)._2
    out.foreach { r =>
      val (w, wHat) = (r.getLong(2).toDouble, r.getDouble(4))
      assert(math.abs(wHat - math.max(w, tau)) < 1e-6,
        s"w_hat contract broken for doc ${r.getLong(0)}")
    }
    val trueSum = docs.map(_.getLong(2)).sum.toDouble
    val estSum = out.map(_.getDouble(4)).sum
    assert(estSum > trueSum * 0.5 && estSum < trueSum * 2.0,
      s"DLT total estimate wildly off: $estSum vs $trueSum")
  }

  test("corpus_sample_stratified: exact per-language quota, bounded-aggregate plan") {
    val out = TextAnalysis.corpusSampleStratified(spark, sf).collect()
    // quota contract: every stratum emits min(stratum size, k) rows
    val strata = ops.Docs.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy(_.getString(0)).view.mapValues(_.length.toLong).toMap
    strata.foreach { case (lang, n) =>
      assert(got.getOrElse(lang, 0L) == math.min(n, TextAnalysis.StratifiedK.toLong),
        s"stratum $lang: ${got.getOrElse(lang, 0L)} of $n docs (k=${TextAnalysis.StratifiedK})")
    }
    // deterministic: same content → same sample
    assert(out.toSeq == TextAnalysis.corpusSampleStratified(spark, sf).collect().toSeq)
    // the kept set per stratum IS the k best content-keyed scores —
    // brute-force replay of one stratum's draw
    val lang0 = strata.keys.min
    val byScore = ops.Docs.documents(spark, sf)
      .where(org.apache.spark.sql.functions.col("lang") === lang0)
      .select("doc_id", "text").collect()
      .map { r =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(("ssmp:" + r.getString(1)).getBytes("UTF-8"))
        (r.getLong(0), java.lang.Long.parseLong(
          md.take(4).map("%02x".format(_)).mkString, 16).toDouble)
      }.sortBy { case (id, s) => (-s, id) }
    val wantIds = byScore.take(TextAnalysis.StratifiedK).map(_._1).toSeq
    assert(out.filter(_.getString(0) == lang0).map(_.getLong(2)).toSeq == wantIds,
      s"stratum $lang0 kept set is not its k best scores")
    // 100 TB shape: the per-stratum selection is a PARTIAL topk
    // aggregate (bounded k-heap per language map-side) — only heaps
    // shuffle, never the corpus; a window row_number would sort it all
    val p = TextAnalysis.corpusSampleStratified(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_topk_by_score"), p)
  }

  test("text_pii_scrub removes every PII pattern it counted") {
    val out = TextAnalysis.textPiiScrub(spark, sf).collect()
    assert(out.length == ops.Docs.documents(spark, sf).count().toInt)
    out.foreach { r =>
      val clean = r.getAs[String]("clean")
      // the appended synthetic PII guarantees at least one of each class
      assert(r.getAs[Long]("n_email") >= 1L)
      assert(r.getAs[Long]("n_ip") >= 1L)
      assert(r.getAs[Long]("n_phone") >= 1L)
      assert(!clean.matches(s".*${TextAnalysis.PiiEmail}.*"))
      assert(!TextAnalysis.PiiIp.r.findFirstIn(clean).isDefined)
      assert(!TextAnalysis.PiiPhone.r.findFirstIn(clean).isDefined)
      assert(clean.contains("<EMAIL>") && clean.contains("<IP>") &&
        clean.contains("<PHONE>"))
    }
  }
}
