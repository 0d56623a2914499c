package graft

import graft.ops.{Sessions, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Pins for the round-15 additions beyond the as-of/scrub batch:
  * ordered-funnel semantics against a brute-force replay, the
  * repetition quality signals against per-document recounts, and the
  * embedding cluster assignment against a driver-side argmax. The
  * value-level gate for all three is the DuckDB oracle (driver-run);
  * these pin semantics the oracle restates rather than independently
  * derives, plus the map-side-only plan claim for the assignment.
  */
class FunnelRepetitionClusterSpec extends SparkSpec {

  import spark.implicits._

  test("events_funnel == brute-force ordered min-chase per user") {
    val out = Sessions.eventsFunnel(spark, sf).collect()
    val ev = Sessions.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    assert(out.length == byUser.size)
    out.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val es = byUser(u)
      def ts(col: String): Option[Long] =
        Option(r.getAs[java.time.LocalDateTime](col))
          .map(ldt => ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L)
      val view = es.filter(_._2 == "view").map(_._3).minOption
      val click = view.flatMap(v =>
        es.filter(e => e._2 == "click" && e._3 >= v).map(_._3).minOption)
      val purchase = click.flatMap(c =>
        es.filter(e => e._2 == "purchase" && e._3 >= c).map(_._3).minOption)
      assert(r.getAs[Long]("n_events") == es.length, s"user $u n_events")
      assert(ts("view_ts") == view, s"user $u view_ts")
      assert(ts("click_ts") == click, s"user $u click_ts")
      assert(ts("purchase_ts") == purchase, s"user $u purchase_ts")
      assert(r.getAs[Int]("stage") ==
        Seq(view, click, purchase).count(_.isDefined), s"user $u stage")
    }
    // the fixture exercises every depth: some users convert fully
    assert(out.exists(_.getAs[Int]("stage") == 3), "no full conversions in fixture")
  }

  test("corpus_repetition == per-document bigram recount") {
    val out = TextAnalysis.corpusRepetition(spark, sf).collect()
    val docs = ops.Docs.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(out.length == docs.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val toks = docs(id).split(" ", -1).filter(_.nonEmpty)
      if (toks.length < 2) {
        assert(r.getAs[Long]("n_bigrams") == 0L)
        assert(r.isNullAt(r.fieldIndex("top_ngram")))
      } else {
        val counts = toks.sliding(2).map(_.mkString(" ")).toSeq
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val tot = counts.values.sum
        val (topGram, topN) = counts.toSeq.minBy { case (g, n) => (-n, g) }
        val dup = counts.values.filter(_ > 1).sum
        assert(r.getAs[Long]("n_bigrams") == tot, s"doc $id n_bigrams")
        assert(r.getAs[String]("top_ngram") == topGram, s"doc $id top_ngram")
        assert(r.getAs[Long]("top_n") == topN, s"doc $id top_n")
        assert(math.abs(r.getAs[Double]("top_frac") - topN.toDouble / tot) < 1e-12)
        assert(math.abs(r.getAs[Double]("dup_frac") - dup.toDouble / tot) < 1e-12)
      }
    }
    // the synthetic corpus repeats bigrams heavily — signals must be live
    assert(out.exists(_.getAs[Double]("dup_frac") > 0.0))
  }

  test("embedding_cluster == driver-side argmax over the seed centroids") {
    val out = Similarity.embeddingCluster(spark, sf).collect()
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    assert(out.length == vecs.length)
    val k = Similarity.cellsFor(vecs.length)
    val seeds = vecs.groupBy(_._1 % k).map { case (cls, vs) =>
      cls -> vs.minBy(_._1)._2
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byId = vecs.toMap
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val best = seeds.toSeq.map { case (cls, c) => (cls, cos(byId(id), c)) }
        .minBy { case (cls, s) => (-s, cls) }
      assert(r.getAs[Long]("cluster_id") == best._1, s"vec $id cluster")
      assert(math.abs(r.getAs[Double]("sim") - best._2) < 1e-6, s"vec $id sim")
    }
    // seeds must land in their own cluster at sim ~ 1
    seeds.foreach { case (cls, _) =>
      val seedId = vecs.filter(_._1 % k == cls).minBy(_._1)._1
      val row = out.find(_.getAs[Long]("vec_id") == seedId).get
      assert(math.abs(row.getAs[Double]("sim") - 1.0) < 1e-9)
    }
  }

  test("events_quantiles == brute-force interpolated percentile; approx gate holds") {
    val out = Sessions.eventsQuantiles(spark, sf).collect()
    val vals = Sessions.events(spark, sf)
      .select(col("event_type"), col("value")).as[(String, Double)]
      .collect().groupBy(_._1)
    assert(out.length == vals.size)
    def interp(sorted: Array[Double], q: Double): Double = {
      val pos = q * (sorted.length - 1)
      val lo = pos.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (pos - lo) * (sorted(lo + 1) - sorted(lo))
    }
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      val sorted = vals(t).map(_._2).sorted
      assert(r.getAs[Long]("n") == sorted.length)
      assert(math.abs(r.getAs[Double]("p50") - interp(sorted, 0.5)) < 1e-6, s"$t p50")
      assert(math.abs(r.getAs[Double]("p95") - interp(sorted, 0.95)) < 1e-6, s"$t p95")
      assert(r.getAs[Boolean]("approx_ok"), s"$t sketch outside rank tolerance")
    }
  }

  test("events_retention == brute-force weekly cohort recount") {
    val out = Sessions.eventsRetention(spark, sf).collect()
    val ev = Sessions.events(spark, sf)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .as[(Long, java.time.LocalDateTime)].collect()
    val firstWk = ev.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min(
      Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _)) }
    val expected = ev.map { case (u, wk) =>
      val cohort = firstWk(u)
      (cohort, java.time.Duration.between(cohort, wk).toDays / 7, u)
    }.distinct.groupBy(p => (p._1, p._2)).view.mapValues(_.length.toLong).toMap
    assert(out.length == expected.size)
    out.foreach { r =>
      val key = (r.getAs[java.time.LocalDateTime]("cohort_week"),
        r.getAs[Int]("week_k").toLong)
      assert(expected(key) == r.getAs[Long]("n_active"), s"cell $key")
    }
    // week 0 of every cohort is its full size; fixture spans multiple weeks
    assert(out.exists(_.getAs[Int]("week_k") > 0))
  }

  test("doc_tfidf == brute-force smoothed tf-idf with (score desc, term asc) ties") {
    val out = TextAnalysis.docTfidf(spark, sf).collect()
    val docs = ops.Docs.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val tf = docs.map { case (id, text) =>
      id -> text.split(" ", -1).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    val n = docs.length
    val expected = tf.flatMap { case (id, terms) =>
      terms.toSeq.map { case (t, f) =>
        (id, t, f, f * (math.log((n + 1.0) / (df(t) + 1.0)) + 1.0))
      }.sortBy { case (_, t, _, s) => (-s, t) }.take(TextAnalysis.TfidfTopK)
        .zipWithIndex.map { case ((_, t, f, s), i) => (id, i + 1, t, f, s) }
    }.toSeq
    assert(out.length == expected.size)
    val byKey = expected.map(e => (e._1, e._2) -> e).toMap
    out.foreach { r =>
      val e = byKey((r.getAs[Long]("doc_id"), r.getAs[Int]("rank")))
      assert(r.getAs[String]("term") == e._3, s"term at ${e._1}#${e._2}")
      assert(r.getAs[Long]("tf") == e._4)
      assert(math.abs(r.getAs[Double]("score") - e._5) < 1e-6)
    }
  }

  test("events_anomaly == brute-force z-score from exact sums; all |z| > 3") {
    val out = Sessions.eventsAnomaly(spark, sf).collect()
    val ev = Sessions.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)].collect()
    val byType = ev.groupBy(_._2)
    val expected = ev.flatMap { case (id, t, v) =>
      val vs = byType(t).map(_._3)
      val n = vs.length
      // mirror the engine's exact-decimal sums, then double arithmetic
      val s1 = vs.map(x => BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val s2 = vs.map(x => BigDecimal(x * x).setScale(4, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      val mean = s1 / n
      val sd = math.sqrt((s2 - s1 * s1 / n) / (n - 1))
      val z = (v - mean) / sd
      if (math.abs(z) > Sessions.AnomalyZ) Some(id -> z) else None
    }.toMap
    assert(out.length == expected.size)
    assert(out.nonEmpty, "fixture has no 3-sigma outliers")
    out.foreach { r =>
      val z = expected(r.getAs[Long]("event_id"))
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-6)
      assert(math.abs(r.getAs[Double]("z")) > Sessions.AnomalyZ)
    }
  }

  test("corpus_clean_clustered: one survivor per component, subset of pair-greedy") {
    import graft.ops.Dedup
    val clustered = Dedup.corpusCleanClustered(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val greedy = Dedup.corpusClean(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    // every pair's doc_b is a non-min member of its component, so the
    // cluster-collapse victim set contains the pair-greedy one
    assert(clustered.subsetOf(greedy))
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id"))
    // of each component, exactly the min member may survive
    clusters.groupBy(_._2).foreach { case (cid, members) =>
      val surviving = members.map(_._1).filter(clustered)
      assert(surviving.forall(_ == cid),
        s"non-representative survivor in cluster $cid: $surviving")
    }
    assert(clustered.nonEmpty)
  }

  test("q_pivot: per-priority status columns sum to the priority's order count") {
    val out = ops.SetOps.qPivot(spark, sf).collect()
    val totals = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(out.length == totals.size)
    out.foreach { r =>
      val sum = r.getAs[Long]("n_f") + r.getAs[Long]("n_o") + r.getAs[Long]("n_p")
      assert(sum == totals(r.getAs[String]("o_orderpriority")))
    }
  }

  test("embedding_cluster plan: assignment is map-side (no shuffle before the sort)") {
    // Centroids enter as plan literals; the only exchange in the whole
    // query is the final orderBy's range partitioning.
    val df = Similarity.embeddingCluster(spark, sf)
    df.collect() // finalize the adaptive plan before inspecting it
    val plan = df.queryExecution.executedPlan.toString
    val shuffles =
      "Exchange (SinglePartition|[a-z]+partitioning)".r.findAllIn(plan).toSeq
    assert(shuffles.nonEmpty && shuffles.forall(_.contains("rangepartitioning")),
      s"non-sort exchange in assignment plan:\n$plan")
    assert(!plan.contains("BroadcastExchange"), s"unexpected broadcast:\n$plan")
  }
}
