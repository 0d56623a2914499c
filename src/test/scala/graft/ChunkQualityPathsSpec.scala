package graft

import graft.ops.{Relational, Sessions, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the chunking / quality-filter / path-mining /
  * histogram / grouping-sets batch. The value gate is the DuckDB oracle;
  * these specs pin each operator against an INDEPENDENT driver-side
  * recomputation (plain Scala, no Spark expressions), so an engine and
  * oracle that drifted together would still be caught.
  */
class ChunkQualityPathsSpec extends SparkSpec {

  private def toks(text: String): Array[String] =
    text.split(" ", -1).filter(_.nonEmpty)

  test("text_chunk matches a driver-side sliding-window recompute on every doc") {
    val C = TextAnalysis.ChunkSize
    val S = TextAnalysis.ChunkStride
    val docs = ops.Docs.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap
    val expected = docs.toSeq.flatMap { case (id, ts) =>
      val n = ts.length
      val k = if (n <= C) 1 else 1 + (n - C + S - 1) / S
      (0 until k).map { i =>
        val start = i * S
        val len = math.min(C, n - start)
        (id, i.toLong, start.toLong, len.toLong,
          ts.slice(start, start + len).mkString(" "))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextAnalysis.textChunk(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSeq
    assert(got == expected)
  }

  test("text_chunk covers every token exactly: stride-sum reconstruction") {
    val S = TextAnalysis.ChunkStride
    // Sum over chunks of fresh (non-overlapping) tokens = doc token count:
    // chunk 0 contributes all its tokens, chunk i>0 contributes len - (C - S)
    // ... except that short final chunks can be fully covered; the robust
    // invariant is max(tok_start + n_chunk_toks) == n and starts step by S.
    val byDoc = TextAnalysis.textChunk(spark, sf).collect()
      .groupBy(_.getLong(0))
    val nTokens = ops.Docs.documents(spark, sf)
      .select(col("doc_id"), size(ops.Docs.tokens(col("text"))).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.head.getLong(2) == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getLong(2) - a.getLong(2) == S)
        case _ =>
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) == nTokens(id),
        s"doc $id tail coverage")
    }
  }

  test("corpus_quality_filter bitmask matches a driver-side rule recompute") {
    val en = TextAnalysis.En.toSet
    val expected = ops.Docs.documents(spark, sf)
      .select("doc_id", "text").collect().map { r =>
        val ts = toks(r.getString(1))
        val n = ts.length.toLong
        val sumLen = ts.map(_.length.toLong).sum
        val nChars = r.getString(1).length.toLong
        val punct = r.getString(1).count(".,;:!?".contains(_)).toLong
        val cEn = ts.count(en.contains).toLong
        val nTypes = ts.distinct.length.toLong
        var m = 0L
        if (n < TextAnalysis.QfMinTokens) m |= 1
        if (sumLen < n * 2 || sumLen > n * 12) m |= 2
        if (punct * 10 > nChars) m |= 4
        if (cEn == 0) m |= 8
        if (nTypes * 2 < n) m |= 16
        r.getLong(0) -> m
      }.toMap
    val got = TextAnalysis.corpusQualityFilter(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getAs[Long]("reasons") == expected(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("reasons") == 0L))
    }
  }

  test("corpus_lm_score matches a driver-side trigram-LM recompute; filter is live") {
    val out = graft.ops.TextAnalysis.corpusLmScore(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver-side recompute: trigram and prefix counts over trigram
    // starts, fixed-point floor-divided conditional probability,
    // integer keep rule
    val tris = docs.toSeq.flatMap { case (id, text) =>
      val cps = text.codePoints().toArray
      if (cps.length < 3) Nil
      else (0 to cps.length - 3).map(i => id -> new String(cps, i, 3))
    }
    val c3 = tris.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c2 = tris.groupBy { case (_, t) =>
      val cp = t.codePoints().toArray; new String(cp, 0, 2)
    }.view.mapValues(_.size.toLong).toMap
    def p(tri: String): Long = {
      val cp = tri.codePoints().toArray
      graft.ops.TextAnalysis.LmProbScale * c3(tri) / c2(new String(cp, 0, 2))
    }
    val expected = tris.groupBy(_._1).map { case (id, ts) =>
      id -> (ts.size.toLong, ts.map(t => p(t._2)).sum)
    }
    // r18 percentile threshold: the r-th smallest floored integer
    // score, r = (N·LmDropPct) div 100 + 1 — recomputed driver-side
    // with the same exact integer arithmetic.
    val sis = expected.values.map { case (n, sum) => sum / n }.toSeq.sorted
    val rank = (sis.size.toLong * graft.ops.TextAnalysis.LmDropPct / 100 + 1).toInt
    val thr = sis(rank - 1)
    assert(out.length == expected.size)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (n, sum) = expected(id)
      assert(r.getAs[Long]("n_tri") == n, s"doc $id n_tri")
      assert(r.getAs[Long]("score_sum") == sum, s"doc $id score_sum")
      assert(math.abs(r.getAs[Double]("avg_score") - sum.toDouble / n) < 1e-6)
      assert(r.getAs[Boolean]("keep") == (sum / n >= thr), s"doc $id keep")
      // probabilities live on [0, scale] → so does the mean
      assert(r.getAs[Double]("avg_score") >= 0 &&
        r.getAs[Double]("avg_score") <= graft.ops.TextAnalysis.LmProbScale)
    }
    // the filter must be LIVE on the fixture: both keep and drop non-empty
    assert(out.exists(_.getAs[Boolean]("keep")) && out.exists(!_.getAs[Boolean]("keep")),
      "threshold must split the fixture corpus")
  }

  test("corpus_pack_bpe: BPE counts match a driver-side merge-loop recompute") {
    // r18 tokenizer-true lane: sequential rank-order merges, each a
    // literal left-to-right replace on the SEP-joined code points —
    // recomputed here independently (per-code-point list merge, NOT
    // String.replace) so the expression's string representation trick
    // is checked against the actual BPE definition.
    val out = TextAnalysis.corpusPackBpe(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def bpe(text: String): Long = {
      var toks: Vector[String] =
        text.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
      for ((a, b) <- TextAnalysis.BpeMerges) {
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            merged += (a + b); i += 2 // left-to-right, non-overlapping
          } else { merged += toks(i); i += 1 }
        }
        toks = merged.result()
      }
      toks.length.toLong
    }
    assert(out.size == docs.length)
    docs.foreach { case (id, text) =>
      assert(out(id) == bpe(text), s"doc $id BPE count")
    }
    // the lane must actually compress: fewer tokens than characters
    val chars = docs.map(_._2.length.toLong).sum
    assert(out.values.sum < chars, "merges must reduce the token count")
    // and no fixture doc carries the wrapper code points
    assert(docs.forall(d => !d._2.contains('\u0002') && !d._2.contains('\u0003')))
  }

  test("events_top_paths matches a driver-side sequence recompute") {
    val ev = Sessions.events(spark, sf)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tsus"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3)
        .filter(_.length == 3).map(_.mkString(">"))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(Sessions.PathTopK)
      .zipWithIndex.map { case ((p, n), i) => (i + 1, p, n) }
    val got = Sessions.eventsTopPaths(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("events_histogram buckets partition the stream: totals and bounds") {
    val rows = Sessions.eventsHistogram(spark, sf).collect()
    val total = Sessions.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Double]("bucket_lo") ==
        r.getAs[Long]("bucket") * Sessions.HistWidth)
    }
    // every raw value falls inside its computed bucket
    val viol = Sessions.events(spark, sf)
      .select(col("value"), floor(col("value") / Sessions.HistWidth).cast("long").as("b"))
      .where(col("value") < col("b") * Sessions.HistWidth ||
        col("value") >= (col("b") + 1) * Sessions.HistWidth)
      .count()
    assert(viol == 0L)
  }

  test("q_grouping_sets: gid domain, marginal consistency, global row") {
    val rows = Relational.qGroupingSets(spark, sf).collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    assert(gids == Set(0L, 2L, 3L))
    val totalOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    val fine = rows.filter(_.getAs[Long]("gid") == 0L)
    val byStatus = rows.filter(_.getAs[Long]("gid") == 2L)
    val global = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(fine.map(_.getAs[Long]("n_orders")).sum == totalOrders)
    assert(byStatus.map(_.getAs[Long]("n_orders")).sum == totalOrders)
    assert(global.length == 1 && global.head.getAs[Long]("n_orders") == totalOrders)
    // status marginals equal the sum of their fine-grained rows
    val fineByStatus = fine.groupBy(_.getAs[String]("o_orderstatus"))
      .view.mapValues(_.map(_.getAs[Long]("n_orders")).sum).toMap
    byStatus.foreach { r =>
      assert(r.getAs[Long]("n_orders") == fineByStatus(r.getAs[String]("o_orderstatus")))
      assert(r.isNullAt(r.fieldIndex("o_orderpriority")))
    }
  }
}
