package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dedup_containment` — asymmetric near-duplication. Values are
  * oracle-checked; these pin the case the operator EXISTS for (a
  * short document embedded in a long one: containment ≈ 1, symmetric
  * Jaccard far below the resemblance family's threshold), the
  * orientation contract, and the boilerplate cap.
  */
class ContainmentSpec extends SparkSpec {

  private def docsDir(rows: Seq[(Long, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    rows.toDF("doc_id", "text", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("a quote inside an article: containment finds it, resemblance cannot") {
    // article: 200 distinct words; quote: a 30-word contiguous slice.
    // Trigram Jaccard ≈ 28/198 ≈ 0.14 — far under dedup_minhash's 0.5
    // threshold — while every quote trigram appears in the article.
    val words = (0 until 200).map(i => s"w$i")
    val article = words.mkString(" ")
    val quote = words.slice(100, 130).mkString(" ")
    val dir = docsDir(Seq(
      (1L, quote, "s0", quote.length.toLong),
      (2L, article, "s0", article.length.toLong)))
    val out = Dedup.dedupContainment(spark, dir).collect()
    assert(out.length == 1, s"expected exactly the quote⊂article pair, got ${out.toSeq}")
    val r = out.head
    assert(r.getLong(0) == 1L, "contained_id must be the quote")
    assert(r.getLong(1) == 2L, "container_id must be the article")
    assert(r.getDouble(2) == 1.0, s"full containment expected, got ${r.getDouble(2)}")
    // and the resemblance operator rejects the same pair
    assert(Dedup.dedupMinhash(spark, dir).count() == 0L,
      "dedup_minhash should NOT fire on a low-jaccard containment pair")
  }

  test("orientation: the smaller shingle set is always the contained side") {
    val rows = Dedup.dedupContainment(spark, sf).collect()
    assert(rows.nonEmpty, "fixture near-dups must surface as containment pairs")
    val sizes = graft.ops.Docs.shingled(
        spark.read.parquet(s"$sf/documents.parquet"))
      .select(col("doc_id"), size(col("sh")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(sizes(a) < sizes(b) || (sizes(a) == sizes(b) && a < b),
        s"pair ($a, $b) mis-oriented: sizes ${sizes(a)} vs ${sizes(b)}")
      assert(r.getDouble(2) >= Dedup.ContainmentThreshold)
    }
  }

  test("ubiquitous spans never generate candidate pairs (df cap)") {
    // every doc shares one 30-char boilerplate header (its sampled
    // spans have df = 100 > SpanDfCap) but unique bodies: no pair may
    // form through the header alone
    val header = "common boilerplate header text that repeats everywhere"
    val docs = (1L to 100L).map { i =>
      val body = (0 until 50).map(j => s"unique${i}word$j").mkString(" ")
      (i, s"$header $body", "s0", 1L)
    }
    val dir = docsDir(docs)
    assert(Dedup.dedupContainment(spark, dir).count() == 0L,
      "boilerplate header paired unrelated documents — the df cap failed")
  }
}
