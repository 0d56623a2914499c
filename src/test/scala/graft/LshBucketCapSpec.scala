package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** The LSH bucket-width cap: a degenerate corpus (mass-identical band
  * signatures) must NOT produce a quadratic candidate self-join — the
  * oversized bucket is skipped and reported via the "lsh_buckets"
  * observation, while normal-width buckets pair up unaffected. */
class LshBucketCapSpec extends SparkSpec {

  test("oversized bucket is skipped; normal buckets pair; drop is observed") {
    import spark.implicits._
    val degenerate = (1L to (Dedup.MaxBucketWidth + 100L))
      .map(id => (id, 0, "same-sig"))
    val normal = (100001L to 100005L).map(id => (id, 1, "small-sig"))
    val banded = (degenerate ++ normal).toDF("doc_id", "band", "sig")
    val out = Dedup.bandedCandidates(banded, "doc_id")
    val pairs = out.collect()
    // 5-member bucket: C(5,2)=10 pairs; the 1124-member bucket: none
    // (without the cap it alone would emit ~631k pairs)
    assert(pairs.length == 10)
    assert(pairs.forall(r => r.getLong(0) > 100000L && r.getLong(1) > 100000L))
    val metrics = out.queryExecution.observedMetrics("lsh_buckets")
    assert(metrics.getAs[Long]("dropped_rows") == Dedup.MaxBucketWidth + 100L)
    assert(metrics.getAs[Long]("widest_bucket") == Dedup.MaxBucketWidth + 100L)
  }

  test("strict mode fails loudly on an oversized bucket instead of dropping") {
    import spark.implicits._
    val degenerate = (1L to (Dedup.MaxBucketWidth + 10L)).map(id => (id, 0, "same-sig"))
    val banded = degenerate.toDF("doc_id", "band", "sig")
    spark.conf.set(Dedup.StrictCapConf, "true")
    try {
      val e = intercept[Exception](Dedup.bandedCandidates(banded, "doc_id").collect())
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("LSH bucket wider than cap")),
        s"unexpected failure: ${messages(e).mkString(" | ")}")
    } finally spark.conf.unset(Dedup.StrictCapConf)
  }

  test("bucket exactly at MaxBucketWidth still pairs (cap is exclusive)") {
    import spark.implicits._
    val banded = (1L to Dedup.MaxBucketWidth.toLong)
      .map(id => (id, 0, "edge")).toDF("doc_id", "band", "sig")
    val n = Dedup.MaxBucketWidth.toLong
    assert(Dedup.bandedCandidates(banded, "doc_id").count() == n * (n - 1) / 2)
  }
}
