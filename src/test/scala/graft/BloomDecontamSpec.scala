package graft

import graft.ops.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Bloom-prefiltered decontamination (`corpus_decontam_bloom`). The
  * value check is the exact operator's oracle (the prefilter must not
  * change the result); these specs pin exact-equivalence, the
  * FP-independence that makes the bloom a pure cost optimization, and
  * the plan shape (the prefilter really is in the plan).
  */
class BloomDecontamSpec extends SparkSpec {

  test("bloom variant equals the exact operator row-for-row") {
    val exact = Dedup.corpusDecontam(spark, sf).collect().toSeq
    val bloom = Dedup.corpusDecontamBloom(spark, sf).collect().toSeq
    assert(bloom == exact)
  }

  test("a pathologically small (FP-saturated) filter still yields the exact result") {
    // 64 bits for thousands of eval grams: nearly every corpus gram
    // passes the prefilter, so this degenerates toward the exact
    // operator's work — but the RESULT must be identical, which is
    // what lets the bloom dials be sized for cost alone.
    val exact = Dedup.corpusDecontam(spark, sf).collect().toSeq
    val tiny = Dedup.corpusDecontamBloomWith(spark, sf, 10L, 64L).collect().toSeq
    assert(tiny == exact)
  }

  test("the might_contain prefilter is present in the executed plan") {
    val plan = Dedup.corpusDecontamBloom(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "bloom prefilter missing from the physical plan")
  }
}
