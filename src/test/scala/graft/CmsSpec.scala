package graft

import graft.ops.TextAnalysis

/** Count-min-sketch heavy hitters (`corpus_heavy_hitters_sketch`):
  * the exact columns are oracle-checked; these pin what the oracle
  * cannot see — the CMS contract itself (never an undercount,
  * overshoot ≤ ε·total) on a hand-built sketch, and the determinism
  * that makes the gate a fixed fact of the fixture rather than a
  * flaky probability. */
class CmsSpec extends SparkSpec {

  test("CMS contract on a hand-built sketch: no undercount, bounded overshoot") {
    val eps = 0.01; val conf = 0.999
    val cms = org.apache.spark.util.sketch.CountMinSketch.create(eps, conf, TextAnalysis.CmsSeed)
    val items = Seq.fill(300)("heavy") ++ (1 to 200).map(i => s"tail-$i")
    items.foreach(cms.add)
    val total = cms.totalCount()
    assert(total == 500L)
    val overshoot = math.ceil(eps * total).toLong
    assert(cms.estimateCount("heavy") >= 300L &&
      cms.estimateCount("heavy") <= 300L + overshoot)
    (1 to 200).foreach { i =>
      val e = cms.estimateCount(s"tail-$i")
      assert(e >= 1L && e <= 1L + overshoot, s"tail-$i estimated $e")
    }
  }

  test("the operator's gate holds on the fixture and the output is deterministic") {
    val a = TextAnalysis.corpusHeavyHittersSketch(spark, sf).collect()
    val b = TextAnalysis.corpusHeavyHittersSketch(spark, sf).collect()
    assert(a.length == TextAnalysis.VocabTopK)
    assert(a.forall(_.getBoolean(3)), "CMS gate failed on the fixture")
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "fixed-seed CMS must be run-to-run deterministic")
    // ranks dense, counts non-increasing — the exact half's contract
    assert(a.map(_.getLong(0)).toSeq == (1L to a.length).toSeq)
    val ns = a.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y })
  }
}
