package graft

import graft.ops.Dedup

/** r17 staged pair-graph reuse: the verified near-dup pair graph is
  * built once per corpus snapshot and persisted; the three clean/
  * cluster policies consume the artifact instead of re-deriving the
  * LSH + verify cascade each. Staged must equal inline exactly — the
  * graph is the SAME frame the inline queries derive. */
class PairGraphSpec extends SparkSpec {

  test("pairGraph is built once and reused (persisted, same instance)") {
    val g1 = Dedup.pairGraph(spark, sf)
    val g2 = Dedup.pairGraph(spark, sf)
    assert(g1 eq g2, "second call must return the cached frame")
    assert(g1.storageLevel.useMemory || g1.storageLevel.useDisk,
      s"pair graph must be persisted, got ${g1.storageLevel}")
    assert(g1.columns.toSeq == Seq("doc_a", "doc_b", "jaccard"))
  }

  test("staged consumers ≡ their inline derivations") {
    val cleanInline = Dedup.corpusClean(spark, sf).collect().toSeq
    val cleanStaged = Dedup.corpusCleanStaged(spark, sf).collect().toSeq
    assert(cleanStaged == cleanInline, "corpus_clean staged drifted from inline")

    val clInline = Dedup.dedupClusters(spark, sf).collect().toSeq
    val clStaged = Dedup.dedupClustersStaged(spark, sf).collect().toSeq
    assert(clStaged == clInline, "dedup_clusters staged drifted from inline")

    val ccInline = Dedup.corpusCleanClustered(spark, sf).collect().toSeq
    val ccStaged = Dedup.corpusCleanClusteredStaged(spark, sf).collect().toSeq
    assert(ccStaged == ccInline, "corpus_clean_clustered staged drifted from inline")
  }
}
