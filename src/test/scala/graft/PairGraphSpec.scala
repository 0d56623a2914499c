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

  test("incremental extend ≡ full rebuild on a two-delta corpus split") {
    // r18: the batch dual of the streaming signature store. Split the
    // fixture by doc_id parity — planted near-dup pairs cross the
    // split, so the extension must find delta↔base pairs, not just
    // delta↔delta — and check (base graph ∪ extend) equals the full
    // cascade over the whole corpus, row for row.
    import graft.ops.Docs
    import org.apache.spark.sql.functions.col
    val docs = Docs.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 2 === 0)
    val delta = docs.filter(col("doc_id") % 2 =!= 0)
    def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val baseGraph = rows(Dedup.pairGraphOver(Docs.shingled(base)))
    val ext = rows(Dedup.pairGraphExtend(Dedup.bandStoreOf(base), docs, delta))
    val full = rows(Dedup.pairGraphOver(Docs.shingled(docs)))
    assert(baseGraph.intersect(ext).isEmpty,
      "extension must only produce pairs touching the delta")
    assert(ext.nonEmpty, "parity split must cross some planted near-dup pairs")
    assert(baseGraph.union(ext) == full,
      s"incremental drifted from rebuild: missing ${full -- baseGraph -- ext}, " +
        s"extra ${(baseGraph ++ ext) -- full}")
  }

  test("band store artifact round-trips through the index store") {
    val root = java.nio.file.Files.createTempDirectory("graft-bandstore").toString
    val prev = spark.conf.get(graft.ops.IndexStore.RootConf,
      graft.ops.IndexStore.DefaultRoot)
    spark.conf.set(graft.ops.IndexStore.RootConf, root)
    try {
      val b0 = graft.ops.IndexStore.builds.get()
      val s1 = Dedup.bandStore(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(graft.ops.IndexStore.builds.get() == b0 + 1)
      val s2 = Dedup.bandStore(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
      assert(graft.ops.IndexStore.builds.get() == b0 + 1, "second call must load")
      assert(s1 == s2)
      assert(s1.nonEmpty)
    } finally spark.conf.set(graft.ops.IndexStore.RootConf, prev)
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
