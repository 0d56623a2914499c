package graft

import graft.functions.CappedCollect
import graft.functions.CappedCollect.CappedIdsBuffer
import org.apache.spark.sql.functions._

/** `capped_sorted_ids`: ≡ `sort_array(collect_list)` for under-cap
  * groups, count-only past the cap, and — the point — aggregation
  * state bounded at cap ids no matter how hot the group. */
class CappedCollectSpec extends SparkSpec {

  test("under-cap groups: identical to sort_array(collect_list), width = count") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (rnd.nextInt(20), rnd.nextLong().abs))
    val df = rows.toDF("g", "id")
    val got = df.groupBy("g")
      .agg(CappedCollect.capped_sorted_ids(col("id"), 1000).as("bkt"))
      .select(col("g"), col("bkt.width").as("w"), col("bkt.ids").as("ids"))
    val want = df.groupBy("g")
      .agg(count(lit(1)).as("w"), sort_array(collect_list(col("id"))).as("ids"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("over-cap groups carry the true width and an empty id array") {
    import spark.implicits._
    val df = ((1L to 50L).map(i => ("hot", i)) ++ Seq(("cold", 1L), ("cold", 2L)))
      .toDF("g", "id")
    val out = df.groupBy("g")
      .agg(CappedCollect.capped_sorted_ids(col("id"), 8).as("bkt"))
      .select(col("g"), col("bkt.width"), col("bkt.ids"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Long](2))).toMap
    assert(out("hot") == (50L, Seq.empty[Long]))
    assert(out("cold") == (2L, Seq(1L, 2L)))
  }

  test("buffer state stays bounded past the cap (the OOM guard itself)") {
    val buf = new CappedIdsBuffer(16)
    (1L to 1000000L).foreach(buf.add)
    assert(buf.count == 1000000L)
    assert(buf.n == 0 && buf.ids.length == 0, "overflowed buffer must hold zero ids")

    // merge of an overflowed partial into a small one: count is monotone,
    // so the merged buffer must ALSO drop its ids
    val small = new CappedIdsBuffer(16)
    (1L to 4L).foreach(small.add)
    small.mergeFrom(buf)
    assert(small.count == 1000004L && small.n == 0 && small.ids.length == 0)

    // two under-cap partials merge losslessly
    val a = new CappedIdsBuffer(16); (1L to 5L).foreach(a.add)
    val b = new CappedIdsBuffer(16); (6L to 9L).foreach(b.add)
    a.mergeFrom(b)
    assert(a.count == 9L && a.ids.take(a.n).sorted.toSeq == (1L to 9L))
  }

  test("cap conf reaches the LSH candidate stage") {
    import spark.implicits._
    val banded = (1L to 5L).map(id => (id, 0, "sig")).toDF("doc_id", "band", "sig")
    spark.conf.set(graft.ops.Dedup.BucketCapConf, "4")
    try {
      assert(graft.ops.Dedup.bandedCandidates(banded, "doc_id").count() == 0,
        "a 5-wide bucket must be dropped under cap=4")
    } finally spark.conf.unset(graft.ops.Dedup.BucketCapConf)
    assert(graft.ops.Dedup.bandedCandidates(banded, "doc_id").count() == 10,
      "default cap keeps the 5-wide bucket (C(5,2)=10 pairs)")
  }
}
