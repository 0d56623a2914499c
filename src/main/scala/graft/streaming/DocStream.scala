package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming front of the corpus-dedup family: documents arriving as a
  * file stream (new parquet files in a watched directory ≡ a crawl
  * batch landing), exact-deduplicated on content hash across
  * micro-batches.
  *
  * The batch operator ([[graft.ops.Dedup.dedupExact]]) is one
  * hash-groupBy; the streaming twin is the same hash projection over
  * `dropDuplicates` state, so an ingest pipeline can reject re-crawled
  * duplicates the moment they arrive instead of re-scanning the corpus
  * per batch. State is one small row per DISTINCT hash — the same
  * O(distinct) footprint the batch groupBy shuffles, held in the state
  * store and recovered from the checkpoint on restart (exactly-once per
  * document across restarts, pinned in StreamingSpec).
  *
  * A production ingest with an arrival-time column should swap in
  * `dropDuplicatesWithinWatermark` to bound state by the re-crawl
  * horizon; the fixture documents carry no event time, so the
  * unbounded-state form is the honest dual here. */
object DocStream {

  /** File-source stream over documents-shaped parquet. Schema comes
    * from one driver-side footer read of the seed directory — a stream
    * source must never infer per micro-batch. */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)

  /** First arrival of each distinct text wins; later duplicates are
    * dropped in whatever micro-batch they arrive. Emits the keeper row
    * (id, hash) — the streaming analogue of dedup_exact's
    * (text_hash, keeper_id) output, without the batch count (a count
    * over an infinite stream is a windowed aggregation, not a dedup). */
  def dedupExactStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
      .dropDuplicates("text_hash")
}
