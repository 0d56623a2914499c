package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** The documents table shape (TESTDATA.md) — supplied statically so
    * the stream can START on an empty landing directory and idle until
    * the first crawl batch arrives (schema inference over an empty dir
    * throws at construction, which is exactly when a production ingest
    * wants to be waiting, not crashing). A stream source must never
    * infer per micro-batch either way. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over documents-shaped parquet. */
  def readDocuments(spark: SparkSession, dir: String,
      schema: StructType = documentsSchema): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** The EARLIER micro-batch's row wins; later duplicates are dropped
    * in whatever micro-batch they arrive. Emits the keeper row
    * (id, hash) — the streaming analogue of dedup_exact's
    * (text_hash, keeper_id) output, without the batch count (a count
    * over an infinite stream is a windowed aggregation, not a dedup).
    *
    * WITHIN one micro-batch the kept row of a duplicate pair is
    * arbitrary (Spark's `dropDuplicates` semantics, partition-order
    * dependent) — it does NOT reproduce the batch operator's
    * min(doc_id) keeper. The cross-batch guarantee is the one an
    * ingest pipeline needs (reject what the corpus already holds); a
    * feed that also needs a deterministic keeper among same-batch
    * twins should pre-reduce each crawl file before landing it, or
    * run the batch operator over the deduplicated corpus. */
  def dedupExactStream(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_hash"))
      .dropDuplicates("text_hash")

  /** The BOUNDED-state form — the one that actually survives 100 TB.
    * [[dedupExactStream]]'s state grows with the number of distinct
    * texts ever seen (~16 B x 100 B docs ≈ 1.6 TB of state store for a
    * web-scale corpus — the state becomes the problem it was solving);
    * this variant holds state only within `horizon` of the watermark
    * over the stream's arrival-time column, i.e. it dedups against the
    * re-crawl window, which is the guarantee a crawl pipeline actually
    * relies on (re-crawls cluster in time; a months-later re-crawl is
    * handled by the periodic batch dedup over the stored corpus, not
    * by ingest state). Late rows beyond the watermark are dropped by
    * the engine like any watermarked operator. */
  def dedupExactStreamBounded(docs: DataFrame, arrivalCol: String,
      horizon: String): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_hash"),
        col(arrivalCol).cast(TimestampType).as("arrived_at"))
      .withWatermark("arrived_at", horizon)
      .dropDuplicatesWithinWatermark("text_hash")
}
