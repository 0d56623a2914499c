package graft.streaming

import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

/** Streaming ingest for embedding vectors: assign each arriving vector
  * to its cluster as it lands — the streaming dual of the batch
  * `embedding_cluster` operator, and the shape an online indexing
  * pipeline needs (route a new vector to its IVF cell / curation
  * bucket at ingest time, not at the next batch rebuild).
  *
  * The index side (seed centroids) is batch-computed over the stored
  * reference corpus and rides the micro-batch plan as LITERALS — the
  * stream is a stateless codegen'd map-side pass: no state store, no
  * watermark, no stream-side shuffle, per-row cost C fused dot
  * products. Identical arithmetic to the batch operator by
  * construction (same [[Similarity.clusterAssignment]] projection), so
  * the DuckDB oracle that value-checks `embedding_cluster` pins this
  * stream too; the spec replays the corpus through the stream and
  * requires exact row agreement with the batch assignment.
  *
  * Centroid refresh is a stream RESTART with new literals (the
  * production cadence for index rebuilds); a mid-flight swap would
  * need a broadcast-join formulation instead — rejected here because
  * the literal plan keeps the hot path in whole-stage codegen.
  */
object EmbedStream {

  /** The embeddings table shape (TESTDATA.md) — static for the same
    * reason as [[DocStream.documentsSchema]]: a file stream must start
    * on an empty landing dir without schema inference. */
  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-source stream over embeddings-shaped parquet. */
  def readEmbeddings(spark: SparkSession, dir: String,
      schema: StructType = embeddingsSchema): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Assign each arriving vector to the nearest seed centroid of the
    * reference corpus at `refDir`. Emits (vec_id, cluster_id, sim) —
    * the batch operator's rows, minus its output sort (meaningless on
    * an unbounded stream). */
  def clusterAssignStream(vecs: DataFrame, refDir: String): DataFrame = {
    val spark = vecs.sparkSession
    Similarity.clusterAssignment(
      Similarity.normedOver(vecs),
      Similarity.seedPivotsFor(spark, refDir))
  }

  /** Streaming index ingest: assign + PQ-encode each arriving vector
    * under the reference corpus's FROZEN dials, emitting the exact
    * index row shape the batch construction produces — (neighbor_id,
    * cell, codes, label). The write side of [[runAnnServe]]'s read
    * side, and the streaming dual of the batch delta extend
    * (`Similarity.ivfPqIndexExtendRows`): a production pipeline sinks
    * these rows into the inverted-list store as vectors land, and
    * re-trains dials on a cadence. Stateless map — centroids and
    * codebook ride the micro-batch plan as reference objects, no
    * state store, no stream-side shuffle; per-row arithmetic
    * IDENTICAL to the batch index build by construction (shared
    * projection), spec-pinned. */
  def indexIngestStream(vecs: DataFrame, refDir: String): DataFrame =
    Similarity.ivfPqIndexRowsOver(vecs.sparkSession, refDir, vecs)

  /** Streaming ANN serving: answer each arriving query vector with its
    * top-k neighbors from `refDir`'s PERSISTED IVFADC index — the
    * online dual of `similarity_ann_ivfpq_staged`, and the shape an
    * embedding-retrieval service actually runs (index built once by
    * the batch pipeline, queries arrive continuously).
    *
    * A query's result depends only on the query vector and the static
    * index — never on other queries — so the retrieval is evaluated
    * PER MICRO-BATCH via foreachBatch over the identical batch
    * machinery ([[graft.ops.Similarity.annServe]]): stream ≡ batch by
    * construction, pinned by the spec against the oracle-checked
    * staged operator. foreachBatch (not a streaming aggregation) is
    * the deliberate choice: the per-query top-k SHOULD finalize when
    * its micro-batch completes — a streaming-agg formulation would
    * hold every query's buffer as unbounded state waiting for a
    * watermark the query stream does not have. */
  def runAnnServe(queries: DataFrame, refDir: String, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = queries.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.Similarity.annServe(batch.sparkSession, refDir, batch)
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
