package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
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

  // ------------------------------------------------------ near-dup ingest

  /** Streaming NEAR-dup ingest: each micro-batch's documents are
    * minhash-banded and joined against a persisted signature store, so
    * a crawl pipeline rejects near-duplicate re-crawls (boilerplate
    * re-renders, templated mirrors — content exact dedup can't catch)
    * the batch they arrive.
    *
    * Reuses the batch family's exact shapes ([[graft.ops.Dedup]]):
    * `minhashSigs` (the fused one-pass 64-minima expression), `bandSigs`, and the
    * width-capped `bandedCandidates` bucket-grouped pair generator
    * for batch-internal pairs. What crosses batches is the SIGNATURE frame only —
    * (doc_id, 64 longs) ≈ 600 B/doc of metadata, never text — stored
    * as parquet partitioned by `batch_id`:
    *
    *  - '''verification''': candidates are scored by the minhash
    *    agreement fraction ([[graft.ops.Dedup.sigAgreement]]), not
    *    exact jaccard — exact verification would need the shingle sets
    *    (i.e. the corpus text) in state. The estimator's se at 64
    *    permutations is ~0.06; planted near-dups live at j ≥ 0.9 and
    *    distinct docs at j ≈ 0, so the gap is >5 se wide. A pipeline
    *    needing exact-jaccard confirmation runs the batch operator
    *    over the retained corpus as a periodic compaction pass.
    *  - '''idempotent replay''': both sinks write
    *    `dir/batch_id=<id>/` with per-batch overwrite, so a crashed
    *    and replayed micro-batch rewrites its own partitions instead
    *    of duplicating them; candidate matching reads only store
    *    partitions with `batch_id < current` so a half-written crash
    *    partition can never reject its own replay.
    *  - '''bounded state''': the store grows O(retained docs). Like
    *    [[dedupExactStreamBounded]], the production form bounds it by
    *    the re-crawl horizon: [[pruneSignatureStore]] drops batch
    *    partitions older than the horizon (re-crawls cluster in time;
    *    the months-later long tail belongs to the periodic batch dedup
    *    over the stored corpus, not ingest state).
    *
    * Returns the started query; survivors land under
    * `outDir/batch_id=<id>/` with the full document schema. */
  def nearDupIngest(spark: SparkSession, landingDir: String, storeDir: String,
      outDir: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // a typed val picks the Scala foreachBatch overload (the lambda
    // form is ambiguous against the Java VoidFunction2 overload)
    val runBatch: (DataFrame, Long) => Unit =
      (batch, batchId) => nearDupBatch(batch, batchId, storeDir, outDir)
    readDocuments(spark, landingDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(runBatch)
      .start()
  }

  /** One micro-batch of the near-dup ingest (factored out so the spec
    * can also drive it directly). */
  private[graft] def nearDupBatch(batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String): Unit = {
    val spark = batch.sparkSession
    import graft.ops.{Dedup, Docs}
    val sigs = Dedup.minhashSigs(Docs.shingled(batch))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val threshold = Dedup.JaccardThreshold
      val emptyStore = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("old_id", LongType),
          StructField("old_sig", org.apache.spark.sql.types.ArrayType(LongType)))))
      val stored = {
        val p = new org.apache.hadoop.fs.Path(storeDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p) && fs.listStatus(p).nonEmpty)
          // schema comes from the store's own files (we wrote them);
          // batch_id is the partition column — `< batchId` excludes a
          // crashed replay's own half-written partition.
          // ignoreMissingFiles: pruneSignatureStore may delete a
          // beyond-horizon batch partition BETWEEN this read's file
          // listing and its task execution — a pruned partition is by
          // definition no longer needed for rejection, so skipping its
          // vanished files is correct, while the default behavior
          // fails the whole micro-batch with FileNotFoundException.
          try spark.read.option("ignoreMissingFiles", "true").parquet(storeDir)
            .where(col("batch_id") < batchId)
            .select(col("doc_id").as("old_id"), col("sig").as("old_sig"))
          catch {
            // a crash during the FIRST batch's store write can leave
            // only uncommitted debris (_temporary etc.) under storeDir:
            // exists + nonEmpty, yet zero readable footers — schema
            // inference throws, which would wedge the stream on every
            // replay of that batch. Zero committed files means an
            // empty store IS the correct state; any store with >= one
            // committed partition infers fine (and the batch_id filter
            // excludes the debris), so this catch cannot mask a
            // genuinely readable store.
            case e: org.apache.spark.sql.AnalysisException
                if e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" => emptyStore
          }
        else emptyStore
      }
      val newBands = Dedup.bandSigs(sigs)
      val oldBands = Dedup.bandSigs(stored.select(
        col("old_id").as("doc_id"), col("old_sig").as("sig")))
        .select(col("doc_id").as("old_id"), col("band"), col("sig"))
      // vs-store: band collision -> distinct id pair -> agreement gate.
      // The join carries ids only; signatures re-attach per candidate.
      val vsStore = newBands.join(oldBands, Seq("band", "sig"))
        .select(col("doc_id"), col("old_id")).distinct()
        .join(sigs, "doc_id").join(stored, "old_id")
        .where(Dedup.sigAgreement(col("sig"), col("old_sig")) >= threshold)
        .select(col("doc_id"))
      // batch-internal: the capped bucket-grouped pairs; smaller
      // doc_id is the deterministic keeper (unlike dropDuplicates'
      // arbitrary pick)
      val internal = Dedup.bandedCandidates(newBands, "doc_id")
        .join(sigs.select(col("doc_id").as("a"), col("sig").as("sig_a")), "a")
        .join(sigs.select(col("doc_id").as("b"), col("sig").as("sig_b")), "b")
        .where(Dedup.sigAgreement(col("sig_a"), col("sig_b")) >= threshold)
        .select(col("b").as("doc_id"))
      // persisted: BOTH sink writes anti-join against it, and without
      // the pin the store scan + band joins + agreement gates (the
      // dominant per-batch work) would execute twice per micro-batch
      val rejected = vsStore.union(internal).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val kept = batch.join(rejected, Seq("doc_id"), "left_anti")
        kept.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        // only SURVIVORS' signatures enter the store: the corpus the
        // next batch dedups against is the corpus actually retained
        sigs.join(rejected, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      } finally rejected.unpersist()
    } finally sigs.unpersist()
  }

  // ------------------------------------------------- streaming domain cap

  /** Streaming dual of `corpus_domain_cap`: admit at most `k` documents
    * per source, first-come-first-kept. The batch operator sees the
    * whole corpus and prefers LONG documents; an ingest stream must
    * decide at arrival, so the streaming POLICY is arrival order —
    * (micro-batch, doc_id) order, doc_id sorting within a batch making
    * replay deterministic. That policy difference is the documented
    * semantics, not a bug: the batch operator re-curates the stored
    * corpus periodically, the stream bounds what lands in between.
    *
    * State is ONE long per source (admitted count) — bounded by source
    * cardinality, the cheapest state in the whole streaming family;
    * Append mode (an admitted row is final: the count per source only
    * grows, so no emitted row is ever revised). */
  def domainCapStream(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (source: String, rows: Iterator[(Long, String, Long)],
         state: GroupState[Long]) => {
          val admitted = state.getOption.getOrElse(0L)
          // doc_id order within the batch: replay-deterministic
          val take = rows.toSeq.sortBy(_._1)
            .take(math.max(0, k - admitted.toInt))
          state.update(admitted + take.length)
          take.zipWithIndex.iterator.map { case ((id, src, n), i) =>
            (src, id, n, admitted + i + 1) // 1-based admission rank
          }
        })
      .toDF("source", "doc_id", "n_chars", "admit_rank")
  }

  /** Re-crawl-horizon state bound for [[nearDupIngest]]: drop signature
    * partitions for batches before `keepFromBatch`. Run periodically
    * (e.g. from the same scheduler as checkpoint cleanup); the batch
    * ids are monotonically assigned by the stream, so "older than the
    * horizon" is a batch-id cutoff. */
  def pruneSignatureStore(spark: SparkSession, storeDir: String,
      keepFromBatch: Long): Int = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val old = fs.listStatus(root).filter { st =>
      val n = st.getPath.getName
      n.startsWith("batch_id=") &&
        scala.util.Try(n.stripPrefix("batch_id=").toLong).toOption.exists(_ < keepFromBatch)
    }
    old.foreach(st => fs.delete(st.getPath, true))
    old.length
  }
}
