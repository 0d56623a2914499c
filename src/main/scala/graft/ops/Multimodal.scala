package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multimodal-column plumbing: media as opaque `binary` content plus a
  * typed metadata struct, with decode/feature-extraction running as a
  * partition-batched pipeline.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic fake ([[FakeDecoder]]) — what is real
  * and tested is everything Spark-side: the schema (binary + metadata
  * struct), the partition-batched execution shape (mapPartitions over an
  * iterator, one decoder instance per partition — the Scala dual of
  * `mapInPandas` batch processing), the fixed-width feature vector
  * contract, and the deterministic outputs.
  *
  * `media` content is derived from `documents.text` bytes so the fixture
  * tables stay the only input.
  */
object Multimodal {

  /** Stage the documents as media rows: opaque content bytes + metadata.
    * On a real corpus this is the schema media already arrives in. */
  def media(spark: SparkSession, dir: String): DataFrame =
    Docs.documents(spark, dir).select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(encode(col("text"), "UTF-8")).cast(LongType).as("n_bytes"),
        col("source").as("origin")).as(("meta")))

  /** Metadata/integrity projection — pure expressions, oracle-checked:
    * content length and md5 digest of the opaque bytes. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    media(spark, dir).select(
      col("media_id"),
      col("meta.mime").as("mime"),
      col("meta.n_bytes").as("n_bytes"),
      md5(col("content")).as("content_md5"))
      .orderBy("media_id")

  val multimodalMetaOracle: String =
    """SELECT doc_id AS media_id, 'text/plain' AS mime,
      |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
      |       md5(text) AS content_md5
      |FROM documents ORDER BY media_id""".stripMargin

  /** One decoded media item: the fixed feature-vector contract every
    * downstream consumer (dedup, ANN, training export) relies on. */
  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int, height: Int,          // fake "decoded" dimensions
      features: Array[Float])           // fixed FeatureDim-length vector

  val FeatureDim = 8

  /** STUB decoder — stands in for an image/audio codec, which this
    * container does not ship. Deterministic by construction: "decode"
    * derives dimensions from the byte length and "features" from a
    * 16-bucket byte histogram folded to FeatureDim floats. The partition
    * batch shape (reusable per-partition instance, iterator in/out, no
    * per-row setup) is exactly what a real codec needs. */
  final class FakeDecoder extends Serializable {
    def decode(id: Long, mime: String, bytes: Array[Byte]): MediaFeatures = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xf0) >> 4) += 1; i += 1 }
      val features = new Array[Float](FeatureDim)
      var k = 0
      while (k < 16) {
        features(k % FeatureDim) += (if (bytes.length == 0) 0f
          else hist(k).toFloat / bytes.length)
        k += 1
      }
      val side = math.max(1, math.sqrt(bytes.length.toDouble).toInt)
      MediaFeatures(id, mime, bytes.length.toLong, side, side, features)
    }
  }

  /** Partition-batched decode + feature extraction: one decoder per
    * partition, streaming iterator — rows never buffered per-partition.
    * (mapPartitions is justified here: a codec is imperative per-item
    * work with per-partition setup cost, the documented last-resort
    * case; everything around it stays declarative.) */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    media(spark, dir)
      .select(col("media_id"), col("meta.mime").as("mime"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new FakeDecoder
        rows.map { case (id, mime, bytes) => decoder.decode(id, mime, bytes) }
      }
  }

  /** Feature query (rows-only check: the fake decode is not
    * SQL-expressible; determinism + shape are pinned by MultimodalSpec). */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      .select(col("media_id"), col("mime"), col("n_bytes"), col("width"), col("height"),
        round(element_at(col("features"), 1), 6).as("f0"),
        round(element_at(col("features"), 2), 6).as("f1"))
      .orderBy("media_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_features" -> (multimodalFeatures _),
  )

  def oracleSql: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaOracle,
    // multimodal_features: stub decode → rows-only check (see Scaladoc).
  )
}
