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
    * On a real corpus this is the schema media already arrives in.
    * Deliberately NOT [[Docs.fanned]]: this sandbox's decode step is a
    * deterministic stub (see the class doc), so the per-row work is
    * too cheap to pay for an exchange of the content bytes — measured
    * +58% on multimodal_features when fanned. A REAL image/audio
    * decode inverts that trade instantly; swap in `Docs.fanned` (or
    * fan after [[media]]) when wiring real codecs, exactly like the
    * text families. */
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

    /** STUB resize — stands in for a pixel-resampling kernel: nearest-
      * neighbor decimation of the "decoded" byte plane to a target
      * side. Deterministic; real codecs swap in behind the same
      * signature (bytes in, resized bytes + dims out). */
    def resize(bytes: Array[Byte], targetSide: Int): (Int, Int, Array[Byte]) = {
      val srcSide = math.max(1, math.sqrt(bytes.length.toDouble).toInt)
      val side = math.min(targetSide, srcSide)
      val out = new Array[Byte](side * side)
      var y = 0
      while (y < side) {
        var x = 0
        while (x < side) {
          val sx = x * srcSide / side
          val sy = y * srcSide / side
          val idx = sy * srcSide + sx
          out(y * side + x) = if (idx < bytes.length) bytes(idx) else 0
          x += 1
        }
        y += 1
      }
      (side, side, out)
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

  case class ResizedMedia(media_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, out_md5: String)

  val ResizeTarget = 16

  /** Partition-batched resize lane (same shape as [[extractFeatures]]:
    * one decoder per partition, streaming iterator). Oracle-checked:
    * nearest-neighbor decimation indices satisfy `sy*src+sx <= src²-1
    * <= n-1`, so the zero-fill branch never fires on non-empty content
    * and the resized plane is a pure character permutation DuckDB can
    * rebuild and md5 over the ASCII fixture (empty content — absent
    * here — is the hardcoded md5 of one NUL byte). */
  def resizeMedia(spark: SparkSession, dir: String): Dataset[ResizedMedia] = {
    import spark.implicits._
    media(spark, dir)
      .select(col("media_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new FakeDecoder
        val md5 = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          val srcSide = math.max(1, math.sqrt(bytes.length.toDouble).toInt)
          val (w, h, out) = decoder.resize(bytes, ResizeTarget)
          md5.reset()
          ResizedMedia(id, srcSide, srcSide, w, h,
            md5.digest(out).map("%02x".format(_)).mkString)
        }
      }
  }

  def multimodalResize(spark: SparkSession, dir: String): DataFrame =
    resizeMedia(spark, dir).toDF().orderBy("media_id")

  val multimodalResizeOracle: String =
    s"""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
       |p AS (SELECT media_id, text, n,
       |             greatest(CAST(floor(sqrt(n)) AS INTEGER), 1) AS src FROM m),
       |q AS (SELECT media_id, text, n, src, least($ResizeTarget, src) AS side FROM p),
       |r AS (SELECT media_id, n, src, side,
       |             CASE WHEN n = 0 THEN '93b885adfe0da089cdf634904fd59f71'
       |                  ELSE md5(array_to_string(list_transform(range(0, side*side),
       |                       i -> substr(text, CAST(((i // side) * src // side) * src + ((i % side) * src // side) + 1 AS INTEGER), 1)), ''))
       |             END AS out_md5
       |      FROM q)
       |SELECT media_id, CAST(src AS INTEGER) AS src_w, CAST(src AS INTEGER) AS src_h,
       |       CAST(side AS INTEGER) AS out_w, CAST(side AS INTEGER) AS out_h, out_md5
       |FROM r ORDER BY media_id""".stripMargin

  /** Feature query — oracle-checked: the stub decode is a high-nibble
    * byte histogram folded to 8 float ratios, and on the pure-ASCII
    * fixture DuckDB can mirror it exactly — per-nibble char-class counts
    * via regex, the SAME float32 arithmetic (DuckDB REAL division and
    * addition are true float32), then one exact float→double widening
    * before the rounded output. All 8 feature slots are emitted; on this
    * corpus the punctuation/lowercase buckets (f2, f6, f7) carry real
    * signal. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      .select(Seq(col("media_id"), col("mime"), col("n_bytes"),
        col("width"), col("height")) ++
        (0 until FeatureDim).map(i =>
          round(element_at(col("features"), i + 1)
            .cast(org.apache.spark.sql.types.DoubleType), 6).as(s"f$i")): _*)
      .orderBy("media_id")

  /** DuckDB mirror of [[FakeDecoder.decode]] over ASCII content: char
    * class `[\x{k0}-\x{kf}]` counts == high-nibble byte histogram, REAL
    * (float32) ratio arithmetic == the decoder's Float fold. */
  val multimodalFeaturesOracle: String = {
    def bucket(k: Int) =
      f"(n - length(regexp_replace(text, '[\\x${16 * k}%02x-\\x${16 * k + 15}%02x]', '', 'g')))"
    val feats = (0 until FeatureDim).map { j =>
      s"round(CAST(CAST(${bucket(j)} AS REAL)/CAST(n AS REAL) + " +
        s"CAST(${bucket(j + 8)} AS REAL)/CAST(n AS REAL) AS DOUBLE), 6) AS f$j"
    }.mkString(",\n       ")
    s"""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents)
       |SELECT media_id, 'text/plain' AS mime, CAST(n AS BIGINT) AS n_bytes,
       |       CAST(greatest(CAST(floor(sqrt(n)) AS INTEGER), 1) AS INTEGER) AS width,
       |       CAST(greatest(CAST(floor(sqrt(n)) AS INTEGER), 1) AS INTEGER) AS height,
       |       $feats
       |FROM m ORDER BY media_id""".stripMargin
  }

  // ------------------------------------------------------ frame sampling

  /** Stub "video" frame geometry: content is treated as fixed-size
    * frames of FrameBytes, and every SampleEvery-th frame is kept —
    * the standard decimation step before feature extraction. The
    * sampling itself is fully declarative (byte-true `substring` over
    * the binary content, exploded frame indices): no codec involved,
    * so unlike the decode stub this lane IS oracle-checked. */
  val FrameBytes = 64
  val SampleEvery = 4

  def multimodalFrameSample(spark: SparkSession, dir: String): DataFrame = {
    val lastSample =
      expr(s"CAST((greatest(meta.n_bytes, 1) - 1) div $FrameBytes AS INT) div $SampleEvery")
    val frame = expr(s"substring(content, frame_idx * $FrameBytes + 1, $FrameBytes)")
    media(spark, dir)
      .select(col("media_id"), col("content"),
        posexplode(transform(sequence(lit(0), lastSample), k => (k * SampleEvery)))
          .as(Seq("pos", "frame_idx")))
      .select(col("media_id"), col("frame_idx").cast("int").as("frame_idx"),
        length(frame).cast(LongType).as("frame_len"),
        md5(frame).as("frame_md5"))
      .orderBy("media_id", "frame_idx")
  }

  /** Oracle note: the engine slices BYTES of the opaque content; the
    * fixture's documents are pure ASCII (verified), so the oracle's
    * VARCHAR substring is byte-identical. A non-ASCII corpus would need
    * a blob-capable oracle, not a different engine plan. */
  val multimodalFrameSampleOracle: String =
    s"""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS n FROM documents),
       |f AS (SELECT media_id, text,
       |             unnest(list_transform(range(0, (greatest(n, 1) - 1) // $FrameBytes // $SampleEvery + 1),
       |                                   k -> k * $SampleEvery)) AS frame_idx
       |      FROM m)
       |SELECT media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |       CAST(length(substring(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS BIGINT) AS frame_len,
       |       md5(substring(text, frame_idx * $FrameBytes + 1, $FrameBytes)) AS frame_md5
       |FROM f ORDER BY media_id, frame_idx""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_frame_sample" -> (multimodalFrameSample _),
  )

  def oracleSql: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaOracle,
    "multimodal_features" -> multimodalFeaturesOracle,
    "multimodal_resize" -> multimodalResizeOracle,
    "multimodal_frame_sample" -> multimodalFrameSampleOracle,
  )
}
