package graft

import graft.ops.{Multimodal, Pipeline}
import graft.parse.{FixedWidthParser, Strict}
import graft.schema.FixedSchema
import org.apache.spark.sql.functions._

/** Unit vectors for strict corrupt-record validation (F5/F8) and the
  * multimodal partition-batched feature extraction. */
class CorruptAndMultimodalSpec extends SparkSpec {

  private val schema = FixedSchema.fromJson(
    """{"type":"record","name":"r","fields":[
      |{"name":"a","type":{"type":"long","name":"a","len":4}},
      |{"name":"b","type":{"type":"string","name":"b","len":3}}
      |]}""".stripMargin) // row rune length 7

  private def parse(lines: String*): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    FixedWidthParser.parse(lines.toDF("value"), schema,
      corruptCol = Some("_corrupt_record")).collect().toSeq
  }

  test("exact-length line parses, corrupt column null") {
    val Seq(r) = parse("  42abc")
    assert(r.getAs[Long]("a") == 42L && r.getAs[String]("b") == "abc")
    assert(r.getAs[String]("_corrupt_record") == null)
  }

  test("short line (F5) -> all-null row + raw line captured") {
    val Seq(r) = parse("  42a")
    assert(r.isNullAt(r.fieldIndex("a")) && r.isNullAt(r.fieldIndex("b")))
    assert(r.getAs[String]("_corrupt_record") == "  42a")
  }

  test("over-long line -> corrupt (would silently mis-slice otherwise)") {
    val Seq(r) = parse("  42abcXX")
    assert(r.isNullAt(r.fieldIndex("a")))
    assert(r.getAs[String]("_corrupt_record") == "  42abcXX")
  }

  test("multibyte line: rune length governs, not byte length (F4)") {
    val Seq(r) = parse("  42äöü") // 7 runes, 10 UTF-8 bytes
    assert(r.getAs[Long]("a") == 42L && r.getAs[String]("b") == "äöü")
    assert(r.getAs[String]("_corrupt_record") == null)
  }

  test("without corruptCol short lines parse best-effort (reference-shaped)") {
    import spark.implicits._
    val out = FixedWidthParser.parse(Seq("  42a").toDF("value"), schema, Strict).collect()
    assert(out.head.getAs[Long]("a") == 42L) // first field intact
    assert(out.head.getAs[String]("b") == "a") // remainder, no stale-buffer garbage
  }

  test("multimodal feature extraction is deterministic and batch-shaped") {
    val a = Multimodal.extractFeatures(spark, sf).collect().sortBy(_.media_id)
    val b = Multimodal.extractFeatures(spark, sf).collect().sortBy(_.media_id)
    assert(a.length == b.length && a.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_id == y.media_id && x.features.toSeq == y.features.toSeq)
      assert(x.features.length == Multimodal.FeatureDim)
      // histogram-derived features: non-negative, bounded by 2 bucket shares
      assert(x.features.forall(f => f >= 0f && f <= 2f))
      assert(x.n_bytes > 0 && x.width >= 1 && x.height >= 1)
    }
  }

  test("multimodal resize is deterministic and honors the dimension contract") {
    val a = Multimodal.multimodalResize(spark, sf).collect()
    val b = Multimodal.multimodalResize(spark, sf).collect()
    assert(a.toSeq == b.toSeq && a.length == 500)
    a.foreach { r =>
      val (srcW, outW, outH) = (r.getAs[Int]("src_w"), r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(outW == outH && outW >= 1 && outW <= Multimodal.ResizeTarget && outW <= srcW)
      assert(r.getAs[String]("out_md5").length == 32)
    }
  }

  test("multimodal frame sampling: every SampleEvery-th frame, byte-true slices") {
    val rows = Multimodal.multimodalFrameSample(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Int]("frame_idx") % Multimodal.SampleEvery == 0))
    assert(rows.forall(r => r.getAs[Long]("frame_len") >= 1 &&
      r.getAs[Long]("frame_len") <= Multimodal.FrameBytes))
    // frame 0 of a media equals the md5 of its first FrameBytes bytes
    val m = Multimodal.media(spark, sf)
      .select(col("media_id"), md5(expr(s"substring(content, 1, ${Multimodal.FrameBytes})")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.filter(_.getAs[Int]("frame_idx") == 0).foreach { r =>
      assert(r.getAs[String]("frame_md5") == m(r.getAs[Long]("media_id")))
    }
  }

  test("multimodal meta matches the binary content actually staged") {
    val m = Multimodal.media(spark, sf)
      .select(col("media_id"), md5(col("content")).as("h"), col("meta.n_bytes").as("n"))
      .collect()
    assert(m.length == 500)
    m.foreach { r => assert(r.getAs[String]("h").length == 32 && r.getAs[Long]("n") > 0) }
  }

  test("alltypes roundtrip covers every reference type lane") {
    val out = ops.AllTypes.alltypesRoundtrip(spark, sf)
    val types = out.schema.fields.map(f => f.dataType.typeName).toSet
    assert(Set("boolean", "integer", "long", "float", "double", "string",
      "date").subsetOf(types))
    assert(out.count() == Pipeline.lineitem(spark, sf).count())
  }
}
