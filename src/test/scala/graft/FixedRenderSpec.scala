package graft

import graft.ops.{AllTypes, Pipeline}
import graft.sources.FixedWidth
import org.apache.spark.sql.DataFrame

/** The single-pass renderer against the declarative
  * concat-of-padded-fields formulation: byte-equal on the lineitem
  * fixture (both pad modes) and on the all-ten-type-lanes frame
  * (boolean, Bytes, float, date, timestamp-millis/micros included). */
class FixedRenderSpec extends SparkSpec {

  private def lines(df: DataFrame): Seq[String] = {
    import df.sparkSession.implicits._
    df.as[String].collect().toSeq.sorted
  }

  test("single-pass render ≡ declarative render on lineitem (space + zero pad)") {
    val li = Pipeline.lineitem(spark, sf)
    for (zp <- Seq(false, true)) {
      val fast = lines(li.select(
        FixedWidth.renderValue(Pipeline.lineitemFixed, zp).as("value")))
      val slow = lines(li.select(
        FixedWidth.renderValueDeclarative(Pipeline.lineitemFixed, zp).as("value")))
      assert(fast == slow, s"render mismatch at zeroPad=$zp")
    }
  }

  test("single-pass render ≡ declarative render on all ten type lanes") {
    val src = AllTypes.source(spark, sf)
    val fast = lines(src.select(FixedWidth.renderValue(AllTypes.fixed).as("value")))
    val slow = lines(src.select(
      FixedWidth.renderValueDeclarative(AllTypes.fixed).as("value")))
    assert(fast == slow)
  }

  test("single-pass render: null fields pad full width, wide values raise") {
    import spark.implicits._
    val df = Seq((Some(42L), Some("ab")), (None, None))
      .toDF("f_long", "f_string")
    val schema = graft.schema.FixedSchema.fromJson(
      """{"type":"record","name":"t","fields":[
        |{"name":"f_long","type":{"type":"long","name":"f_long","len":4}},
        |{"name":"f_string","type":{"type":"string","name":"f_string","len":3}}
        |]}""".stripMargin)
    val out = lines(df.select(FixedWidth.renderValue(schema).as("value")))
    assert(out == Seq("       ", "  42ab "))
    val wide = Seq((123456L, "x")).toDF("f_long", "f_string")
    val e = intercept[Exception] {
      wide.select(FixedWidth.renderValue(schema).as("value")).collect()
    }
    assert(e.getMessage != null)
  }
}
