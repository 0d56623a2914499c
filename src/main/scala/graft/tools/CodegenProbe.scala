package graft.tools

// Probe: AvroDecodeFramed's generated-code null branch (bad magic /
// unknown id) and round-trip through codegen'd AvroEncode.
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.Pipeline
    import graft.functions.{AvroCodec, Confluent}
    val li = Pipeline.lineitem(spark, "/root/testdata/sf0.001")
    val framed = li.select(Confluent.frame(AvroCodec.to_avro(
      struct(Pipeline.lineitemFixed.fields.map(f => col(f.name)): _*),
      Pipeline.lineitemFixed.avroJson), 42).as("value"))
    val withJunk = framed.union(Seq(Array[Byte](7, 7, 7, 7, 7, 7)).toDF("value"))
      .union(framed.limit(2).select(Confluent.frame(Confluent.payload(col("value")), 999).as("value")))
    val dec = withJunk.select(AvroCodec.from_avro_framed(col("value"),
      Map(42 -> Pipeline.lineitemFixed.avroJson),
      Pipeline.lineitemFixed.avroJson, Pipeline.lineitemFixed.sparkSchema).as("r"))
    val n = dec.filter(col("r").isNotNull).count()
    val nulls = dec.filter(col("r").isNull).count()
    println(s"CGPROBE decoded=$n (want 6000) nulls=$nulls (want 3)")

    // pure path (no local-relation union): encode+decode over the scan
    val pure = framed.select(AvroCodec.from_avro_framed(col("value"),
      Map(42 -> Pipeline.lineitemFixed.avroJson),
      Pipeline.lineitemFixed.avroJson, Pipeline.lineitemFixed.sparkSchema).as("r"))
    // '*' stage prefix in the compact plan == WholeStageCodegen fused
    val purePlan = pure.queryExecution.executedPlan.toString
    println(s"CGPROBE pure-fused=${purePlan.startsWith("*(")} rows=${pure.count()}")
    spark.stop()
  }
}
