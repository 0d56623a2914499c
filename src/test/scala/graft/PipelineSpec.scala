package graft

import graft.functions.{AvroCodec, Confluent}
import graft.ops.Pipeline
import graft.sinks.KafkaStage
import graft.sources.Ocf
import org.apache.spark.sql.functions._

/** End-to-end pipeline legs on sf0.001 (SURVEY.md §7.2). */
class PipelineSpec extends SparkSpec {

  // Total order over ALL columns — (l_orderkey, l_linenumber) is not
  // unique in the fixture, and the queries sort by every column.
  lazy val truth = Pipeline.lineitem(spark, sf)
    .orderBy(Pipeline.lineitemFixed.fields.map(f => col(f.name)): _*)
  lazy val truthRows = truth.collect()

  test("fixed-width render → strict parse is the identity on lineitem") {
    val got = Pipeline.fixedwidthRoundtrip(spark, sf).collect()
    assert(got.length == truthRows.length)
    assert(got.sameElements(truthRows))
  }

  test("fixed-width file write → distributed text scan → parse is the identity") {
    val got = Pipeline.fixedwidthFileScan(spark, sf).collect()
    assert(got.sameElements(truthRows))
  }

  test("avro encode → confluent frame → unframe → decode is the identity") {
    val got = Pipeline.avroRoundtrip(spark, sf).collect()
    assert(got.sameElements(truthRows))
  }

  test("ocf write (snappy, file-per-partition) → read is the identity") {
    val got = Pipeline.ocfRoundtrip(spark, sf).collect()
    assert(got.sameElements(truthRows))
  }

  test("kafka stage → consumer decode is the identity; frame layout is Confluent") {
    val got = Pipeline.kafkaRoundtrip(spark, sf).collect()
    assert(got.sameElements(truthRows))
  }

  test("confluent golden bytes: magic 0x00 + big-endian id (producer.go:201-207)") {
    assert(Confluent.prefixBytes(2).toSeq == Seq[Byte](0, 0, 0, 0, 2))
    assert(Confluent.prefixBytes(0x01020304).toSeq == Seq[Byte](0, 1, 2, 3, 4))
    val df = spark.range(1).select(
      Confluent.frame(lit(Array[Byte](9, 9)), 0x01020304).as("v"))
    val r = df.select(Confluent.schemaId(col("v")).as("id"),
      Confluent.hasMagic(col("v")).as("m"),
      Confluent.payload(col("v")).as("p")).head()
    assert(r.getInt(0) == 0x01020304 && r.getBoolean(1))
    assert(r.getAs[Array[Byte]](2).toSeq == Seq[Byte](9, 9))
  }

  test("staged kafka key is the Avro-framed literal \"string\" (F10)") {
    assert(KafkaStage.KeyBytes.toSeq ==
      (Seq(0x0c.toByte) ++ "string".getBytes("UTF-8").toSeq))
    val registry = new graft.registry.InMemorySchemaRegistry
    val (keyId, valueId) = KafkaStage.registerSubjects(registry, "t", Pipeline.lineitemFixed)
    assert(registry.getById(keyId) == "\"string\"")
    val staged = KafkaStage.stage(Pipeline.lineitem(spark, sf).limit(1),
      Pipeline.lineitemFixed, valueId, "t", keyId)
    val row = staged.head()
    val key = row.getAs[Array[Byte]]("key")
    assert(key.toSeq == (Confluent.prefixBytes(keyId).toSeq ++ KafkaStage.KeyBytes.toSeq))
    assert(row.getAs[String]("topic") == "t")
  }

  test("ocf bytes decode with plain avro: schema survives, snappy codec") {
    val out = java.nio.file.Files.createTempDirectory("graft-ocf-spec-").toString
    Ocf.write(Pipeline.lineitem(spark, sf).limit(10).repartition(1),
      Pipeline.lineitemFixed, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == 1)
    val (schema, records) = Ocf.decodeBytes(
      java.nio.file.Files.readAllBytes(files.head.toPath))
    assert(schema.getName == "lineitem" && records.size == 10)
  }
}
