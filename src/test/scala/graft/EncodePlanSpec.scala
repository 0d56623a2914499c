package graft

import graft.functions.AvroCodec
import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

/** Physical-plan pin for the parse+encode hot path (the toAvro bench
  * leg), the analogue of FooterTruncateSpec's footer-filter pin: the
  * weblog-shape pipeline must stay ONE WholeStageCodegen span — no
  * Exchange, no projection outside the span — for both the fused
  * line→Avro expression and the composable parse → to_avro_confluent
  * chain (whose projection collapse is what keeps it a single span).
  * The silent loss of either shape is the next r9-style regression:
  * every row would materialize an intermediate UnsafeRow (or worse,
  * shuffle) between parse and encode. */
class EncodePlanSpec extends SparkSpec {

  private val schema = Bench.weblogFixed

  private def fixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-encodeplan").toString
    val line = "x" * schema.rowRuneLen
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0.txt"),
      (line + "\n").getBytes("UTF-8"))
    dir
  }

  /** All plan nodes, descending INTO WholeStageCodegen subtrees. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: p.children.flatMap(allNodes)

  private def assertSingleSpanNoExchange(
      df: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val plan = df.queryExecution.executedPlan
    val nodes = allNodes(plan)
    val exchanges = nodes.collect { case e: Exchange => e }
    assert(exchanges.isEmpty, s"$what: Exchange appeared in the hot path:\n$plan")
    val spans = nodes.collect { case w: WholeStageCodegenExec => w }
    assert(spans.size == 1, s"$what: expected ONE WholeStageCodegen span, " +
      s"got ${spans.size}:\n$plan")
    // Every projection must live INSIDE the span — a ProjectExec outside
    // it is an interpreted/detached projection materializing rows.
    val inSpan = allNodes(spans.head).toSet
    val outside = nodes.collect { case pr: ProjectExec if !inSpan(pr) => pr }
    assert(outside.isEmpty, s"$what: projection outside the codegen span:\n$plan")
  }

  test("fused line→Avro plan: one WholeStageCodegen, no Exchange, encode in-span") {
    val df = FixedWidthParser.toAvro(spark.read.text(fixture()), schema, 42)
    assertSingleSpanNoExchange(df, "fused toAvro")
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("fixed_to_avro"),
      s"fused expression missing from the plan:\n$planStr")
  }

  test("composable parse → to_avro_confluent plan: still one collapsed span") {
    val parsed = FixedWidthParser.parse(spark.read.text(fixture()), schema, Strict)
    val framed = parsed.select(AvroCodec.to_avro_confluent(
      schema.fields.map(f => col(f.name)), schema.avroJson, 42).as("value"))
    assertSingleSpanNoExchange(framed, "parse+to_avro_confluent")
    val planStr = framed.queryExecution.executedPlan.toString
    assert(planStr.contains("avro_encode_direct"),
      s"direct encoder missing from the plan:\n$planStr")
  }

  test("typed parse plan alone: one span, no Exchange (the parse bench leg)") {
    val parsed = FixedWidthParser.parse(spark.read.text(fixture()), schema, Strict)
    assertSingleSpanNoExchange(parsed, "strict parse")
  }

  test("fused plan over the native LineScan input keeps the same shape") {
    // The bench legs now read through LineScan (RDDScanExec input) —
    // the fused expression must stay inside that scan's codegen span
    // too, or the hot path regresses while the read.text pins stay green.
    val lines = graft.sources.LineScan.read(spark, fixture())
    val df = FixedWidthParser.toAvro(lines, schema, 42)
    assertSingleSpanNoExchange(df, "fused toAvro over LineScan")
    assert(df.queryExecution.executedPlan.toString.contains("fixed_to_avro"))
  }
}
