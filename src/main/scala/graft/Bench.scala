package graft

import graft.ops.Pipeline
import graft.parse.Strict
import graft.sources.FixedWidth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Emits ONE JSON line:
  *
  * {{{
  * {"metric":"total","value":<sum query secs>,"unit":"sec",
  *  "queries":{name:secs,...},            // every SparkEntry query
  *  "errors":{name:message,...},          // failures, NOT fake timings
  *  "parsed":{"lines":N,"bytes":N,"scan_s":..,"parse_s":..,
  *            "lines_per_s":..,"mb_per_s":..,"per_core_mb_per_s":..},
  *  "stages":{"scan":..,"parse":..,"encode":..,"ocf_write":..},
  *  "cores":N,"sf":"dir"}
  * }}}
  *
  * The `parsed` block is the honest throughput figure comparable to the
  * reference's per-core MB/s (BASELINE.md: ~220 MB/s/core): a >= 1 GB
  * fixed-width corpus is rendered ONCE (cached across runs under
  * /tmp/graft-bench-corpus), then scan and scan+parse are timed
  * separately via the noop sink — no render cost, no verification sort,
  * no parquet write in the measured path. `stages` mirrors the
  * reference's per-stage report (`fixed2avro/Util.go:66-86`):
  * read/parse/serialize/export deltas over the same corpus.
  */
object Bench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Force a full computation without collecting (noop DSv2 sink). */
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private val TargetBytes = 1L << 30 // 1 GiB corpus for the parse legs

  /** Render the throughput corpus once; reuse across runs. */
  private def corpus(spark: SparkSession, sfDir: String): (String, Long, Long) = {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"/tmp/graft-bench-corpus/$name"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val li = Pipeline.lineitem(spark, sfDir)
    val rowBytes = Pipeline.lineitemFixed.rowRuneLen + 1L // ASCII + '\n'
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      val rows = li.count()
      val copies = math.max(1, math.ceil(TargetBytes.toDouble / (rows * rowBytes)).toInt)
      val big = Iterator.fill(copies)(li).reduce(_ union _)
        .repartition(spark.sparkContext.defaultParallelism)
      FixedWidth.write(big, Pipeline.lineitemFixed, dir)
    }
    val lines = spark.read.text(dir).count()
    (dir, lines, lines * rowBytes)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")

    // ---- honest parse throughput on a >=1 GiB corpus, FIRST (fresh JVM
    // state — running the query sweep before this left enough heap/JIT
    // debris to multiply the measured parse time ~9x). Cold run warms
    // codegen + page cache; the warm run is the steady-state number.
    val (dir, lines, bytes) = corpus(spark, sfDir)
    val lineDf = spark.read.text(dir)
    val parsed = graft.parse.FixedWidthParser.parse(lineDf, Pipeline.lineitemFixed, Strict)
    val framed = parsed.select(graft.functions.Confluent.frame(
      graft.functions.AvroCodec.to_avro(
        struct(Pipeline.lineitemFixed.fields.map(f => col(f.name)): _*),
        Pipeline.lineitemFixed.avroJson), 42).as("value"))
    val scanS = time(force(lineDf))
    val parseColdS = time(force(parsed))
    val parseS = time(force(parsed))
    val encodeS = time(force(framed))
    val ocfDir = s"/tmp/graft-bench-ocf"
    val ocfS = time {
      graft.sources.Ocf.write(parsed, Pipeline.lineitemFixed, ocfDir)
    }
    val nCores = cpus.toInt
    val mbPerS = bytes / 1e6 / parseS

    // ---- per-query wall times (errors reported, never fake timings)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }

    def fmt(d: Double): String = f"$d%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val parsedJson =
      s"""{"lines":$lines,"bytes":$bytes,"scan_s":${fmt(scanS)},""" +
      s""""parse_cold_s":${fmt(parseColdS)},"parse_s":${fmt(parseS)},""" +
      s""""lines_per_s":${fmt(lines / parseS)},"mb_per_s":${fmt(mbPerS)},""" +
      s""""per_core_mb_per_s":${fmt(mbPerS / nCores)}}"""
    val stages =
      s"""{"scan":${fmt(scanS)},"parse":${fmt(parseS)},"encode":${fmt(encodeS)},"ocf_write":${fmt(ocfS)}}"""
    // Context for the baseline comparison: the reference's lines are 528
    // runes (BASELINE.md) vs this corpus's 105, so per-LINE cost is the
    // comparable basis for parse overhead; per-byte follows from it.
    val perCoreLinesPerS = lines / parseS / nCores
    val notes = "\"parse_s is warm steady-state under the noop sink; " +
      f"per-core ${perCoreLinesPerS}%.0f lines/s vs reference ~213k lines/s-per-core " +
      "(2.56M lines/s on 12 cores, 528-rune lines vs 105 here); " +
      "scan leg is the same corpus without the typed projection\""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"parsed":$parsedJson,"stages":$stages,"cores":$nCores,""" +
      s""""notes":$notes,"sf":"$sfDir"}""")
    spark.stop()
  }
}
