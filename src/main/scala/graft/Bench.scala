package graft

import graft.ops.Pipeline
import graft.parse.Strict
import graft.schema.FixedSchema
import graft.sources.FixedWidth
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main. Emits ONE COMPACT JSON line as its LAST stdout line:
  *
  * {{{
  * {"metric":"total","value":<sum of per-query medians>,"unit":"sec",
  *  "queries":{name:medianSec,...},       // median of RUNS per query
  *  "errors":{name:message,...},          // failures, NOT fake timings
  *  "parsed":{...},"parsed_weblog":{...}, // headline throughput per corpus
  *  "stages":{...},"stages_weblog":{...}, // per-stage medians
  *  "cores":N,"runs":3,"sf":"dir"}
  * }}}
  *
  * The line is deliberately SMALL (< ~1.8 KB): the round driver keeps
  * only the final 2 KB of stdout (plus sbt's trailing "[success]" line)
  * and JSON-parses what it finds there — rounds 1-4 emitted one
  * everything-included line that outgrew that window, so the driver
  * recorded `parsed: null` every single round. Full detail — raw
  * per-run times, notes, corpus geometry — goes to `bench_details.json`
  * in the working directory instead.
  *
  * Two fixed-width corpora, both >= 1 GiB, rendered once and cached
  * under /tmp/graft-bench-corpus:
  *
  *  - `lineitem`: 11 columns, 105 runes/row — short-line corpus, heavy
  *    per-line fixed cost.
  *  - `weblog`: 30 columns, 528 runes/row — the REFERENCE's corpus
  *    shape (BASELINE.md: 30 cols, 528 runes/row), so its
  *    per-core MB/s and lines/s are directly comparable to the
  *    baseline's 110 MB/s/core and 213k lines/s/core without a
  *    row-shape correction.
  *
  * Every measured leg and every query is run RUNS times and reported as
  * the median with the raw runs alongside — a single-run bench cannot
  * distinguish machine noise from regression (the round-3 16% drift was
  * unattributable for exactly that reason). The first (cold) run of the
  * parse leg is timed separately: it carries codegen + page-cache
  * warmup. `stages` mirrors the reference's per-stage report
  * (`fixed2avro/Util.go:66-86`): read/parse/serialize/export deltas
  * over the same corpus.
  */
object Bench {

  val Runs = 3

  /** The two parse legs are the headline baseline comparison, so they
    * get more runs than the query sweep: r04's lineitem parse runs
    * spread [4.5, 0.9, 3.7] s — a median over 3 can land anywhere in
    * that range; over 5 (with a GC barrier first) it stabilizes. */
  val LegRuns = 5

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** GC barrier before a timed group: collect the previous leg's debris
    * (corpus render, prior stage buffers) so it isn't charged — as a
    * mid-run full GC — to whichever timed run it lands in. */
  private def gcBarrier(): Unit = { System.gc(); Thread.sleep(200) }

  private def times(f: => Unit, n: Int = Runs): Seq[Double] = {
    gcBarrier()
    Seq.fill(n)(time(f))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  /** Force a full computation without collecting (noop DSv2 sink). */
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def fmt(d: Double): String = f"$d%.3f"
  private def arr(xs: Seq[Double]): String = xs.map(fmt).mkString("[", ",", "]")

  private val TargetBytes = 1L << 30 // >= 1 GiB per corpus for the parse legs

  // ------------------------------------------------- weblog-shaped corpus

  /** The reference corpus shape (BASELINE.md / reference README.md:19):
    * 30 columns, 528 runes/row — timestamps, ids, counters, sizes, and
    * token/path-like strings, all derived deterministically from
    * lineitem so the corpus needs no external data. */
  val weblogSchemaJson: String = {
    def f(name: String, tpe: String, len: Int, logical: Option[String] = None) = {
      val lt = logical.map(l => s""","logicalType":"$l"""").getOrElse("")
      s"""{"name":"$name","type":{"type":"$tpe"$lt,"name":"$name","len":$len}}"""
    }
    val fields = Seq(
      f("w_ts", "long", 26, Some("timestamp-micros")),
      f("w_ts_end", "long", 26, Some("timestamp-micros")),
      f("w_req_id", "long", 12), f("w_user_id", "long", 12),
      f("w_session_id", "long", 12), f("w_conn_id", "long", 12),
      f("w_upstream_id", "long", 12), f("w_tenant_id", "long", 12),
      f("w_status", "int", 6), f("w_port", "int", 6),
      f("w_retries", "int", 6), f("w_shard", "int", 6),
      f("w_bytes_in", "double", 14), f("w_bytes_out", "double", 14),
      f("w_dur_ms", "double", 14), f("w_cpu_ms", "double", 14),
      f("w_queue_ms", "double", 14), f("w_cache_ratio", "double", 14),
      f("w_sample_rate", "double", 14), f("w_weight", "double", 14),
      f("w_method", "string", 8), f("w_proto", "string", 8),
      f("w_host", "string", 16), f("w_client", "string", 16),
      f("w_region", "string", 16), f("w_dc", "string", 16),
      f("w_path", "string", 48), f("w_referer", "string", 40),
      f("w_trace", "string", 36), f("w_agent", "string", 64))
    s"""{"type":"record","name":"weblog","fields":[${fields.mkString(",")}]}"""
  }

  val weblogFixed: FixedSchema = FixedSchema.fromJson(weblogSchemaJson)
  require(weblogFixed.rowRuneLen == 528 && weblogFixed.fields.size == 30,
    s"weblog shape drifted: ${weblogFixed.fields.size} cols, ${weblogFixed.rowRuneLen} runes")

  /** Deterministic weblog frame from lineitem columns (ASCII only, so
    * bytes == runes and the corpus byte math stays exact). */
  def weblogFrame(li: DataFrame): DataFrame = {
    def tok(n: Int, salt: String, cols: org.apache.spark.sql.Column*) = {
      val h = md5(concat_ws(":", (lit(salt) +: cols): _*))
      if (n <= 32) substring(h, 1, n)
      else substring(concat(h, md5(concat(h, lit(salt)))), 1, n)
    }
    val k = col("l_orderkey"); val p = col("l_partkey"); val s = col("l_suppkey")
    li.select(
      col("l_shipdate").as("w_ts"), col("l_shipdate").as("w_ts_end"),
      k.as("w_req_id"), p.as("w_user_id"), s.as("w_session_id"),
      k.as("w_conn_id"), p.as("w_upstream_id"), s.as("w_tenant_id"),
      col("l_linenumber").as("w_status"), col("l_linenumber").as("w_port"),
      col("l_linenumber").as("w_retries"), col("l_linenumber").as("w_shard"),
      col("l_extendedprice").as("w_bytes_in"), col("l_extendedprice").as("w_bytes_out"),
      col("l_quantity").as("w_dur_ms"), col("l_quantity").as("w_cpu_ms"),
      col("l_discount").as("w_queue_ms"), col("l_discount").as("w_cache_ratio"),
      col("l_tax").as("w_sample_rate"), col("l_tax").as("w_weight"),
      col("l_returnflag").as("w_method"), col("l_linestatus").as("w_proto"),
      tok(16, "host", k).as("w_host"), tok(16, "client", p).as("w_client"),
      tok(16, "region", s).as("w_region"), tok(16, "dc", k, p).as("w_dc"),
      tok(48, "path", k, s).as("w_path"), tok(40, "ref", p, s).as("w_referer"),
      tok(36, "trace", k, p, s).as("w_trace"), tok(64, "agent", k).as("w_agent"))
  }

  /** Render a corpus once (>= TargetBytes of fixed-width text); reuse
    * across runs and rounds. */
  private def corpus(spark: SparkSession, sfDir: String, key: String,
      schema: FixedSchema, frame: DataFrame): (String, Long, Long) = {
    val name = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val dir = s"/tmp/graft-bench-corpus/$name-$key"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rowBytes = schema.rowRuneLen + 1L // ASCII + '\n'
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) {
      val rows = frame.count()
      val copies = math.max(1, math.ceil(TargetBytes.toDouble / (rows * rowBytes)).toInt)
      val big = Iterator.fill(copies)(frame).reduce(_ union _)
        .repartition(spark.sparkContext.defaultParallelism)
      FixedWidth.write(big, schema, dir)
    }
    val lines = spark.read.text(dir).count()
    (dir, lines, lines * rowBytes)
  }

  /** The reference's four-stage report over one corpus: scan, parse
    * (typed projection), encode (Avro + Confluent frame), OCF write. */
  private def corpusLegs(spark: SparkSession, sfDir: String, key: String,
      schema: FixedSchema, frame: DataFrame, nCores: Int): (String, String, String) = {
    val (dir, lines, bytes) = corpus(spark, sfDir, key, schema, frame)
    val lineDf = spark.read.text(dir)
    val parsed = graft.parse.FixedWidthParser.parse(lineDf, schema, Strict)
    val framed = parsed.select(graft.functions.AvroCodec.to_avro_confluent(
      schema.fields.map(f => col(f.name)), schema.avroJson, 42).as("value"))
    val parseColdS = time(force(parsed)) // codegen + page-cache warmup
    val scanRuns = times(force(lineDf))
    val parseRuns = times(force(parsed), LegRuns)
    val encodeRuns = times(force(framed), LegRuns)
    val ocfDir = s"/tmp/graft-bench-ocf-$key"
    val ocfRuns = times(graft.sources.Ocf.write(parsed, schema, ocfDir))
    // Same path, discarding sink: the leg's CPU cost. ocf_write minus
    // ocf_cpu is device time — this box's /tmp writes ~1.0 GB/s, 5×
    // below the baseline hardware's NVMe (BASELINE.md), so the disk
    // share is not comparable across machines but the CPU share is.
    val ocfCpuRuns = times(graft.sources.Ocf.writeCpu(parsed, schema))
    val ocfOutMb = new java.io.File(ocfDir).listFiles match {
      case null => 0.0; case fs => fs.map(_.length).sum / 1e6
    }
    val scanS = median(scanRuns); val parseS = median(parseRuns)
    val encodeS = median(encodeRuns); val ocfS = median(ocfRuns)
    val ocfCpuS = median(ocfCpuRuns)
    val mbPerS = bytes / 1e6 / parseS
    // Compact headline (goes on the driver-parsed stdout line)…
    val parsedJson =
      s"""{"parse_s":${fmt(parseS)},"mb_per_s":${fmt(mbPerS)},""" +
      s""""per_core_mb_per_s":${fmt(mbPerS / nCores)},""" +
      s""""per_core_lines_per_s":${fmt(lines / parseS / nCores)}}"""
    val stagesJson =
      s"""{"scan":${fmt(scanS)},"parse":${fmt(parseS)},"encode":${fmt(encodeS)},""" +
      s""""ocf_write":${fmt(ocfS)},"ocf_cpu":${fmt(ocfCpuS)}}"""
    // …and the full leg record (goes to bench_details.json).
    val detailJson =
      s"""{"lines":$lines,"bytes":$bytes,"cols":${schema.fields.size},""" +
      s""""runes_per_row":${schema.rowRuneLen},"scan_s":${fmt(scanS)},""" +
      s""""parse_cold_s":${fmt(parseColdS)},"parse_s":${fmt(parseS)},""" +
      s""""scan_runs":${arr(scanRuns)},"parse_runs":${arr(parseRuns)},""" +
      s""""encode_runs":${arr(encodeRuns)},"ocf_write_runs":${arr(ocfRuns)},""" +
      s""""ocf_cpu_runs":${arr(ocfCpuRuns)},"ocf_out_mb":${fmt(ocfOutMb)},""" +
      s""""lines_per_s":${fmt(lines / parseS)},"mb_per_s":${fmt(mbPerS)},""" +
      s""""per_core_mb_per_s":${fmt(mbPerS / nCores)},""" +
      s""""per_core_lines_per_s":${fmt(lines / parseS / nCores)}}"""
    (parsedJson, stagesJson, detailJson)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-bench")
    val nCores = cpus.toInt
    // Scan granularity is left at the default: FilePartition sizing
    // already caps splits at totalBytes/defaultParallelism (~35 MB here),
    // so the ~1.1 GB corpora scan as one split per file = one wave on 32
    // cores. (Measured: forcing 16 MB splits -> 3 waves of 96 tasks cost
    // ~25% on the weblog parse leg; packing to 128 MB never happens.)

    // ---- honest parse throughput on >= 1 GiB corpora, FIRST (fresh JVM
    // state — running the query sweep before this left enough heap/JIT
    // debris to multiply the measured parse time ~9x).
    val li = Pipeline.lineitem(spark, sfDir)
    val (parsedJson, stagesJson, detailJson) =
      corpusLegs(spark, sfDir, "lineitem", Pipeline.lineitemFixed, li, nCores)
    val (parsedWeblogJson, stagesWeblogJson, detailWeblogJson) =
      corpusLegs(spark, sfDir, "weblog", weblogFixed, weblogFrame(li), nCores)

    // ---- per-query wall times: median of Runs (errors reported once,
    // never fake timings; a failed query contributes its attempts' time)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = (1 to Runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        }
        (System.nanoTime() - t0) / 1e9
      }
      (name, median(runs), runs)
    }

    val qs = results.map { case (k, m, _) => "\"" + k + "\":" + fmt(m) }
      .mkString("{", ",", "}")
    val qruns = results.map { case (k, _, r) => "\"" + k + "\":" + arr(r) }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\n\\r\\t]", " ") + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val notes = "\"parse_s is the median warm steady-state under the noop sink; " +
      "parsed_weblog is the reference-shaped corpus (30 cols, 528 runes/row) — " +
      "compare its per_core_mb_per_s / per_core_lines_per_s directly to " +
      "BASELINE.md's 110 MB/s/core and 213k lines/s/core. ocf_cpu is the " +
      "ocf_write path into a discarding sink (pure CPU); the difference is " +
      "device time — this box writes /tmp at ~1.0 GB/s vs the baseline " +
      "hardware's 5 GB/s NVMe, so ocf_write wall time is device-bound here\""

    // Full detail to a file (raw runs, corpus geometry, notes)…
    val detail =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""queries_runs":$qruns,"errors":$errs,"parsed":$detailJson,""" +
      s""""parsed_weblog":$detailWeblogJson,"stages":$stagesJson,""" +
      s""""stages_weblog":$stagesWeblogJson,"cores":$nCores,""" +
      s""""runs":$Runs,"leg_runs":$LegRuns,"notes":$notes,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_details.json"), detail)

    // …and the compact headline as the LAST stdout line, inside the
    // driver's 2 KB tail window (see the class doc).
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"parsed":$parsedJson,""" +
      s""""parsed_weblog":$parsedWeblogJson,"stages":$stagesJson,""" +
      s""""stages_weblog":$stagesWeblogJson,"cores":$nCores,"runs":$Runs,""" +
      s""""sf":"$sfDir"}"""
    if (line.length > 1800) // never regrow past the driver's tail window
      System.err.println(s"[bench] WARNING: headline line ${line.length} chars")
    println(line)
    spark.stop()
  }
}
