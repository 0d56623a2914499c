package graft

import graft.ops.Layout
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The `graftz` DSv2 source: manifest data-skipping reached through
  * `spark.read.format("graftz")` and SQL. Values are oracle-checked
  * (`q_zorder_scan_sql`); these pin what the oracle cannot see — the
  * executed scan plans tasks for EXACTLY the manifest-kept files, the
  * pruning engages from plain SQL, and an extended layout re-resolves.
  */
class GraftZSpec extends SparkSpec {

  private def stage(df: org.apache.spark.sql.DataFrame, name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-gz-$name").toString
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventsZ = {
    import graft.ops.Sessions
    Sessions.events(spark, sf).withColumn("day_idx", Layout.dayIdx)
  }

  private def zLayout(name: String, files: Int = Layout.ZFiles): String = {
    // the ENGINE's own curve — not an inline copy that could silently
    // drift from Layout.zValue and keep passing against a stale
    // clustering
    val zv = Layout.zValue(col("user_id"), col("day_idx"))
    val dir = stage(eventsZ.withColumn("z", zv)
      .repartitionByRange(files, col("z")).sortWithinPartitions("z"), name)
    Layout.writeManifest(spark, dir)
    dir
  }

  /** Every batch scan in the executed plan, descending through AQE
    * boundaries: QueryStageExec's materialized plan is NOT a child
    * node, so a plain collect is silently vacuous past a shuffle. */
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan): Seq[BatchScanExec] =
    p.collect {
      case b: BatchScanExec => Seq(b)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
    }.flatten

  /** Distinct files the executed plan's batch scans actually planned
    * tasks for. */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    df.collect() // finalize AQE
    allScans(df.queryExecution.executedPlan)
      .flatMap(_.inputPartitions)
      .collect { case fp: FilePartition => fp.files.map(_.filePath.toString).toSeq }
      .flatten.distinct.sorted
  }

  private val boxPred =
    col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
      col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi)

  test("graftz scan plans tasks for exactly the manifest-kept files") {
    val dir = zLayout("exact")
    val df = spark.read.format("graftz").load(dir).where(boxPred)
    val scanned = scannedFiles(df)
    val (_, kept, total) = Layout.zorderPrunedScan(spark, dir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    assert(kept.length < total, "fixture layout must actually prune")
    assert(scanned == kept, s"scan read ${scanned.length} files, manifest kept ${kept.length}")
    // and the values equal the raw-table filter, row for row
    val want = eventsZ.where(boxPred)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }

  test("unfiltered graftz read sees every row; single-dimension filters prune too") {
    val dir = zLayout("unf")
    val all = spark.read.format("graftz").load(dir)
    assert(all.count() == eventsZ.count())
    // one-dimension predicate: still prunes (the z curve keeps BOTH
    // dims' file stats tight), still exact
    val one = spark.read.format("graftz").load(dir)
      .where(col("user_id") === Layout.ZUserLo)
    val scanned = scannedFiles(one)
    assert(scanned.length < Layout.ZFiles, "user_id equality pruned nothing")
    assert(one.count() ==
      eventsZ.where(col("user_id") === Layout.ZUserLo).count())
  }

  test("graftz prunes a layout over DIFFERENT stat columns (self-describing manifest)") {
    // the DSv2 path must be dimension-agnostic: it learns the stat
    // columns from the manifest schema, never from a hard-coded list
    val dims = Seq("event_id", "user_id")
    val dir = stage(eventsZ.repartitionByRange(8, col("event_id"))
      .sortWithinPartitions("event_id"), "gz-dims2")
    Layout.writeManifest(spark, dir, dims)
    val nAll = spark.read.parquet(dir).count()
    val df = spark.read.format("graftz").load(dir)
      .where(col("event_id").between(0L, nAll / 10))
    val scanned = scannedFiles(df)
    val (_, kept, total) = Layout.zorderPrunedScanBox(spark, dir,
      Seq(("event_id", 0L, nAll / 10)))
    assert(kept.length < total, "event_id-clustered fixture must prune")
    assert(scanned == kept.sorted,
      s"graftz kept ${scanned.length} files, box API kept ${kept.length}")
    assert(df.count() ==
      eventsZ.where(col("event_id").between(0L, nAll / 10)).count())
  }

  test("SQL over a graftz temp view prunes files and matches the DataFrame path") {
    val dir = zLayout("sql")
    spark.read.format("graftz").load(dir).createOrReplaceTempView("gz_sql_spec")
    val q = spark.sql(
      s"""SELECT event_type, count(*) AS n FROM gz_sql_spec
         |WHERE user_id BETWEEN ${Layout.ZUserLo} AND ${Layout.ZUserHi}
         |  AND day_idx BETWEEN ${Layout.ZDayLo} AND ${Layout.ZDayHi}
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
    val scanned = scannedFiles(q)
    val (_, kept, total) = Layout.zorderPrunedScan(spark, dir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    assert(kept.length < total)
    assert(scanned == kept, "SQL WHERE did not reach the manifest index")
    val want = eventsZ.where(boxPred).groupBy("event_type").count()
      .orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("an extended layout re-resolves: new files visible, pruning intact") {
    val cut = 19745
    val zv = Layout.zValue(col("user_id"), col("day_idx"))
    val dir = stage(eventsZ.where(col("day_idx") < cut).withColumn("z", zv)
      .repartitionByRange(8, col("z")).sortWithinPartitions("z"), "ext")
    Layout.writeManifest(spark, dir)
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    Layout.zorderExtendRows(spark, dir, delta, deltaFiles = 2, gen = 1L)
    // a FRESH read resolves a fresh table -> fresh manifest snapshot
    val df = spark.read.format("graftz").load(dir)
    assert(df.count() == eventsZ.count(), "extension rows not visible via graftz")
    val past = spark.read.format("graftz").load(dir)
      .where(col("day_idx") >= cut && col("day_idx") <= cut + 30)
    val scanned = scannedFiles(past)
    assert(scanned.nonEmpty && scanned.forall(_.contains("/extend-g1-")),
      s"delta-only box read base files: ${scanned.filterNot(_.contains("/extend-g1-"))}")
  }

  test("zValueN over two dims IS the house curve bit-for-bit") {
    // the N-dim interleave at d=2 (bit i of dim j at i*2+j) must equal
    // zValue's layout (x at 2i, y at 2i+1) on every fixture row — a
    // drift here silently re-clusters every layout the write API stages
    val n = eventsZ
      .where(Layout.zValueN(Seq(col("user_id"), col("day_idx"))) =!=
        Layout.zValue(col("user_id"), col("day_idx")))
      .count()
    assert(n == 0, s"$n rows disagree between zValueN(d=2) and zValue")
  }

  test("zorderWrite: public API stages a 3-dim layout graftz prunes on every dimension") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gz-w3").toString
    val src = eventsZ.withColumn("hour_idx", hour(col("ts")))
    Layout.zorderWrite(spark, src, dir, Layout.Z3Dims, nFiles = 16)
    // the internal curve column never lands in the written schema
    val written = spark.read.parquet(dir)
    assert(!written.columns.contains("__graft_z"), written.columns.mkString(","))
    assert(written.count() == src.count())
    // day and hour each prune ALONE — the hour dimension is exactly
    // what no 2-dim (user, day) curve could make tight. (user_id does
    // NOT prune at this fixture scale: 15 users = 4 bits of entropy
    // spread every 3rd low bit position, so every file spans the full
    // user range — a clustering-granularity artifact, not a bug; the
    // full-box assertions below still hold through that dimension.)
    val dayKept = scannedFiles(spark.read.format("graftz").load(dir)
      .where(col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi))).length
    assert(dayKept < 16, "day_idx box pruned nothing")
    val hourKept = scannedFiles(spark.read.format("graftz").load(dir)
      .where(col("hour_idx").between(Layout.ZHourLo, Layout.ZHourHi))).length
    assert(hourKept < 16, "hour_idx box pruned nothing")
    // the full conjunctive box prunes strictly beyond either single
    // dimension: executed scan ≡ manifest-kept set, pruned ≡ unpruned
    // row-for-row against the source frame
    val box = spark.read.format("graftz").load(dir).where(
      col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
        col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi) &&
        col("hour_idx").between(Layout.ZHourLo, Layout.ZHourHi))
    val scanned = scannedFiles(box)
    val (_, kept, total) = Layout.zorderPrunedScanBox(spark, dir, Seq(
      ("user_id", Layout.ZUserLo, Layout.ZUserHi),
      ("day_idx", Layout.ZDayLo.toLong, Layout.ZDayHi.toLong),
      ("hour_idx", Layout.ZHourLo.toLong, Layout.ZHourHi.toLong)))
    assert(kept.length < total, "3-dim box must prune the 3-dim layout")
    assert(kept.length < math.min(dayKept, hourKept),
      s"conjunctive box (${kept.length}) should beat single dims ($dayKept, $hourKept)")
    assert(scanned == kept.sorted)
    val want = src.where(
      col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
        col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi) &&
        col("hour_idx").between(Layout.ZHourLo, Layout.ZHourHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(box.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == want)
  }

  test("zorderWrite refuses absent and non-integral dimensions loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gz-wbad").toString
    val missing = intercept[IllegalArgumentException] {
      Layout.zorderWrite(spark, eventsZ, dir, Seq("user_id", "nope"))
    }
    assert(missing.getMessage.contains("nope"))
    val typed = intercept[IllegalArgumentException] {
      Layout.zorderWrite(spark, eventsZ, dir, Seq("user_id", "ts"))
    }
    assert(typed.getMessage.contains("integral") && typed.getMessage.contains("ts"))
  }

  test("graftz refuses writes, pointing at the layout maintenance ops") {
    val dir = zLayout("ro", files = 2)
    val e = intercept[Exception] {
      eventsZ.limit(1).write.format("graftz").mode("append").save(dir)
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("maintenance"))),
      s"unexpected write failure: $e")
  }

  test("column pruning reaches the parquet scan through graftz") {
    val dir = zLayout("prune", files = 2)
    val df = spark.read.format("graftz").load(dir).select("event_type")
    df.collect()
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    val read = scans.head.scan.readSchema().fieldNames.toSeq
    assert(read == Seq("event_type"),
      s"2-column projection read more than it needed: $read")
  }
}
