package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering + footer-stats file skipping. The z-value and
  * the box aggregate are oracle-checked; these pin what the oracle
  * cannot see: files are actually skipped on the z layout, skipping is
  * impossible on an unclustered copy of the same rows, and pruning
  * never changes a result.
  */
class ZorderSpec extends SparkSpec {

  private def stage(df: org.apache.spark.sql.DataFrame, name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-z-$name").toString
    df.write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventsZ = {
    import graft.ops.Sessions
    Sessions.events(spark, sf)
      .withColumn("day_idx",
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")))
  }

  test("z layout skips files; a hash-shuffled copy of the same rows cannot") {
    val zv = Layout.zValue(col("user_id"), col("day_idx"))
    val zDir = stage(eventsZ.withColumn("z", zv)
      .repartitionByRange(Layout.ZFiles, col("z")).sortWithinPartitions("z"), "zord")
    val shufDir = stage(eventsZ.repartition(Layout.ZFiles, col("event_id")), "shuf")
    val (zDf, zKeptF, zTotal) = Layout.zorderPrunedScan(spark, zDir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val (sDf, sKeptF, sTotal) = Layout.zorderPrunedScan(spark, shufDir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val (zKept, sKept) = (zKeptF.length, sKeptF.length)
    // every shuffled file spans the full (user, day) range → zero skip
    assert(sKept == sTotal, s"hash layout unexpectedly pruned: $sKept/$sTotal")
    assert(zKept < zTotal, s"z layout pruned nothing: $zKept/$zTotal")
    assert(zKept < sKept, "z layout must skip strictly more files than hash layout")
    // and both reads agree with each other despite the different file sets
    val a = zDf.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = sDf.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("pruned scan equals the unpruned filter row-for-row") {
    val (df, _, _) = Layout.zorderPrunedScan(spark,
      stage(eventsZ.withColumn("z", lit(0L))
        .repartitionByRange(4, col("event_id")), "plain"),
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val want = eventsZ
      .where(col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
        col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }

  test("an empty predicate box yields an empty result (files may all prune)") {
    val zDir = stage(eventsZ.withColumn("z", lit(0L)).repartition(2), "empty")
    val (df, kept, total) = Layout.zorderPrunedScan(spark, zDir,
      1000000L, 2000000L, 1, 2)
    assert(kept.isEmpty, s"stats should exclude every file, kept ${kept.length}/$total")
    assert(df.count() == 0L)
  }

  test("manifest round-trip: written with the layout, equal to a fresh footer scan") {
    val zDir = stage(eventsZ.repartitionByRange(8, col("day_idx"))
      .sortWithinPartitions("day_idx"), "mf")
    Layout.writeManifest(spark, zDir)
    val fs = new org.apache.hadoop.fs.Path(zDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$zDir/${Layout.ManifestDir}/_SUCCESS")), "manifest not committed")
    val loaded = Layout.loadManifest(spark, zDir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, zDir).collect().map(_.toSeq).toSet
    assert(loaded == fresh)
    // the manifest dir is metadata: scanning the layout must not read it
    assert(spark.read.parquet(zDir).columns.contains("event_id"))
  }

  test("manifest pruning keeps the exact file set the footer-read path keeps") {
    val zv = (0 until Layout.ZBits).map { i =>
      shiftleft(shiftright(col("user_id"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("day_idx"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    val zDir = stage(eventsZ.withColumn("z", zv)
      .repartitionByRange(Layout.ZFiles, col("z")).sortWithinPartitions("z"), "mfid")
    Layout.writeManifest(spark, zDir)
    val boxes = Seq(
      (Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi),
      (0L, 2L, 19725, 19755),
      (9L, 14L, 19740, 19742))
    for ((uLo, uHi, dLo, dHi) <- boxes) {
      val (_, viaManifest, tM) = Layout.zorderPrunedScan(spark, zDir, uLo, uHi, dLo, dHi)
      val (_, viaFooters, tF) = Layout.zorderPrunedScanFooters(spark, zDir, uLo, uHi, dLo, dHi)
      assert(viaManifest == viaFooters,
        s"kept sets differ for box ($uLo,$uHi,$dLo,$dHi)")
      assert(tM == tF)
    }
  }

  test("incremental extension: appended delta prunes tight, manifest stays exact") {
    import graft.ops.Sessions
    // base layout: the first 20 days; delta: the rest
    val cut = 19745
    val all = eventsZ
    val base = all.where(col("day_idx") < cut).drop("day_idx")
    val delta = all.where(col("day_idx") >= cut).drop("day_idx")
    assert(delta.count() > 0, "fixture needs rows past the cut")
    val zv = (0 until Layout.ZBits).map { i =>
      shiftleft(shiftright(col("user_id"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("day_idx"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    val dir = stage(base
      .withColumn("day_idx",
        datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")))
      .withColumn("z", zv)
      .repartitionByRange(8, col("z")).sortWithinPartitions("z"), "ext")
    Layout.writeManifest(spark, dir)

    val added = Layout.zorderExtendRows(spark, dir, delta, deltaFiles = 4, gen = 1L)
    assert(added.nonEmpty, "extension added no files")

    // manifest after extension ≡ a fresh full footer scan, row for row
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq).toSet
    assert(loaded == fresh, "extended manifest drifted from the footer truth")

    // pruned scan over the EXTENDED layout equals the raw filter
    val (df, keptAll, total) = Layout.zorderPrunedScan(spark, dir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val want = eventsZ
      .where(col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
        col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == want)
    assert(keptAll.length < total, "extended layout should still prune")

    // a box entirely PAST the cut keeps no base file: the delta's own
    // stats are tight, not inherited from the base layout's
    val (_, keptDelta, _) = Layout.zorderPrunedScan(spark, dir,
      0L, Long.MaxValue >> 1, cut, cut + 30)
    assert(keptDelta.nonEmpty && keptDelta.forall(added.contains),
      s"delta-only box kept base files: ${keptDelta.filterNot(added.contains)}")
  }

  test("extending an UNMANIFESTED layout backfills without double-counting the delta") {
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val dir = stage(base, "extnm") // note: NO writeManifest — the backfill path
    Layout.zorderExtendRows(spark, dir, delta, deltaFiles = 2, gen = 1L)
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq)
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq)
    assert(loaded.toSet == fresh.toSet)
    assert(loaded.length == fresh.length, "delta rows double-counted in the manifest")
    assert(spark.read.parquet(dir).count() == eventsZ.count())
  }

  test("batch ingest is idempotent: a replayed batch cannot duplicate rows") {
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val dir = stage(base, "ing")
    Layout.writeManifest(spark, dir)
    val want = eventsZ.count()
    val added1 = Layout.zorderIngestBatch(spark, dir, 5L, delta)
    assert(spark.read.parquet(dir).count() == want)
    // replay the SAME batch id (the foreachBatch crash-replay case)
    val added2 = Layout.zorderIngestBatch(spark, dir, 5L, delta)
    assert(added1.size == added2.size)
    assert(spark.read.parquet(dir).count() == want,
      "replayed batch duplicated rows")
    // manifest exact after the replay
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq).toSet
    assert(loaded == fresh)
    // a distinct batch id appends (no cross-batch clobbering):
    // ingest-b5-* untouched by batch 51 (prefix match is exact)
    Layout.zorderIngestBatch(spark, dir, 51L, delta.limit(10))
    assert(spark.read.parquet(dir).count() == want + 10)
    // manifest maintenance was O(delta): one batch-keyed SEGMENT per
    // batch (replay replaced b5's, never duplicated it), base intact
    val segs = new java.io.File(s"$dir/${Layout.ManifestDir}").listFiles()
      .filter(_.getName.startsWith("ingest-b")).map(_.getName).sorted
    assert(segs.toSeq == Seq("ingest-b5.parquet", "ingest-b51.parquet"),
      s"unexpected manifest segments: ${segs.mkString(",")}")
  }

  test("a layout ROOT containing the batch marker cannot wipe the manifest") {
    // regression (r20): the replay compensation used to match the
    // generation marker as a SUBSTRING of the full path — a layout
    // under a directory named ingest-b7-* made every manifest row
    // match, and the first ingest of batch 7 committed an empty base
    // manifest (all committed data invisible to pruned/graftz reads)
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val parent = java.nio.file.Files.createTempDirectory("graft-z-marker")
    val dir = parent.resolve("ingest-b7-rerun").resolve("layout").toString
    base.write.mode("overwrite").parquet(dir)
    Layout.writeManifest(spark, dir)
    val baseFiles = Layout.loadManifest(spark, dir)
      .select("file").distinct().count()
    Layout.zorderIngestBatch(spark, dir, 7L, delta)
    val afterFiles = Layout.loadManifest(spark, dir)
      .select("file").distinct().count()
    assert(afterFiles > baseFiles,
      s"manifest wiped by the path marker: $afterFiles files vs $baseFiles base")
    // manifest still equals footer truth, and the pruned read sees all rows
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq).toSet
    assert(loaded == fresh)
    assert(spark.read.format("graftz").load(dir).count() == eventsZ.count())
  }

  test("a committed manifest predating the self-describing schema is refused loudly") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = stage(eventsZ.limit(100).withColumn("z", lit(0L)), "legacy")
    // hand-write the r19-format manifest (no bytes/mtime inventory)
    val oldSchema = StructType(Seq(
      StructField("file", StringType), StructField("rg", IntegerType),
      StructField("u_min", LongType), StructField("u_max", LongType),
      StructField("d_min", IntegerType), StructField("d_max", IntegerType)))
    spark.createDataFrame(
        java.util.List.of(Row("file:///x/part-0.parquet", 0, 1L, 2L, 3, 4)),
        oldSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/${Layout.ManifestDir}")
    // without the guard this surfaced as an AnalysisException deep in
    // extend's union — or SILENT row loss via null-filled inventory
    // columns once segments mixed schema generations
    val e = intercept[IllegalArgumentException] {
      Layout.loadManifest(spark, dir).collect()
    }
    assert(e.getMessage.contains("writeManifest"),
      s"error must name the remedy: ${e.getMessage}")
    val e2 = intercept[Exception] {
      spark.read.format("graftz").load(dir).count()
    }
    assert(e2.getMessage.contains("writeManifest"))
    // the named remedy actually repairs it
    Layout.writeManifest(spark, dir)
    assert(spark.read.format("graftz").load(dir).count() == 100)
  }

  test("streaming layout ingest ≡ batch: rows land z-sorted, manifest exact, pruning live") {
    import graft.streaming.EventStream
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val dir = stage(base, "sing")
    Layout.writeManifest(spark, dir)
    // feed the delta as two micro-batches through a file stream
    val in = java.nio.file.Files.createTempDirectory("graft-z-sing-in").toString
    delta.repartition(2).write.mode("overwrite").parquet(in)
    val tsType = spark.read.parquet(in).schema("ts").dataType
    val stream = spark.readStream
      .schema(EventStream.eventsSchema(tsType))
      .option("maxFilesPerTrigger", 1).parquet(in)
    val ck = java.nio.file.Files.createTempDirectory("graft-z-sing-ck").toString
    EventStream.layoutIngestStream(stream, dir, ck)
    assert(spark.read.parquet(dir).count() == eventsZ.count())
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq).toSet
    assert(loaded == fresh, "streamed manifest drifted from the footer truth")
    val (df, kept, total) = Layout.zorderPrunedScan(spark, dir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val want = eventsZ
      .where(col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
        col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == want)
    assert(kept.length < total)
  }

  test("pruned scan performs zero driver footer reads on a manifested layout") {
    val zDir = stage(eventsZ.repartitionByRange(4, col("user_id"))
      .sortWithinPartitions("user_id"), "mf0")
    Layout.writeManifest(spark, zDir)
    val before = Layout.driverFooterReads.get()
    val (df, kept, total) = Layout.zorderPrunedScan(spark, zDir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    df.count()
    assert(kept.length < total, "user-sorted layout should prune on the user box")
    assert(Layout.driverFooterReads.get() == before,
      "manifest-pruned scan opened parquet footers on the driver")
  }

  test("generalized dims: a second layout over (event_id, user_id) prunes and stays exact") {
    // a DIFFERENT clustering: sort on event_id — its stats are tight,
    // user_id's are not. Manifest carries BOTH as requested dims.
    val dims = Seq("event_id", "user_id")
    val dir = stage(eventsZ.repartitionByRange(8, col("event_id"))
      .sortWithinPartitions("event_id"), "dims2")
    Layout.writeManifest(spark, dir, dims)
    val nAll = spark.read.parquet(dir).count()
    val boxes = Seq(
      Seq(("event_id", 0L, nAll / 10), ("user_id", 0L, Long.MaxValue >> 1)),
      Seq(("event_id", nAll / 2, nAll / 2 + 50L)),
      Seq(("user_id", Layout.ZUserLo, Layout.ZUserHi)))
    for (bounds <- boxes) {
      val (df, viaManifest, total) = Layout.zorderPrunedScanBox(spark, dir, bounds)
      val (_, viaFooters, tF) = Layout.zorderPrunedScanFootersBox(spark, dir, bounds)
      assert(viaManifest == viaFooters, s"kept sets differ for $bounds")
      assert(total == tF)
      // pruned ≡ unpruned, row for row
      val want = eventsZ
        .where(bounds.map { case (c, lo, hi) => col(c).between(lo, hi) }
          .reduce(_ && _))
        .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      val got = df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == want, s"pruned scan drifted for $bounds")
    }
    // the event_id-sorted layout actually skips on an event_id box
    val (_, kept, total) = Layout.zorderPrunedScanBox(spark, dir,
      Seq(("event_id", 0L, nAll / 10)))
    assert(kept.length < total, "event_id-clustered layout pruned nothing")
  }

  test("extend refuses a reused generation; retry=true replays it idempotently") {
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val dir = stage(base, "gencol")
    Layout.writeManifest(spark, dir)
    val want = eventsZ.count()
    Layout.zorderExtendRows(spark, dir, delta, deltaFiles = 2, gen = 7L)
    assert(spark.read.parquet(dir).count() == want)
    // a SECOND distinct extension reusing gen 7 must fail loudly, and
    // must not have deleted the first extension's data
    val e = intercept[IllegalArgumentException] {
      Layout.zorderExtendRows(spark, dir, delta.limit(5), deltaFiles = 1, gen = 7L)
    }
    assert(e.getMessage.contains("distinct gens"))
    assert(spark.read.parquet(dir).count() == want, "refused extend lost data")
    // an explicit RETRY of gen 7 replays without duplicating rows, and
    // the manifest stays footer-exact (compensation before delete)
    Layout.zorderExtendRows(spark, dir, delta, deltaFiles = 2, gen = 7L, retry = true)
    assert(spark.read.parquet(dir).count() == want, "retry duplicated rows")
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq).toSet
    assert(loaded == fresh)
  }

  test("ingest replay AFTER manifest compaction cannot duplicate or orphan rows") {
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val dir = stage(base, "ingcmp")
    Layout.writeManifest(spark, dir)
    val want = eventsZ.count()
    Layout.zorderIngestBatch(spark, dir, 5L, delta)
    // COMPACTION folds batch 5's segment into the base manifest
    Layout.writeManifest(spark, dir)
    // replay batch 5 (foreachBatch crash-replay): the base rows for
    // ingest-b5-* must be compensated before its files are rewritten
    Layout.zorderIngestBatch(spark, dir, 5L, delta)
    assert(spark.read.parquet(dir).count() == want,
      "post-compaction replay duplicated rows")
    val loaded = Layout.loadManifest(spark, dir).collect().map(_.toSeq).toSet
    val fresh = Layout.footerManifest(spark, dir).collect().map(_.toSeq).toSet
    assert(loaded == fresh, "manifest lists stale/duplicate rows after replay")
    // every manifest-listed file exists: a concurrent reader can never
    // prune to a deleted path
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = Layout.loadManifest(spark, dir).select("file")
      .distinct().collect().map(_.getString(0))
    assert(listed.forall(f => fs.exists(new org.apache.hadoop.fs.Path(f))),
      "manifest lists a nonexistent file")
    // pruning still live and exact
    val (df, _, _) = Layout.zorderPrunedScan(spark, dir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val wantIds = eventsZ
      .where(col("user_id").between(Layout.ZUserLo, Layout.ZUserHi) &&
        col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(df.select("event_id").collect().map(_.getLong(0)).sorted.toSeq == wantIds)
  }

  test("kept-empty and empty-layout fallbacks: schema hint, no manifest.head crash") {
    // an EMPTY layout (zero data files, committed empty manifest)
    // previously crashed on manifest.head; with a schema hint it
    // returns an explicitly-schemaed empty frame
    val dir = java.nio.file.Files.createTempDirectory("graft-z-mt").toString
    eventsZ.limit(0).write.mode("overwrite").parquet(s"$dir/seed") // schema donor
    val hint = spark.read.parquet(s"$dir/seed").schema
    val empty = s"$dir/layout"
    new java.io.File(empty).mkdirs()
    Layout.writeManifest(spark, empty) // zero files -> empty manifest
    val (df, kept, total) = Layout.zorderPrunedScanBox(spark, empty,
      Seq(("user_id", 0L, 10L)), schemaHint = Some(hint))
    assert(kept.isEmpty && total == 0)
    assert(df.schema == hint)
    assert(df.count() == 0L)
  }

  test("z-value interleave: known bit patterns") {
    import spark.implicits._
    // x=0b101 (bits at 0,2 → z bits 0,4 = 17), y=0b11 (bits 0,1 → z bits 1,3 = 10)
    val z = Seq((5L, 3)).toDF("user_id", "day_idx")
      .select((0 until Layout.ZBits).map { i =>
        shiftleft(shiftright(col("user_id"), i).bitwiseAND(lit(1L)), 2 * i) +
          shiftleft(shiftright(col("day_idx"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      }.reduce(_ + _).as("z")).head().getLong(0)
    assert(z == 27L, s"interleave(5, 3) must be 27, got $z")
  }
}
