package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** `zorderDeleteBox` — DELETE FROM the z-layout. The `q_zorder_delete`
  * oracle checks the complement aggregate (missed AND over-deleted rows
  * are value mismatches); these pin what the oracle cannot see: a
  * provably-inside file drops WITHOUT being read (staged by corrupting
  * it first), straddlers rewrite IN PLACE under their own names (file
  * lineage — what keeps ingest-batch replays compensable), untouched
  * files survive byte-identical, null-dimension rows outlive any box,
  * the op is idempotent by content, and both crash prologues recover
  * (trash restore, orphan vacuum).
  */
class ZDeleteSpec extends SparkSpec with ZLayoutTestOps {

  private def eventsZ = {
    import graft.ops.Sessions
    Sessions.events(spark, sf).withColumn("day_idx", Layout.dayIdx)
  }

  /** A single-dim layout (user_id, d=1) — contiguous user ranges per
    * file, so a user box PROVABLY contains whole files. */
  private def userLayout(name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-zdel-$name").toString
    Layout.zorderWrite(spark, eventsZ, dir, Seq("user_id"), nFiles = 8)
    dir
  }

  test("delete drops provably-inside files WITHOUT reading them; straddlers keep their names") {
    val dir = userLayout("drop")
    val maxUser = eventsZ.agg(max("user_id")).head().getLong(0)
    val (uLo, uHi) = (0L, maxUser / 2)
    // find a file the manifest PROVES inside the box and corrupt it:
    // an implementation that reads it throws; the metadata-only drop
    // must succeed regardless
    val byFile = Layout.loadManifest(spark, dir)
      .groupBy("file")
      .agg(min("user_id__min").as("mn"), max("user_id__max").as("mx"))
      .collect()
    val inside = byFile.filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
      r.getLong(1) >= uLo && r.getLong(2) <= uHi).map(_.getString(0))
    assert(inside.nonEmpty, "fixture must yield at least one provably-inside file")
    val victim = new org.apache.hadoop.fs.Path(inside.head)
    val out = fs.create(victim, true)
    out.write("not a parquet file".getBytes("UTF-8")); out.close()
    val namesBefore = dataFiles(dir)
    val untouchedBefore = namesBefore.filterNot(inside.contains)
      .map(f => f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
        .getModificationTime)
    val stats = Layout.zorderDeleteBox(spark, dir, Seq(("user_id", uLo, uHi)))
    assert(stats.filesDropped >= inside.length,
      s"expected >= ${inside.length} dropped, got $stats")
    // survivors: exactly the raw complement, row-for-row
    val got = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = eventsZ.where(!col("user_id").between(uLo, uHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // manifest == directory truth; the box's files are gone; NO new
    // names appeared — rewrites happen in place (file lineage)
    assert(manifestFiles(dir) == dataFiles(dir))
    assert(!dataFiles(dir).contains(inside.head))
    assert(dataFiles(dir).forall(namesBefore.contains),
      "delete must never mint new file names")
    // files the box never reached survive byte-identical (same mtime)
    untouchedBefore.foreach { case (f, mtime) =>
      if (dataFiles(dir).contains(f))
        assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
          .getModificationTime == mtime, s"untouched file rewritten: $f")
    }
    // no trash residue after a clean completion
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir, ".graft_trash")))
  }

  test("delete is idempotent by content: re-running the same box changes nothing") {
    val dir = userLayout("idem")
    val box = Seq(("user_id", 0L, 3L))
    val s1 = Layout.zorderDeleteBox(spark, dir, box)
    assert(s1.filesDropped + s1.filesRewritten > 0)
    val files1 = dataFiles(dir)
    val rows1 = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val s2 = Layout.zorderDeleteBox(spark, dir, box)
    assert(s2.filesDropped == 0, s"re-run dropped files: $s2")
    val rows2 = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(rows2 == rows1, "idempotent re-run changed rows")
    assert(dataFiles(dir) == files1 ||
      dataFiles(dir).forall(files1.contains), // a re-filter may drop an empty file
      "re-run minted new files")
    assert(manifestFiles(dir) == dataFiles(dir))
  }

  test("trash prologue: a crash between the rename pair restores the original") {
    val dir = userLayout("trash")
    // simulate the mid-replacement crash: move a file into the trash
    // with no replacement renamed in (src missing, trash populated)
    val f0 = dataFiles(dir).head
    val trash = new org.apache.hadoop.fs.Path(dir, ".graft_trash")
    fs.mkdirs(trash)
    val srcPath = new org.apache.hadoop.fs.Path(f0)
    require(fs.rename(srcPath, new org.apache.hadoop.fs.Path(trash, srcPath.getName)))
    assert(!dataFiles(dir).contains(f0))
    // any delete invocation restores it before doing its own work
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", Long.MaxValue - 1, Long.MaxValue)))
    assert(stats.filesDropped == 0 && stats.filesRewritten == 0)
    assert(dataFiles(dir).contains(f0), "trashed original not restored")
    val total = spark.read.format("graftz").load(dir).count()
    assert(total == eventsZ.count(), "rows lost through the trash window")
  }

  test("drop-only delete crash after the swap: the purged file is vacuumed by ANY next touch") {
    val dir = userLayout("droponly")
    // a drop-only delete leaves no marker — the start-vacuum, not any
    // same-generation bookkeeping, must complete its cleanup
    val byFile = Layout.loadManifest(spark, dir)
      .groupBy("file")
      .agg(min("user_id__min").as("mn"), max("user_id__max").as("mx"))
      .collect().filter(r => !r.isNullAt(1))
    val f0 = byFile.minBy(_.getLong(1)) // the lowest-user file
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", f0.getLong(1), f0.getLong(2))))
    assert(stats.filesDropped >= 1)
    // simulate the crash-after-swap orphan: re-create the dropped file
    // on disk (the manifest no longer lists it)
    val ghost = new org.apache.hadoop.fs.Path(f0.getString(0))
    val o = fs.create(ghost, true); o.write("ghost".getBytes("UTF-8")); o.close()
    assert(!manifestFiles(dir).contains(f0.getString(0)))
    // a LATER delete (disjoint box) start-vacuums it — the purge
    // completes without anyone remembering the earlier call
    val later = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", Long.MaxValue - 1, Long.MaxValue)))
    assert(later.vacuumed == 1, s"crash orphan not vacuumed: $later")
    assert(!dataFiles(dir).contains(f0.getString(0)))
  }

  test("ingest replay after a delete touched its files: lineage holds, no duplication") {
    // the in-place rewrite keeps every straddler under its own
    // ingest-b<id>-k name, so a foreachBatch replay's cleanup removes
    // exactly the batch's files and re-lands the batch — resurrecting
    // its purged rows (the documented semantics) but duplicating
    // NOTHING, because no other file ever absorbed the batch's rows
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    val dir = java.nio.file.Files.createTempDirectory("graft-zdel-ing").toString
    base.write.mode("overwrite").parquet(dir)
    Layout.writeManifest(spark, dir)
    val added = Layout.zorderIngestBatch(spark, dir, 9L, delta, deltaFiles = 3)
    assert(added.size >= 2, s"need a multi-file batch, got $added")
    // compact segments into the base (the delete classifies from the
    // committed manifest view)
    Layout.writeManifest(spark, dir)
    // a box that rewrites at least the batch's FIRST file
    val firstSpan = Layout.loadManifest(spark, dir)
      .where(col("file") === added.head)
      .agg(min("user_id__min"), max("user_id__max")).head()
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", firstSpan.getLong(0), firstSpan.getLong(1) - 1)))
    assert(stats.filesDropped + stats.filesRewritten > 0)
    // replay batch 9: must not collide and must land the full batch
    val replayed = Layout.zorderIngestBatch(spark, dir, 9L, delta, deltaFiles = 3)
    assert(replayed.nonEmpty)
    assert(manifestFiles(dir) == dataFiles(dir))
    // every original delta row is back exactly once
    val gotDelta = spark.read.parquet(dir)
      .where(col("day_idx") >= cut)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val wantDelta = delta.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(gotDelta == wantDelta, "replayed batch rows wrong or duplicated")
  }

  test("standalone vacuum: restores the trash, removes orphans, no-ops unmanifested") {
    val dir = userLayout("vac")
    val f0 = dataFiles(dir).head
    // stage both crash artifacts at once: a stranded trash original and
    // an unlisted orphan
    val trash = new org.apache.hadoop.fs.Path(dir, ".graft_trash")
    fs.mkdirs(trash)
    val srcPath = new org.apache.hadoop.fs.Path(f0)
    require(fs.rename(srcPath, new org.apache.hadoop.fs.Path(trash, srcPath.getName)))
    val orphan = new org.apache.hadoop.fs.Path(dir, "orphan-x.parquet")
    val o = fs.create(orphan, true); o.write(Array[Byte](1)); o.close()
    val n = Layout.zorderVacuum(spark, dir)
    assert(n == 1, s"expected exactly the planted orphan vacuumed, got $n")
    assert(dataFiles(dir).contains(f0), "trashed original not restored")
    assert(!dataFiles(dir).exists(_.contains("orphan-x")))
    assert(spark.read.format("graftz").load(dir).count() == eventsZ.count())
    // unmanifested layout: nothing provable, vacuum must be a no-op
    val plain = java.nio.file.Files.createTempDirectory("graft-vac-unmf").toString
    eventsZ.limit(10).write.mode("overwrite").parquet(plain)
    assert(Layout.zorderVacuum(spark, plain) == 0)
  }

  test("compact merges the ingest batches' small files back to the target count") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zcmp").toString
    val ev = eventsZ
    Layout.zorderWrite(spark, ev.where(col("day_idx") < 19740), dir,
      Layout.ZDims, nFiles = 8)
    Layout.zorderIngestBatch(spark, dir, 1L,
      ev.where(col("day_idx") >= 19740).drop("day_idx"), deltaFiles = 4)
    val before = dataFiles(dir)
    assert(before.length == 12, s"expected 8 base + 4 batch files: $before")
    Layout.zorderCompact(spark, dir, gen = 1L, nFiles = 4)
    val after = dataFiles(dir)
    assert(after.length == 4 && after.forall(_.contains("/compact-g1-")),
      s"unexpected post-compact files: $after")
    assert(manifestFiles(dir) == after)
    // every row survives exactly once, across base and batch alike
    val got = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = ev.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "compaction lost or duplicated rows")
    // the compacted layout still prunes (fresh clustering, fresh stats)
    val (_, kept, total) = Layout.zorderPrunedScan(spark, dir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    assert(total == 4 && kept.length < total, s"compacted layout must prune: $kept")
    // gen reuse refused; retry of the committed gen is a vacuum no-op
    val e = intercept[IllegalArgumentException] {
      Layout.zorderCompact(spark, dir, gen = 1L)
    }
    assert(e.getMessage.contains("retry=true"))
    Layout.zorderCompact(spark, dir, gen = 1L, retry = true)
    assert(dataFiles(dir) == after)
  }

  test("compact crash before the swap: unlisted leftovers cleaned, redo converges") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zcmp-crash").toString
    Layout.zorderWrite(spark, eventsZ, dir, Layout.ZDims, nFiles = 6)
    // the crash artifact: an unlisted gen file (renamed in, never swapped)
    val stray = new org.apache.hadoop.fs.Path(dir, "compact-g5-0.parquet")
    val o = fs.create(stray, true); o.write(Array[Byte](7)); o.close()
    Layout.zorderCompact(spark, dir, gen = 5L, nFiles = 3)
    val after = dataFiles(dir)
    assert(after.length == 3 && manifestFiles(dir) == after)
    assert(spark.read.format("graftz").load(dir).count() == eventsZ.count())
  }

  test("replay-window guard: absorbed batch refused; crashed replay and empty batch stay retryable") {
    val cut = 19745
    val base = eventsZ.where(col("day_idx") < cut).withColumn("z", lit(0L))
    val delta = eventsZ.where(col("day_idx") >= cut).drop("day_idx")
    def freshDir(tag: String): String = {
      val d = java.nio.file.Files.createTempDirectory(s"graft-zguard-$tag").toString
      base.write.mode("overwrite").parquet(d)
      Layout.writeManifest(spark, d)
      d
    }
    // (a) ABSORBED: land a batch, fold, compact — its rows now live in
    // lineage-free compact files; a replay must be refused, loudly
    val dirA = freshDir("abs")
    Layout.zorderIngestBatch(spark, dirA, 1L, delta, deltaFiles = 2)
    Layout.writeManifest(spark, dirA)
    Layout.zorderCompact(spark, dirA, gen = 1L, nFiles = 4)
    val e = intercept[IllegalArgumentException] {
      Layout.zorderIngestBatch(spark, dirA, 1L, delta, deltaFiles = 2)
    }
    assert(e.getMessage.contains("replay window is closed"))
    assert(spark.read.format("graftz").load(dirA).count() == eventsZ.count(),
      "refused replay must leave the layout untouched")
    // (b) CRASHED MID-REPLAY: land a batch (unfolded — its rows live
    // only in its segment), then simulate the crash state a replay
    // leaves after its destructive steps: segment and prefix files
    // gone, in-flight marker present. The retry must proceed and
    // re-land the batch exactly once.
    val dirB = freshDir("crash")
    val added2 = Layout.zorderIngestBatch(spark, dirB, 2L, delta, deltaFiles = 2)
    val seg2 = new org.apache.hadoop.fs.Path(
      s"$dirB/${Layout.ManifestDir}/ingest-b2.parquet")
    fs.delete(seg2, false)
    added2.foreach(f => fs.delete(new org.apache.hadoop.fs.Path(f), false))
    fs.create(new org.apache.hadoop.fs.Path(dirB, ".graft_ingest_b2"), true).close()
    Layout.zorderIngestBatch(spark, dirB, 2L, delta, deltaFiles = 2)
    Layout.writeManifest(spark, dirB)
    val got = spark.read.parquet(dirB).where(col("day_idx") >= cut)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = delta.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "crashed-replay retry lost or duplicated the batch")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dirB, ".graft_ingest_b2")),
      "in-flight marker must clear at commit")
    // (c) EMPTY batch: never registered, so its replay after a fold is
    // a harmless no-op, not a refusal
    val dirC = freshDir("empty")
    val before = spark.read.format("graftz").load(dirC).count()
    Layout.zorderIngestBatch(spark, dirC, 3L, delta.limit(0), deltaFiles = 1)
    Layout.writeManifest(spark, dirC)
    Layout.zorderIngestBatch(spark, dirC, 3L, delta.limit(0), deltaFiles = 1)
    assert(spark.read.format("graftz").load(dirC).count() == before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dirC, ".graft_batches")) ||
      !scala.io.Source.fromInputStream(
        fs.open(new org.apache.hadoop.fs.Path(dirC, ".graft_batches")), "UTF-8")
        .getLines().contains("3"),
      "empty batch must never register")
  }

  test("null-dimension rows outlive any box (a box can never match null)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zdel-null").toString
    // ids 30+ carry NULL user_id; every non-null user is inside the box
    val rows = (0L until 40L).map(i => (i, if (i < 30) Some(i % 5) else None))
      .toDF("event_id", "user_id")
    Layout.zorderWrite(spark, rows, dir, Seq("user_id"), nFiles = 4)
    val stats = Layout.zorderDeleteBox(spark, dir, Seq(("user_id", 0L, 4L)))
    assert(stats.filesDropped + stats.filesRewritten > 0)
    val got = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (30L until 40L).toSeq,
      s"null-user rows must survive a user box; got $got")
  }

  test("a bound on a dimension without manifest stats rewrites everything, deletes exactly") {
    val dir = userLayout("nodim")
    // day_idx is IN the data but NOT a stat column of this single-dim
    // layout: nothing is provable, so no file may be dropped whole —
    // and the row predicate still deletes exactly the box
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("day_idx", Layout.ZDayLo.toLong, Layout.ZDayHi.toLong)))
    assert(stats.filesDropped == 0, s"unprovable dim must never drop whole files: $stats")
    assert(stats.filesRewritten > 0)
    val got = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = eventsZ
      .where(!col("day_idx").between(Layout.ZDayLo, Layout.ZDayHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
  }
}
