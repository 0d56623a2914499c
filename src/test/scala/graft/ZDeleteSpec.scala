package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** `zorderDeleteBox` — DELETE FROM the z-layout. The `q_zorder_delete`
  * oracle checks the complement aggregate (missed AND over-deleted rows
  * are value mismatches); these pin what the oracle cannot see: a
  * provably-inside file drops WITHOUT being read (staged by corrupting
  * it first), untouched files survive byte-identical, null-dimension
  * rows outlive any box, replay semantics (committed gen → vacuum-only;
  * uncommitted gen files → redo; gen reuse refused), and the manifest
  * ends as exactly the surviving file set.
  */
class ZDeleteSpec extends SparkSpec {

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

  private def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Seq[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => fs.makeQualified(st.getPath).toString).sorted.toSeq

  private def manifestFiles(dir: String): Seq[String] =
    Layout.loadManifest(spark, dir).select("file").distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  test("delete drops provably-inside files WITHOUT reading them, rewrites straddlers exactly") {
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
    val untouchedBefore = dataFiles(dir).filterNot(inside.contains)
      .map(f => f -> fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
        .getModificationTime)
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", uLo, uHi)), gen = 1L)
    assert(stats.filesDropped >= inside.length,
      s"expected >= ${inside.length} dropped, got $stats")
    // survivors: exactly the raw complement, row-for-row
    val got = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = eventsZ.where(!col("user_id").between(uLo, uHi))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    // manifest == directory truth, and the box's files are gone
    assert(manifestFiles(dir) == dataFiles(dir))
    assert(!dataFiles(dir).contains(inside.head))
    // files the box never reached survive byte-identical (same mtime)
    untouchedBefore.foreach { case (f, mtime) =>
      if (dataFiles(dir).contains(f))
        assert(fs.getFileStatus(new org.apache.hadoop.fs.Path(f))
          .getModificationTime == mtime, s"untouched file rewritten: $f")
    }
    // straddling files were rewritten, not dropped: some survivors are
    // this generation's files whenever a file straddled the boundary
    if (stats.filesRewritten > 0)
      assert(dataFiles(dir).exists(_.contains("/delete-g1-")))
  }

  test("replay semantics: committed gen vacuums orphans only; gen reuse is refused") {
    val dir = userLayout("replay")
    // a gen leaves a committed marker only through its REWRITE files
    // (a drop-only delete is naturally idempotent — re-running it
    // deletes nothing), so pick a bound that provably STRADDLES a
    // file: hi one below some multi-user file's max
    val span = Layout.loadManifest(spark, dir)
      .groupBy("file")
      .agg(min("user_id__min").as("mn"), max("user_id__max").as("mx"))
      .collect().filter(r => !r.isNullAt(1) && r.getLong(1) < r.getLong(2))
    assert(span.nonEmpty, "fixture must yield a multi-user file")
    val hi = span.map(_.getLong(2)).min - 1
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", 0L, hi)), gen = 7L)
    assert(stats.filesRewritten > 0, s"bound $hi must straddle a file: $stats")
    val filesAfter = dataFiles(dir)
    val rowsAfter = spark.read.format("graftz").load(dir).count()
    // reusing a committed gen without retry is a loud error
    val e = intercept[IllegalArgumentException] {
      Layout.zorderDeleteBox(spark, dir, Seq(("user_id", 0L, hi)), gen = 7L)
    }
    assert(e.getMessage.contains("retry=true"))
    // retry of the committed gen: pure vacuum, nothing else moves
    val replay = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", 0L, hi)), gen = 7L, retry = true)
    assert(replay.vacuumed == 0 && dataFiles(dir) == filesAfter)
    // plant an orphan (the crash-between-swap-and-delete window) —
    // the vacuum removes exactly it
    val orphan = new org.apache.hadoop.fs.Path(dir, "orphan-leftover.parquet")
    val o = fs.create(orphan, true); o.write(Array[Byte](1, 2, 3)); o.close()
    val replay2 = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", 0L, hi)), gen = 7L, retry = true)
    assert(replay2.vacuumed == 1, s"expected one orphan vacuumed: $replay2")
    assert(dataFiles(dir) == filesAfter)
    assert(spark.read.format("graftz").load(dir).count() == rowsAfter)
  }

  test("crash before the swap: uncommitted gen files are probe-deleted and the delete redoes") {
    val dir = userLayout("crash")
    // simulate the pre-swap crash artifact: a gen file on disk the
    // committed manifest never lists
    val stray = new org.apache.hadoop.fs.Path(dir, "delete-g3-0.parquet")
    val o = fs.create(stray, true); o.write(Array[Byte](9)); o.close()
    val e = intercept[IllegalArgumentException] {
      Layout.zorderDeleteBox(spark, dir, Seq(("user_id", 0L, 1L)), gen = 3L)
    }
    assert(e.getMessage.contains("retry=true"))
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", 0L, 1L)), gen = 3L, retry = true)
    assert(stats.filesDropped + stats.filesRewritten > 0)
    val got = spark.read.format("graftz").load(dir)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val want = eventsZ.where(!col("user_id").between(0L, 1L))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want)
    assert(manifestFiles(dir) == dataFiles(dir))
  }

  test("null-dimension rows outlive any box (a box can never match null)") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zdel-null").toString
    // ids 100+ carry NULL user_id; every non-null user is inside the box
    val rows = (0L until 40L).map(i => (i, if (i < 30) Some(i % 5) else None))
      .toDF("event_id", "user_id")
    Layout.zorderWrite(spark, rows, dir, Seq("user_id"), nFiles = 4)
    val stats = Layout.zorderDeleteBox(spark, dir,
      Seq(("user_id", 0L, 4L)), gen = 1L)
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
      Seq(("day_idx", Layout.ZDayLo.toLong, Layout.ZDayHi.toLong)), gen = 2L)
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
