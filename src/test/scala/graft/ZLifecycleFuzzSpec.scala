package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Model-based lifecycle fuzz: a DETERMINISTIC (fixed-seed) random
  * sequence of the layout maintenance verbs — ingest / extend /
  * delete / compact — applied to a real layout, with a driver-side
  * row-set model updated in lockstep. After EVERY step the graftz
  * read must equal the model exactly, and the manifest must equal the
  * directory. Single ops have targeted specs (ZDeleteSpec, ZorderSpec,
  * GraftZSpec); this is the interaction coverage — the bug class the
  * delete rework fixed (replay/lineage conflicts) lives between ops,
  * not inside one.
  */
class ZLifecycleFuzzSpec extends SparkSpec with ZLayoutTestOps {

  test("random ingest/extend/delete/compact sequence tracks the row-set model exactly") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(0xC0FFEE)
    val dir = java.nio.file.Files.createTempDirectory("graft-zfuzz").toString

    // model: event_id -> (user_id, day_idx); the layout rows mirror it
    var model = Map.empty[Long, (Long, Int)]
    var nextId = 0L
    def mkRows(n: Int): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
      (0 until n).map { _ =>
        val id = nextId; nextId += 1
        val user = rnd.nextInt(20).toLong
        val day = 19720 + rnd.nextInt(40)
        model += id -> ((user, day))
        (id, java.sql.Timestamp.valueOf(
          java.time.LocalDate.ofEpochDay(day.toLong).atTime(12, 0)),
          user, "view", 1.0, "{}")
      }
    def df(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    // base layout via the public writer
    Layout.zorderWrite(spark,
      df(mkRows(120)).withColumn("day_idx", Layout.dayIdx), dir,
      Layout.ZDims, nFiles = 6)

    var nextGen = 1L
    var nextBatch = 1L
    // every landed batch and its EXACT rows, for at-least-once replays
    var landed = Map.empty[Long, Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]]
    def check(step: String): Unit = {
      val rows = spark.read.format("graftz").load(dir)
        .select("event_id", "user_id", "day_idx").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      // count BEFORE toMap: a duplicated row (the double-count/replay
      // symptom this fuzz hunts) would dedup silently under the key
      assert(rows.length == model.size,
        s"$step: ${rows.length} rows vs model ${model.size} — duplicates or loss")
      val got = rows.toMap
      assert(got == model, {
        val wrongVal = model.keySet.intersect(got.keySet)
          .filter(k => got(k) != model(k)).take(5)
          .map(k => s"$k: got ${got(k)} want ${model(k)}")
        s"$step: layout diverged from model — " +
          s"missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)} " +
          s"valueMismatch=$wrongVal"
      })
      assert(manifestFiles(dir) == dataFiles(dir), s"$step: manifest != directory")
    }
    check("initial write")

    for (step <- 1 to 20) {
      rnd.nextInt(5) match {
        case 0 => // ingest a batch
          val rows = mkRows(10 + rnd.nextInt(30))
          Layout.zorderIngestBatch(spark, dir, nextBatch, df(rows),
            deltaFiles = 1 + rnd.nextInt(3))
          landed += nextBatch -> rows
          nextBatch += 1
          // ingest segments leave the manifest view mixed until a
          // compaction; fold them so delete/graftz see one truth
          Layout.writeManifest(spark, dir)
          check(s"step $step: ingest")
        case 4 if landed.nonEmpty => // at-least-once REPLAY of a prior batch
          // the replay path the delete rework had to keep working. Two
          // legal outcomes: the batch's file lineage survives (prefix
          // rows/files exist — deletes rewrite in place, folds keep
          // rows) and the replay replaces its own files, re-landing the
          // ORIGINAL rows; or a compaction ABSORBED the batch (or a
          // delete fully purged it) and the replay-window guard REFUSES
          // — silently re-landing there is exactly the duplication this
          // fuzz first caught. Both outcomes model-checked.
          val (bid, rows) = landed.toSeq.sortBy(_._1)
            .apply(rnd.nextInt(landed.size))
          try {
            Layout.zorderIngestBatch(spark, dir, bid, df(rows),
              deltaFiles = 1 + rnd.nextInt(3))
            rows.foreach { r => model += r._1 ->
              ((r._3, r._2.toLocalDateTime.toLocalDate.toEpochDay.toInt)) }
            Layout.writeManifest(spark, dir)
            check(s"step $step: replay batch $bid")
          } catch {
            case e: IllegalArgumentException
                if e.getMessage.contains("replay window is closed") =>
              check(s"step $step: replay batch $bid refused (window closed)")
          }
        case 4 => // no batch landed yet: fall through to an ingest
          val rows = mkRows(10 + rnd.nextInt(30))
          Layout.zorderIngestBatch(spark, dir, nextBatch, df(rows),
            deltaFiles = 1 + rnd.nextInt(3))
          landed += nextBatch -> rows
          nextBatch += 1
          Layout.writeManifest(spark, dir)
          check(s"step $step: ingest")
        case 1 => // extend (append-only maintenance path)
          val rows = mkRows(10 + rnd.nextInt(20))
          Layout.zorderExtendRows(spark, dir, df(rows),
            deltaFiles = 1 + rnd.nextInt(2), gen = nextGen)
          nextGen += 1
          check(s"step $step: extend")
        case 2 => // delete a random (user, day) box
          val u0 = rnd.nextInt(20).toLong; val u1 = u0 + rnd.nextInt(6)
          val d0 = 19720 + rnd.nextInt(40); val d1 = d0 + rnd.nextInt(10)
          Layout.zorderDeleteBox(spark, dir, Seq(
            ("user_id", u0, u1), ("day_idx", d0.toLong, d1.toLong)))
          model = model.filterNot { case (_, (u, d)) =>
            u >= u0 && u <= u1 && d >= d0 && d <= d1 }
          check(s"step $step: delete users $u0-$u1 days $d0-$d1")
        case 3 => // compact to a fresh clustering
          Layout.zorderCompact(spark, dir, gen = nextGen,
            nFiles = 2 + rnd.nextInt(5))
          nextGen += 1
          check(s"step $step: compact")
      }
    }
    assert(model.nonEmpty, "fuzz degenerated: model emptied")
  }
}
