package graft.tools

import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The layout-lifecycle fuzz driver — ONE implementation shared by the
  * committed fixed-seed spec ([[graft.ZLifecycleFuzzSpec]] calls
  * [[run]]) and this CLI seed sweep
  * (`runMain graft.tools.FuzzZ <seed> <steps>`), so both always test
  * the same invariants. A deterministic random sequence of the
  * maintenance verbs (ingest / extend / delete / compact /
  * at-least-once replay) applies to a real layout while a driver-side
  * row-set model updates in lockstep; after EVERY step the graftz read
  * must equal the model exactly (duplicate-sensitive: row count checked
  * before keying) and the manifest must equal the directory. Throws on
  * the first divergence. */
object FuzzZ {

  def run(spark: SparkSession, seed: Long, steps: Int): Int = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"graft-fuzzz-$seed").toString
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

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
      require(rows.length == model.size,
        s"$step: ${rows.length} rows vs model ${model.size} — duplicates or loss")
      val got = rows.toMap
      require(got == model, {
        val wrongVal = model.keySet.intersect(got.keySet)
          .filter(k => got(k) != model(k)).take(5)
          .map(k => s"$k: got ${got(k)} want ${model(k)}")
        s"$step: layout diverged from model — " +
          s"missing=${(model.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- model.keySet).take(5)} " +
          s"valueMismatch=$wrongVal"
      })
      val mfFiles = Layout.loadManifest(spark, dir).select("file").distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      val dFiles = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => fs.makeQualified(st.getPath).toString).sorted.toSeq
      require(mfFiles == dFiles, s"$step: manifest != directory")
    }
    check("initial write")

    def ingest(step: Int): Unit = {
      val rows = mkRows(10 + rnd.nextInt(30))
      Layout.zorderIngestBatch(spark, dir, nextBatch, df(rows),
        deltaFiles = 1 + rnd.nextInt(3))
      landed += nextBatch -> rows
      nextBatch += 1
      // ingest segments leave the manifest view mixed until a
      // compaction; fold them so delete/graftz see one truth
      Layout.writeManifest(spark, dir)
      check(s"step $step: ingest")
    }
    for (step <- 1 to steps) {
      rnd.nextInt(5) match {
        case 0 => ingest(step)
        case 4 if landed.nonEmpty =>
          // at-least-once REPLAY of a prior batch. Two legal outcomes:
          // the batch's file lineage survives (prefix rows/files exist
          // — deletes rewrite in place, folds keep rows) and the
          // replay replaces its own files, re-landing the ORIGINAL
          // rows; or a compaction ABSORBED the batch (or a delete
          // fully purged it) and the replay-window guard REFUSES —
          // silently re-landing there is exactly the duplication this
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
        case 4 => ingest(step) // no batch landed yet
        case 1 =>
          val rows = mkRows(10 + rnd.nextInt(20))
          Layout.zorderExtendRows(spark, dir, df(rows),
            deltaFiles = 1 + rnd.nextInt(2), gen = nextGen)
          nextGen += 1
          check(s"step $step: extend")
        case 2 =>
          val u0 = rnd.nextInt(20).toLong; val u1 = u0 + rnd.nextInt(6)
          val d0 = 19720 + rnd.nextInt(40); val d1 = d0 + rnd.nextInt(10)
          Layout.zorderDeleteBox(spark, dir, Seq(
            ("user_id", u0, u1), ("day_idx", d0.toLong, d1.toLong)))
          model = model.filterNot { case (_, (u, d)) =>
            u >= u0 && u <= u1 && d >= d0 && d <= d1 }
          check(s"step $step: delete users $u0-$u1 days $d0-$d1")
        case 3 =>
          Layout.zorderCompact(spark, dir, gen = nextGen,
            nFiles = 2 + rnd.nextInt(5))
          nextGen += 1
          check(s"step $step: compact")
      }
    }
    require(model.nonEmpty, "fuzz degenerated: model emptied")
    model.size
  }

  def main(args: Array[String]): Unit = {
    val seed = if (args.nonEmpty) args(0).toLong else 1L
    val steps = if (args.length > 1) args(1).toInt else 20
    val spark = graft.GraftSession.local(8, s"fuzz-z-$seed")
    val n = run(spark, seed, steps)
    println(s"[fuzzz] seed=$seed steps=$steps PASSED ($n rows)")
    spark.stop()
  }
}
