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
    val zv = (0 until Layout.ZBits).map { i =>
      shiftleft(shiftright(col("user_id"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(col("day_idx"), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
    val zDir = stage(eventsZ.withColumn("z", zv)
      .repartitionByRange(Layout.ZFiles, col("z")).sortWithinPartitions("z"), "zord")
    val shufDir = stage(eventsZ.repartition(Layout.ZFiles, col("event_id")), "shuf")
    val (zDf, zKept, zTotal) = Layout.zorderPrunedScan(spark, zDir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
    val (sDf, sKept, sTotal) = Layout.zorderPrunedScan(spark, shufDir,
      Layout.ZUserLo, Layout.ZUserHi, Layout.ZDayLo, Layout.ZDayHi)
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
    assert(kept == 0, s"stats should exclude every file, kept $kept/$total")
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
