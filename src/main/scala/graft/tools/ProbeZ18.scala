package graft.tools

/** Measures the z-order layout's file-skipping ratio for the
  * `q_zorder_scan` predicate box at each SF. Recorded (r18):
  * kept/total = 8/32 at sf0.001, 3/32 at sf0.01, 2/32 at sf0.1 —
  * the box scan reads ~6% of the clustered layout's files at sf0.1,
  * while a hash layout keeps 32/32 (ZorderSpec pins that contrast).
  */
object ProbeZ18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "probe-z18")
    try {
      for (sf <- Seq("0.001", "0.01", "0.1")) {
        val dir = s"/root/testdata/sf$sf"
        val path = graft.ops.Layout.zorderedEvents(spark, dir)
        val (_, kept, total) = graft.ops.Layout.zorderPrunedScan(spark, path,
          graft.ops.Layout.ZUserLo, graft.ops.Layout.ZUserHi,
          graft.ops.Layout.ZDayLo, graft.ops.Layout.ZDayHi)
        println(s"ZPRUNE sf$sf kept=${kept.length} total=$total")
      }
    } finally spark.stop()
  }
}
