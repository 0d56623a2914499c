package graft.tools

import graft.Bench

/** r19 quiet-window probe: print the bench micro-cal N times (default
  * 6, ~1 s apart) so a canonical re-record (VERDICT r18 #6: cpucal ≥
  * 700) can be gated on the machine actually being quiet, instead of
  * discovering mid-record that a co-tenant landed.
  *
  *   runMain graft.tools.ProbeCal19 [n]
  */
object ProbeCal19 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(6)
    val vals = (1 to n).map { i =>
      val c = Bench.microCal()
      println(f"CAL $i%2d: $c%.0f MB/s  load=${Bench.loadavg()}%.2f")
      Thread.sleep(1000)
      c
    }
    println(f"CAL median=${Bench.median(vals)}%.0f min=${vals.min}%.0f max=${vals.max}%.0f")
  }
}
