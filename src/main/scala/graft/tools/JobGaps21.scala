package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** r21: job-boundary timeline for one query execution — prints each
  * job's [start,end] relative to the action's t0 plus the GAP since the
  * previous job's end (driver-side planning/AQE/commit time). The gaps
  * are where wall time hides when task time is small.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.JobGaps21 <sfDir> <query ...>"
  */
object JobGaps21 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-jobgaps-r21")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.head
    @volatile var t0 = 0L
    val events = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        events.add((j.jobId, "S", System.nanoTime())); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        events.add((j.jobId, "E", System.nanoTime())); ()
      }
    })
    args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
      Thread.sleep(200); events.clear()
      t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(s"===== $q wall=${f"$wall%.3f"}s =====")
      val evs = events.toArray(Array.empty[(Int, String, Long)]).sortBy(_._3)
      var lastEnd = t0
      val spans = scala.collection.mutable.Map[Int, Long]()
      evs.foreach { case (id, kind, t) =>
        if (kind == "S") spans(id) = t
        else {
          val s = spans.getOrElse(id, t)
          println(f"  job $id%3d start=${(s - t0) / 1e9}%7.3f end=${(t - t0) / 1e9}%7.3f " +
            f"dur=${(t - s) / 1e9}%6.3f gapBefore=${(s - lastEnd) / 1e9}%6.3f")
          lastEnd = t
        }
      }
      println(f"  tailGap(lastJobEnd->return)=${(t0 + (wall * 1e9).toLong - lastEnd) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
