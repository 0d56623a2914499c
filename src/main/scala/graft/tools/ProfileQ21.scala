package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** r21 optimization-round profiler: per-query attribution of wall time
  * into build/plan vs execute, with job/stage/task counts and summed
  * task metrics — the "where is the time" instrument the optimization
  * guide's §1 empirical loop needs when there is no UI (headless
  * bench).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileQ21 <sfDir> <query ...>"
  * (no args after sfDir = all registered queries, slow).
  */
object ProfileQ21 {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cores, "graft-profile-r21")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.head
    val names = if (args.tail.nonEmpty) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val cpuTimeMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          cpuTimeMs.addAndGet(m.executorCpuTime / 1000000L)
          shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0); cpuTimeMs.set(0)
      shufReadB.set(0); shufWriteB.set(0)
    }
    def snap(): String =
      f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d " +
      f"taskT=${taskTimeMs.get / 1000.0}%7.2fs cpuT=${cpuTimeMs.get / 1000.0}%7.2fs " +
      f"shR=${shufReadB.get / 1e6}%8.1fMB shW=${shufWriteB.get / 1e6}%8.1fMB"
    def drain(): Unit = {
      // let straggler listener events land before reading counters
      // (listenerBus is private[spark]; a short sleep is good enough
      // for a profiling tool)
      Thread.sleep(120)
    }

    println(f"${"query"}%-40s ${"warm_s"}%7s ${"build_s"}%8s  counters(warm run)")
    names.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      // warmup (codegen/JIT/page cache) — also absorbs one-time builds
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"$q FAILED warmup: ${e.getMessage}"); }
      // build+plan phase: query construction (may run eager driver jobs)
      // plus analysis/optimization/physical planning
      drain(); reset()
      val tb0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val _ = df.queryExecution.executedPlan
      val buildS = (System.nanoTime() - tb0) / 1e9
      drain()
      val buildSnap = snap()
      // execute phase (warm, counted)
      reset()
      val te0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val execS = (System.nanoTime() - te0) / 1e9
      drain()
      println(f"$q%-40s ${buildS + execS}%7.2f $buildS%8.3f  exec[${snap()}] build[$buildSnap]")
    }
    spark.stop()
  }
}
