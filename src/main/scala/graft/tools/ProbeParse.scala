package graft.tools

import graft.parse.{FixedWidthParser, Strict}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe: per-type cost breakdown of the weblog parse leg — parses
  * only the fields of one type at a time over the cached bench corpus.
  * Not engine surface; delete or keep under tools/ only. */
object ProbeParse {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-parse")
    val dir = "/tmp/graft-bench-corpus/_root_testdata_sf0.1-weblog-4g"
    val lines = spark.read.text(dir)
    def force(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def t(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    val schema = graft.Bench.weblogFixed
    val byType = schema.fields.groupBy(_.parseType).view.mapValues(_.map(_.name).toSet).toMap
    val full = FixedWidthParser.parse(lines, schema, Strict)
    force(full) // warm codegen + cache
    System.gc(); Thread.sleep(200)
    println("PROBE full: " + (1 to 3).map(_ => f"${t(force(full))}%.3f").mkString(" "))
    for ((tpe, names) <- byType.toSeq.sortBy(_._1)) {
      val proj = full.select(names.toSeq.sorted.map(col): _*)
      force(proj)
      System.gc(); Thread.sleep(200)
      println(s"PROBE only-$tpe (${names.size} cols): " +
        (1 to 3).map(_ => f"${t(force(proj))}%.3f").mkString(" "))
    }
    // And the slicer alone (all fields as raw strings, no typing):
    val trims = schema.fields.map(_ => false).toArray
    val sliced = graft.functions.FixedSlice.fixed_slices(col("value"), schema, trims)
    val rawOnly = lines.select(schema.fields.zipWithIndex.map { case (f, i) =>
      element_at(sliced, i + 1).as(f.name) }: _*)
    force(rawOnly)
    System.gc(); Thread.sleep(200)
    println("PROBE slice-only: " + (1 to 3).map(_ => f"${t(force(rawOnly))}%.3f").mkString(" "))
    val one = lines.select(element_at(sliced, 1).as("c1"))
    force(one)
    System.gc(); Thread.sleep(200)
    println("PROBE one-slice: " + (1 to 3).map(_ => f"${t(force(one))}%.3f").mkString(" "))
    val sub = lines.select(substring(col("value"), 1, 26).as("c1"))
    force(sub)
    System.gc(); Thread.sleep(200)
    println("PROBE one-substring: " + (1 to 3).map(_ => f"${t(force(sub))}%.3f").mkString(" "))
    // is the walk CSE'd? count codegen occurrences
    val gen = org.apache.spark.sql.execution.debug.codegenString(rawOnly.queryExecution.executedPlan)
    println("PROBE codegen fixed_slices calls: " +
      "graft.functions.FixedSlice.slices".r.findAllIn(gen).length)
    spark.stop()
  }
}
