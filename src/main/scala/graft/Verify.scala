package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: graft.Verify <sfDir> <outDir> [queryName ...]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    // Optional name filter for local iteration (the driver passes
    // exactly two args → full sweep, unchanged).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus.toInt, "graft-verify")
    try {
      new java.io.File(outDir).mkdirs()
      SparkEntry.queries
        .filter { case (name, _) => only.isEmpty || only.contains(name) }
        .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
      // Bench.jsonStr: the ONE escaper (backslash, quote, all control
      // chars) — a tab or CR in builder-authored SQL would otherwise
      // make the driver's json.load fail and silently zero the round's
      // correctness, and a second hand-rolled copy here could drift.
      val json = SparkEntry.oracleSql
        .map { case (k, v) => s"${Bench.jsonStr(k)}: ${Bench.jsonStr(v)}" }
        .mkString("{", ",", "}")
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    } finally spark.stop()
  }
}
