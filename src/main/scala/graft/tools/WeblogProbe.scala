package graft.tools

import graft.parse.Strict

/** Dev probe: warm parse time on the cached bench corpora. */
object WeblogProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, "weblog-probe")
    def leg(dir: String, schema: graft.schema.FixedSchema, key: String): Unit = {
      val lineDf = spark.read.text(dir)
      val parsed = graft.parse.FixedWidthParser.parse(lineDf, schema, Strict)
      def force() = parsed.write.format("noop").mode("overwrite").save()
      force() // cold
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[$key] warm parse runs: ${runs.map(r => f"$r%.2f").mkString(", ")}")
      val ocfRuns = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.sources.Ocf.write(parsed, schema, s"/tmp/graft-probe-ocf-$key")
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[$key] ocf_write runs: ${ocfRuns.map(r => f"$r%.2f").mkString(", ")}")
    }
    leg("/tmp/graft-bench-corpus/_root_testdata_sf0.01-weblog", graft.Bench.weblogFixed, "weblog")
    leg("/tmp/graft-bench-corpus/_root_testdata_sf0.01-lineitem", graft.ops.Pipeline.lineitemFixed, "lineitem")
    spark.stop()
  }
}
