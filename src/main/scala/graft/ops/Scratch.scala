package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Cluster-safe scratch locations for queries that materialize an
  * intermediate dataset (fixed-width text files, OCF files).
  *
  * On a real cluster set `spark.graft.scratch.dir` to a SHARED
  * filesystem (HDFS / object store) — executors of different machines
  * must see each other's files. The default is a driver-local temp root,
  * which is only correct in `local[*]` mode (all "executors" share the
  * driver's disk); round-1 hard-coded `Files.createTempDirectory` inside
  * the queries, which silently breaks distributed. All paths go through
  * the session's Hadoop filesystem, so `hdfs://` / `s3a://` roots work
  * unmodified.
  */
object Scratch {
  val ConfKey = "spark.graft.scratch.dir"

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  /** A fresh scratch subdirectory under the configured root. */
  def dir(spark: SparkSession, name: String): String = {
    val root = spark.conf.getOption(ConfKey).getOrElse(
      sys.props("java.io.tmpdir") + "/graft-scratch")
    val unique = s"$name-${java.util.UUID.randomUUID().toString.take(8)}-${counter.incrementAndGet()}"
    val p = new Path(root, unique)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    fs.deleteOnExit(p)
    p.toString
  }
}
