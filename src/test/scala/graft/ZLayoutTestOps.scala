package graft

/** Shared directory/manifest helpers for the z-layout suites
  * (ZDeleteSpec, ZLifecycleFuzzSpec) — one listing convention, so a
  * qualification or filtering change fails both suites identically. */
trait ZLayoutTestOps { self: SparkSpec =>

  protected def fs = new org.apache.hadoop.fs.Path("/")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  protected def dataFiles(dir: String): Seq[String] =
    fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => fs.makeQualified(st.getPath).toString).sorted.toSeq

  protected def manifestFiles(dir: String): Seq[String] =
    graft.ops.Layout.loadManifest(spark, dir).select("file").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
}
