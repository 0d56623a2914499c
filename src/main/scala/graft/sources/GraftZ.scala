package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetUtils}
import org.apache.spark.sql.execution.datasources.v2.{FileDataSourceV2, FileTable}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.functions.{coalesce, col, first, lit, max, min}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.Layout

/** `graftz` — a DataSource V2 format that makes the Z-ordered layout's
  * `_graft_manifest` pruning reachable from `spark.read` and SQL,
  * instead of only through the bespoke `Layout.zorderPrunedScan` API
  * (r19 verdict item #1).
  *
  * Architecture: the table IS parquet — schema inference, the
  * vectorized readers, parquet row-group filter pushdown, and column
  * pruning all come from Spark's own `ParquetScanBuilder`, reused
  * verbatim. The single thing this source replaces is the FILE INDEX:
  * [[GraftZFileIndex]] serves `listFiles` from the manifest written
  * with the layout, so
  *
  *   - the file inventory (names, sizes, mtimes) comes from manifest
  *     rows — ZERO directory listing and ZERO filesystem metadata
  *     calls at query planning;
  *   - pushed data filters (`WHERE user_id BETWEEN …`) prune files
  *     against the manifest's per-column min/max before any task is
  *     planned — the Delta/Iceberg data-skipping discipline, reached
  *     through the standard read path.
  *
  * Pruning is conservative by construction: a constraint only ever
  * SKIPS a file whose manifest bounds prove it empty of matches, the
  * translated bounds are inclusive (strict inequalities widen to the
  * literal), and Spark keeps every pushed filter as a post-scan
  * predicate (`FileScanBuilder.pushFilters` returns data filters for
  * re-evaluation), so a stats gap or translation miss degrades cost,
  * never correctness — the `q_zorder_scan_sql` oracle checks exactly
  * that against the raw table.
  *
  * Read-only: the write path stays with the layout maintenance ops
  * (`Layout.stageZorder/zorderExtendRows/zorderIngestBatch`), which own
  * the manifest commit protocol; a naive `df.write` would add files the
  * manifest never lists.
  */
class GraftZDataSource extends FileDataSourceV2 {

  // Spark routes DataFrameWriter output for every FileDataSourceV2
  // through the V1 fallback format — returning plain ParquetFileFormat
  // here would let `df.write.format("graftz")` SILENTLY append files
  // the manifest never lists. The refusing subclass makes that loud.
  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[GraftZWriteRefusedFormat]

  override def shortName(): String = "graftz"

  override def getTable(options: CaseInsensitiveStringMap): Table = {
    val paths = getPaths(options)
    GraftZTable(getTableName(options, paths), sparkSession,
      getOptionsWithoutPaths(options), paths, None)
  }

  override def getTable(options: CaseInsensitiveStringMap,
      schema: StructType): Table = {
    val paths = getPaths(options)
    GraftZTable(getTableName(options, paths), sparkSession,
      getOptionsWithoutPaths(options), paths, Some(schema))
  }
}

case class GraftZTable(
    name: String,
    sparkSession: SparkSession,
    options: CaseInsensitiveStringMap,
    paths: Seq[String],
    userSpecifiedSchema: Option[StructType])
  extends FileTable(sparkSession, options, paths, userSpecifiedSchema) {

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new GraftZFileIndex(sparkSession, paths.map(new Path(_)))

  override def inferSchema(files: Seq[FileStatus]): Option[StructType] = {
    import scala.jdk.CollectionConverters._
    ParquetUtils.inferSchema(sparkSession,
      options.asCaseSensitiveMap().asScala.toMap, files)
  }

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    // Spark's own parquet scan builder over the manifest-backed index:
    // its pushFilters feeds dataFilters into fileIndex.listFiles (file
    // skipping, ours) AND pushDataFilters into the parquet readers
    // (row-group skipping, stock).
    ParquetScanBuilder(sparkSession, fileIndex, schema, dataSchema,
      mergedOptions(opts))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    throw new UnsupportedOperationException(
      "graftz is a read surface; write through the Layout maintenance " +
        "ops (stageZorder / zorderExtendRows / zorderIngestBatch), " +
        "which own the manifest commit protocol")

  override def supportsDataType(dataType: DataType): Boolean = true

  override def formatName: String = "GraftZ"

  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[GraftZWriteRefusedFormat]
}

/** Parquet in every respect except that it cannot WRITE: the earliest
  * hook Spark's V1 write fallback offers. (Best-effort guard: append
  * mode fails before any file lands; an explicit overwrite-mode save
  * is the caller destroying their own layout and is out of scope.) */
class GraftZWriteRefusedFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "graftz is a read surface; write through the Layout maintenance " +
        "ops (stageZorder / zorderExtendRows / zorderIngestBatch), " +
        "which own the manifest commit protocol")
}

/** The manifest-backed file index. Resolved ONCE per table: one read
  * of the metadata-scale manifest materializes every FileStatus
  * (path/length/mtime ride in the manifest precisely so this needs no
  * filesystem calls) plus per-file min/max bounds per stat dimension.
  * `listFiles` then answers every query's planning from memory — the
  * same per-file state a lakehouse format's snapshot holds.
  *
  * Per-file bounds fold the manifest's per-row-group rows with
  * null = unbounded on the affected side (a row group without stats
  * makes its file unprunable, never invisible). Row-group-level
  * skipping still happens downstream in the parquet reader via the
  * pushed filters — this index only decides which FILES get tasks.
  */
class GraftZFileIndex(spark: SparkSession, roots: Seq[Path])
  extends PartitioningAwareFileIndex(spark, Map.empty, None) {

  require(roots.length == 1, s"graftz reads exactly one layout root, got $roots")

  private val root: Path = {
    val fs = roots.head.getFileSystem(hadoopConf)
    fs.makeQualified(roots.head)
  }

  /** (status, per-column inclusive bounds; absent stats = ±∞). */
  private case class Entry(status: FileStatus, bounds: Map[String, (Long, Long)])

  @volatile private var entries: Seq[Entry] = load()

  private def load(): Seq[Entry] = {
    val mf = Layout.loadManifest(spark, root.toString)
    val statCols = mf.columns.filter(_.endsWith("__min"))
      .map(_.stripSuffix("__min")).toSeq
    val aggs =
      Seq(first(col("bytes")).as("bytes"), first(col("mtime")).as("mtime")) ++
        statCols.flatMap(c => Seq(
          // a null row-group stat widens the FILE bound to ±∞ on that
          // side: min/max would silently ignore the null and overtighten
          min(coalesce(col(s"${c}__min"), lit(Long.MinValue))).as(s"${c}__min"),
          max(coalesce(col(s"${c}__max"), lit(Long.MaxValue))).as(s"${c}__max")))
    mf.groupBy(col("file")).agg(aggs.head, aggs.tail: _*).collect().toSeq
      .map { r =>
        // a null inventory cell means the manifest dir mixes schema
        // generations (an old segment null-filled under the merged
        // read); a null bytes would otherwise unbox to a zero-length
        // FileStatus and the file's rows would silently vanish
        require(!r.isNullAt(r.fieldIndex("file")) &&
            !r.isNullAt(r.fieldIndex("bytes")) &&
            !r.isNullAt(r.fieldIndex("mtime")),
          s"manifest under $root carries null inventory columns — it " +
            "mixes schema generations; rebuild it with " +
            "Layout.writeManifest before reading through graftz")
        val status = new FileStatus(r.getAs[Long]("bytes"), false, 1,
          128L * 1024 * 1024, r.getAs[Long]("mtime"),
          new Path(r.getAs[String]("file")))
        val bounds = statCols.map { c =>
          c -> ((r.getAs[Long](s"${c}__min"), r.getAs[Long](s"${c}__max")))
        }.toMap
        Entry(status, bounds)
      }
      .sortBy(_.status.getPath.toString)
  }

  override def rootPaths: Seq[Path] = Seq(root)

  override def refresh(): Unit = { entries = load() }

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = mutable.LinkedHashMap.empty[Path, FileStatus]
    entries.foreach(e => m.put(e.status.getPath, e.status))
    m
  }

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    Map(root -> entries.map(_.status).toArray)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val cons = dataFilters.flatMap(constraintsOf)
    val kept = entries.filter { e =>
      cons.forall { case (c, lo, hi) =>
        e.bounds.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_.status).toArray))
  }

  private object IntLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Byte, _) => Some(v.toLong)
      case _ => None
    }
  }

  /** Conjunctive [lo, hi] constraints a filter PROVES; anything not
    * understood contributes nothing (kept files, exact rows — the
    * post-scan predicate still applies). Strict inequalities widen to
    * inclusive at the literal: off-by-one in our favor, no ±1 overflow
    * edge. */
  private def constraintsOf(e: Expression): Seq[(String, Long, Long)] = e match {
    case And(l, r) => constraintsOf(l) ++ constraintsOf(r)
    case EqualTo(a: Attribute, IntLit(v)) => Seq((a.name, v, v))
    case EqualTo(IntLit(v), a: Attribute) => Seq((a.name, v, v))
    case GreaterThan(a: Attribute, IntLit(v)) => Seq((a.name, v, Long.MaxValue))
    case GreaterThanOrEqual(a: Attribute, IntLit(v)) => Seq((a.name, v, Long.MaxValue))
    case LessThan(a: Attribute, IntLit(v)) => Seq((a.name, Long.MinValue, v))
    case LessThanOrEqual(a: Attribute, IntLit(v)) => Seq((a.name, Long.MinValue, v))
    case GreaterThan(IntLit(v), a: Attribute) => Seq((a.name, Long.MinValue, v))
    case GreaterThanOrEqual(IntLit(v), a: Attribute) => Seq((a.name, Long.MinValue, v))
    case LessThan(IntLit(v), a: Attribute) => Seq((a.name, v, Long.MaxValue))
    case LessThanOrEqual(IntLit(v), a: Attribute) => Seq((a.name, v, Long.MaxValue))
    case In(a: Attribute, vs) if vs.nonEmpty && vs.forall(IntLit.unapply(_).isDefined) =>
      val ls = vs.flatMap(IntLit.unapply)
      Seq((a.name, ls.min, ls.max))
    case _ => Nil
  }
}
