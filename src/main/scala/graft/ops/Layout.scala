package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Data-layout operators: the physical-design half of the 100 TB story
  * that the flat fixture parquet can't show — bucketed tables that make
  * the repeated fact-fact join shuffle-free, and date-partitioned
  * layout whose scans prune to the filtered partitions.
  *
  * Both operators STAGE a layout first (write the fixture into the
  * bucketed / partitioned form, memoized per JVM and per sf dir), then
  * run the query against the staged layout. That split mirrors
  * production: the table layout exists once, written by the ingest
  * job; the measured query is the read side. The staged content is
  * row-identical to the source parquet, so the DuckDB oracle runs the
  * same query over the raw fixture views.
  *
  * Scale:
  *  - `q_bucketed_join`: orders and lineitem bucketed 8 ways on their
  *    order key, one file per bucket (the pre-write `repartition(n,
  *    key)` uses the same murmur3-pmod hash as the bucket spec, so
  *    each task holds exactly one bucket). A sort-merge join between
  *    co-bucketed tables needs NO exchange on either side — at 100 TB
  *    this is the difference between re-shuffling both fact tables on
  *    every join and never shuffling them at all. The spec pins zero
  *    shuffle exchanges in the join subtree.
  *  - `q_partition_prune`: events written `partitionBy(day)`; a 7-day
  *    filter must read 7 directories, not 30. Pruning happens at
  *    planning from the partition VALUES (no file footers touched) —
  *    the spec asserts the scan's numFiles metric, not just plan text.
  */
object Layout {

  /** Bucket count for the co-located join. Small because the fixture
    * is; the plan property being pinned (no exchange) is bucket-count
    * independent — production would size buckets to target file size. */
  val NBuckets = 8

  /** Pruned query window: 7 days inside the fixture's 30-day range. */
  val PruneFrom = "2024-01-10"
  val PruneTo = "2024-01-16"

  // The house money-convention casts live in Relational — one home.
  private def dec2(c: Column): Column = Relational.dec2(c)
  private def one: Column = Relational.one

  /** Staging root: per (sf-dir, PROCESS). The memo and stage lock only
    * guard within one JVM — two processes (e.g. bench and verify
    * running together) sharing a dir-keyed root would race: one's
    * mode-overwrite stage deletes bucket/day files out from under the
    * other's running scan (r17 fix, per ADVICE). The pid discriminator
    * gives each process its own root at the cost of re-staging per
    * process — staging is fixture-scale and already paid once per JVM.
    * Lives under java.io.tmpdir, never inside the read-only testdata
    * dir. */
  private def stageTag(dir: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${h}p${ProcessHandle.current().pid()}"
  }

  private def stageRoot(dir: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft-layout-${stageTag(dir)}"
    // The pid-keyed root is garbage the moment this process exits (no
    // other process can ever reuse it — that isolation is the point),
    // so clean it on JVM shutdown; without this, every bench/verify
    // run leaves a staged copy of two fact tables in /tmp.
    cleanupRoots.computeIfAbsent(root, r => {
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(
        new java.io.File(r))))
      java.lang.Boolean.TRUE
    })
    root
  }

  private val cleanupRoots =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  private val stagedBuckets = scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private val stagedPartitions = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Write orders + lineitem as co-bucketed catalog tables (external,
    * path under the stage root) and return their table names. The
    * pre-write repartition on the bucket key makes each write task own
    * exactly one bucket -> one file per bucket, which is also what
    * lets the bucketed scan surface its sortBy order. */
  private def bucketedTables(spark: SparkSession, dir: String): (String, String) = {
    // The memo caches per JVM, but catalog entries live per SESSION: a
    // second session in the same JVM (fresh in-memory catalog) would
    // resolve the cached names to nothing — detect and re-stage.
    stagedBuckets.get(dir).filter { case (o, l) =>
      spark.catalog.tableExists(o) && spark.catalog.tableExists(l)
    }.getOrElse(stageBuckets(spark, dir))
  }

  private def stageBuckets(spark: SparkSession, dir: String): (String, String) =
    stagedBuckets.synchronized {
      // Post-lock recheck: a contender that queued behind the stager
      // must not overwrite the tables the winner's query is reading.
      val cached = stagedBuckets.get(dir).filter { case (o, l) =>
        spark.catalog.tableExists(o) && spark.catalog.tableExists(l)
      }
      cached.getOrElse {
        val root = stageRoot(dir)
        val tag = stageTag(dir)
        val oTbl = s"graft_bucketed_orders_$tag"
        val lTbl = s"graft_bucketed_lineitem_$tag"
        spark.read.parquet(s"$dir/orders.parquet")
          .repartition(NBuckets, col("o_orderkey"))
          .write.mode("overwrite")
          .bucketBy(NBuckets, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$root/orders_bucketed")
          .saveAsTable(oTbl)
        spark.read.parquet(s"$dir/lineitem.parquet")
          .repartition(NBuckets, col("l_orderkey"))
          .write.mode("overwrite")
          .bucketBy(NBuckets, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$root/lineitem_bucketed")
          .saveAsTable(lTbl)
        stagedBuckets.put(dir, (oTbl, lTbl))
        (oTbl, lTbl)
      }
    }

  /** Write events date-partitioned (day directories) and return the
    * path. One file per day: repartition on the partition column first
    * for the same one-task-one-directory reason as the buckets. */
  private def partitionedEvents(spark: SparkSession, dir: String): String =
    // Same shape as bucketedTables/stageBuckets: memo probe, then a
    // LOCKED stage with a post-lock recheck. TrieMap.getOrElseUpdate
    // evaluates a racing thunk in every contender and resolves with
    // putIfAbsent after — the loser's overwrite would delete the day
    // directories out from under the winner's already-running scan.
    stagedPartitions.get(dir).getOrElse(stagePartitions(spark, dir))

  private def stagePartitions(spark: SparkSession, dir: String): String =
    stagedPartitions.synchronized {
      stagedPartitions.get(dir).getOrElse {
        val path = s"${stageRoot(dir)}/events_by_day"
        Sessions.events(spark, dir)
          .withColumn("day", to_date(col("ts")))
          .repartition(col("day"))
          .write.mode("overwrite").partitionBy("day").parquet(path)
        stagedPartitions.put(dir, path)
        path
      }
    }

  /** The exchange-free co-bucketed join, exposed for the plan spec:
    * lineitem joined to orders on the bucket key, `merge` hints on
    * both sides so the pinned property is the SortMergeJoin's (a
    * broadcast at fixture scale would bypass bucketing and pin
    * nothing — at 100 TB neither fact side broadcasts anyway).
    *
    * A per-task Sort remains above each bucketed scan: Spark >= 3.0
    * only surfaces the sortBy file order behind
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` (multi-file
    * buckets made the claimed ordering unsound). The sort runs
    * per-task over already-sorted single-file buckets — near-linear,
    * no shuffle, no spill pressure — so the session-wide legacy flag
    * is not worth it; the property this layout buys is the absent
    * EXCHANGE, which is what the spec pins. */
  private[graft] def bucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val (oTbl, lTbl) = bucketedTables(spark, dir)
    spark.table(lTbl).hint("merge")
      .join(spark.table(oTbl).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
  }

  /** `q_bucketed_join`: revenue per order priority over the
    * co-bucketed orders ⋈ lineitem. The join subtree has zero
    * exchanges (spec-pinned); the only shuffle in the query is the
    * final 5-group partial aggregate. */
  def qBucketedJoin(spark: SparkSession, dir: String): DataFrame =
    bucketedJoin(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        sum(dec2(col("l_extendedprice")) * (one - dec2(col("l_discount"))))
          .cast(DecimalType(27, 4)).cast("double").as("revenue"))
      .orderBy("o_orderpriority")

  val qBucketedJoinOracle: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_lineitems,
      |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DECIMAL(27,4)) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** The pruned scan, exposed for the numFiles spec: staged layout,
    * day-range filter. The filter lands in PartitionFilters (the
    * `day` column exists only as a partition value), so file listing
    * at planning time already excludes the other 23 day directories. */
  private[graft] def prunedScan(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(partitionedEvents(spark, dir))
      .filter(col("day").between(lit(PruneFrom).cast("date"),
        lit(PruneTo).cast("date")))

  /** `q_partition_prune`: per-day, per-type event counts and value
    * sums over a 7-of-30-day window, against the date-partitioned
    * layout. Decimal-exact sums per the house money convention. */
  def qPartitionPrune(spark: SparkSession, dir: String): DataFrame =
    prunedScan(spark, dir)
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec2(col("value"))).cast(DecimalType(18, 2))
          .cast("double").as("sum_value"))
      .orderBy("day", "event_type")

  val qPartitionPruneOracle: String =
    s"""SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
       |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE CAST(ts AS DATE) BETWEEN DATE '$PruneFrom' AND DATE '$PruneTo'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_partition_prune" -> (qPartitionPrune _),
  )

  def oracleSql: Map[String, String] = Map(
    "q_bucketed_join" -> qBucketedJoinOracle,
    "q_partition_prune" -> qPartitionPruneOracle,
  )
}
