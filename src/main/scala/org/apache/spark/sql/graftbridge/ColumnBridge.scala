package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

/** Spark 4 removed the public `new Column(Expression)` constructor; the
  * classic-backend bridge lives behind `private[sql]`. This shim exposes
  * exactly the conversions our custom expressions and sources need. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `internalCreateDataFrame` for custom sources that already produce
    * Tungsten-format rows (skips the external-Row conversion layer). */
  def internalDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** Explicit direct-buffer unmap (`StorageUtils.dispose` is
    * private[spark]) — used by the mmap line scan to release chunk
    * mappings at task end instead of waiting for GC. */
  def disposeBuffer(bb: java.nio.ByteBuffer): Unit =
    org.apache.spark.storage.StorageUtils.dispose(bb)

  /** Free the storage blocks behind a `localCheckpoint`ed Dataset.
    * `Dataset.unpersist()` only consults the CacheManager, which never
    * registered a checkpoint's RDD blocks — so an iterative algorithm
    * that checkpoints per round (lineage truncation) would otherwise
    * leak every round's blocks until nondeterministic ContextCleaner
    * GC. The checkpointed RDD lives in the plan's `LogicalRDD`
    * (private[sql]); unpersist it directly. No-op on a non-checkpoint
    * plan. */
  def freeLocalCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Register a SQL function into a LIVE session's registry —
    * `SparkSession.sessionState` is `private[sql]`, so the in-session
    * counterpart of `SparkSessionExtensions.injectFunction` (which
    * only applies at session construction) needs this bridge. */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(id, info, builder)
}
