package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Width-capped id-list aggregation for LSH bucket grouping.
  *
  * `groupBy(band, sig).agg(capped_sorted_ids(id, cap))` returns
  * `struct<width: long, ids: array<long>>` where `width` is the TRUE
  * bucket width (every row counted) and `ids` is the complete sorted
  * member list iff `width <= cap`, else an empty array.
  *
  * The point is the aggregation-state bound. A plain
  * `collect_list` + post-filter materializes a pathological hot
  * bucket's FULL id list in one aggregation buffer before the cap
  * filter ever runs — at corpus scale a ubiquitous boilerplate
  * signature is an OOM/straggler on that one reducer. Here the buffer
  * holds at most `cap` ids: the running count is monotone under both
  * update and merge, so the moment a partial exceeds the cap its final
  * bucket is GUARANTEED over-cap (counts only grow) and the buffer
  * discards its elements permanently, carrying the count alone. That
  * bounds update state, shuffle bytes (partial-agg serialization), and
  * merge state all at once — the degenerate bucket costs 8 bytes, not
  * gigabytes.
  *
  * Counting first and anti-joining over-cap keys out would achieve the
  * same bound but consumes the banded input twice — re-running the
  * whole signature pipeline (the exact recompute the bucket-group
  * formulation exists to avoid, since CollectMetrics blocks exchange
  * reuse). This aggregate keeps the single pass.
  *
  * `eval` sorts the kept ids (≤ cap elements, O(cap log cap) per
  * bucket), so callers get the sorted array `sort_array(collect_list)`
  * used to produce without a second pass.
  */
object CappedCollect {

  /** Growable long buffer that permanently drops elements once the
    * running count exceeds `cap`. */
  final class CappedIdsBuffer(val cap: Int) {
    var count: Long = 0L
    var ids: Array[Long] = new Array[Long](math.min(cap, 16))
    var n: Int = 0

    @inline private def drop(): Unit = { ids = Array.emptyLongArray; n = 0 }

    def add(id: Long): Unit = {
      count += 1
      if (count > cap) { if (n > 0 || ids.length > 0) drop() }
      else {
        if (n == ids.length) {
          val grown = new Array[Long](math.min(cap, math.max(4, ids.length * 2)))
          System.arraycopy(ids, 0, grown, 0, n)
          ids = grown
        }
        ids(n) = id; n += 1
      }
    }

    def mergeFrom(other: CappedIdsBuffer): Unit = {
      count += other.count
      if (count > cap) { if (n > 0 || ids.length > 0) drop() }
      else {
        if (n + other.n > ids.length) {
          val grown = new Array[Long](math.min(cap, math.max(n + other.n, ids.length * 2)))
          System.arraycopy(ids, 0, grown, 0, n)
          ids = grown
        }
        System.arraycopy(other.ids, 0, ids, n, other.n)
        n += other.n
      }
    }
  }

  case class CappedSortedIds(
      id: Expression,
      cap: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedIdsBuffer] with ImplicitCastInputTypes {

    require(cap > 0, s"capped_sorted_ids: cap must be positive, got $cap")

    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def children: Seq[Expression] = Seq(id)
    override def nullable: Boolean = false
    override def dataType: DataType = StructType(Seq(
      StructField("width", LongType, nullable = false),
      StructField("ids", ArrayType(LongType, containsNull = false), nullable = false)))

    override def createAggregationBuffer(): CappedIdsBuffer = new CappedIdsBuffer(cap)

    override def update(buf: CappedIdsBuffer, input: InternalRow): CappedIdsBuffer = {
      val v = id.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: CappedIdsBuffer, other: CappedIdsBuffer): CappedIdsBuffer = {
      buf.mergeFrom(other)
      buf
    }

    override def eval(buf: CappedIdsBuffer): Any = {
      if (buf.count > cap) {
        InternalRow(buf.count, new GenericArrayData(Array.emptyLongArray))
      } else {
        val out = java.util.Arrays.copyOf(buf.ids, buf.n)
        java.util.Arrays.sort(out)
        InternalRow(buf.count, new GenericArrayData(out))
      }
    }

    override def serialize(buf: CappedIdsBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 4 + buf.n * 8)
      bb.putLong(buf.count)
      bb.putInt(buf.n)
      var i = 0
      while (i < buf.n) { bb.putLong(buf.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): CappedIdsBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new CappedIdsBuffer(cap)
      buf.count = bb.getLong
      val n = bb.getInt
      if (buf.count <= cap && n > 0) {
        buf.ids = new Array[Long](n)
        var i = 0
        while (i < n) { buf.ids(i) = bb.getLong; i += 1 }
        buf.n = n
      } else if (buf.count > cap) {
        buf.ids = Array.emptyLongArray; buf.n = 0
        // skip any serialized ids (there are none once overflowed)
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): CappedSortedIds =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CappedSortedIds =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): CappedSortedIds =
      copy(id = newChildren(0))
    override def prettyName: String = "capped_sorted_ids"
  }

  /** `struct<width, ids>`: true group width plus the sorted id array,
    * complete iff width ≤ cap (empty otherwise), with aggregation state
    * bounded at cap ids per group at every stage. */
  def capped_sorted_ids(id: Column, cap: Int): Column =
    ColumnBridge.column(CappedSortedIds(
      ColumnBridge.expression(id), cap).toAggregateExpression())
}
