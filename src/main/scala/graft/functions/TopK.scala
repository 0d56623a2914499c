package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-by-score aggregation.
  *
  * `groupBy(q).agg(topk_by_score(sim, id, k))` keeps AT MOST k entries
  * of state per group at every stage — update, map-side partial
  * aggregation, shuffle, and final merge. This is what makes exact
  * top-k-per-query scale: the alternative, a window
  * `row_number() <= k` over all scored pairs, must SHUFFLE every pair
  * to its query's partition first (O(candidates) rows through the
  * exchange), whereas this aggregate reduces each task's pairs to k
  * per query before anything moves (O(groups-per-task * k)).
  *
  * Built-ins can't express this: `collect_list` partial state is
  * unbounded, and `max_by` keeps only one. Total order is
  * (score DESC, id ASC) — deterministic under ties — and the result is
  * the sorted `array<struct<id,score>>`, so `posexplode` yields ranks.
  */
object TopK {

  /** Insertion-sorted bounded buffer: arrays of length k, best first.
    * k is small (single digits for top-k queries), so O(k) insert and
    * O(k) merge beat any heap in constant factors. */
  final class TopKBuffer(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    // Spark's double TOTAL order (java.lang.Double.compare): NaN ranks
    // above every score and -0.0 < 0.0 — matching the window
    // `row_number() over (order by score desc)` formulation this
    // aggregate claims equivalence to (Spark sorts NaN FIRST under
    // desc). A plain `>` would silently drop NaN scores instead.
    @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(s1, s2)
      c > 0 || (c == 0 && i1 < i2)
    }

    def offer(score: Double, id: Long): Unit = {
      if (size == k) {
        if (!beats(score, id, scores(k - 1), ids(k - 1))) return
        size -= 1
      }
      var i = size - 1
      while (i >= 0 && beats(score, id, scores(i), ids(i))) {
        scores(i + 1) = scores(i); ids(i + 1) = ids(i); i -= 1
      }
      scores(i + 1) = score; ids(i + 1) = id
      size += 1
    }
  }

  case class TopKByScore(
      score: Expression,
      id: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ImplicitCastInputTypes {

    require(k > 0, s"topk_by_score: k must be positive, got $k")

    // The buffer reads primitive (Double, Long); the SQL surface can
    // hand this aggregate INT/FLOAT/DECIMAL columns — coerce at
    // analysis like the vector expressions, never CCE in update().
    override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)
    override def children: Seq[Expression] = Seq(score, id)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))), containsNull = false)

    override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

    override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
      val s = score.eval(input)
      val i = id.eval(input)
      if (s != null && i != null) {
        buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
      }
      buf
    }

    override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
      var i = 0
      while (i < other.size) { buf.offer(other.scores(i), other.ids(i)); i += 1 }
      buf
    }

    override def eval(buf: TopKBuffer): Any = {
      val out = new Array[Any](buf.size)
      var i = 0
      while (i < buf.size) {
        out(i) = InternalRow(buf.ids(i), buf.scores(i))
        i += 1
      }
      new GenericArrayData(out)
    }

    override def serialize(buf: TopKBuffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + buf.size * 16)
      bb.putInt(buf.size)
      var i = 0
      while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): TopKBuffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new TopKBuffer(k)
      var i = 0
      while (i < n) {
        val s = bb.getDouble; val id = bb.getLong
        buf.offer(s, id)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): TopKByScore =
      copy(score = newChildren(0), id = newChildren(1))
    override def prettyName: String = "topk_by_score"
  }

  /** Sorted `array<struct<id,score>>` of the k best (score DESC, id ASC)
    * rows per group. */
  def topk_by_score(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score),
      ColumnBridge.expression(id), k).toAggregateExpression())
}
