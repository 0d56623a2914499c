package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketch (Karnin, Lang, Liberty, FOCS 2016) — the
  * missing member of the engine's MERGEABLE-sketch family (HLL
  * distinct, CMS frequency, Bloom membership, MinHash similarity;
  * KLL is the rank/quantile one).
  *
  * Spark's `percentile_approx` answers a quantile inside one query,
  * but its sketch never leaves the aggregation buffer: there is no
  * way to STORE a per-shard/per-day summary and re-aggregate
  * arbitrary ranges later, the way `hll_sketch_agg`/`hll_union_agg`
  * make the daily HLL table a durable artifact. These three functions
  * close that gap:
  *
  *  - `kll_sketch_agg(value, k)` — aggregate a double column into one
  *    serialized sketch (BINARY, a few KB at k=256);
  *  - `kll_merge_agg(sk)`        — aggregate sketch blobs into one
  *    (order-insensitive up to the documented coin caveat);
  *  - `kll_quantile(sk, q)`      — read a quantile off a blob.
  *
  * Structure: a ladder of weighted buffers ("compactors"). Level i
  * items carry weight 2^i; level capacities decay geometrically from
  * `k` at the TOP level by factor c = 2/3 (floored at 2), so total
  * state is ~3k items regardless of n. When a level overflows it is
  * sorted and every other item — alternating odd/even by a persistent
  * compaction counter, the standard derandomized coin — is promoted
  * with doubled weight. Compaction conserves TOTAL WEIGHT exactly
  * (2 items at w become 1 at 2w; an odd leftover stays), so the
  * sketch's weight always equals the true count n, and a rank read is
  * a walk over the ~3k (value, weight) pairs.
  *
  * Error: rank error concentrates at O(1/k) — k=256 lands well inside
  * ±1% in practice; the shipped queries gate it explicitly against
  * the exact CDF (the `events_quantiles` rank-interval discipline)
  * rather than trusting the constant.
  *
  * Determinism caveat (same as any mergeable sketch under Spark
  * partial aggregation): the derandomized coin makes a FIXED update/
  * merge order reproducible, but Spark merges partials in arrival
  * order, so two runs may produce bit-different (equally valid)
  * sketches. Anything oracle-pinned must therefore pin exact columns
  * and expose the sketch through a tolerance gate, never raw sketch
  * output.
  */
object KllSketch {

  private val GeomC = 2.0 / 3.0

  /** Mutable sketch state. `k == 0` is the "empty, k not yet adopted"
    * sentinel used by the merge aggregate's initial buffer. */
  final class KllBuffer(var k: Int) {
    var n: Long = 0L                 // true item count == total weight
    var compactions: Long = 0L       // derandomized coin
    var levels: Array[Array[Double]] = Array(new Array[Double](8))
    var sizes: Array[Int] = Array(0)

    private def height: Int = sizes.length

    /** Capacity of level i at the current height: k at the top,
      * decaying by c per level downward, floored at 2. */
    private def cap(i: Int): Int =
      math.max(2, math.ceil(k * math.pow(GeomC, (height - 1 - i).toDouble)).toInt)

    private def ensureLevel(i: Int): Unit = {
      if (i >= levels.length) {
        levels = java.util.Arrays.copyOf(levels, i + 1)
        sizes = java.util.Arrays.copyOf(sizes, i + 1)
        var j = 0
        while (j < levels.length) {
          if (levels(j) == null) { levels(j) = Array.emptyDoubleArray; sizes(j) = 0 }
          j += 1
        }
      }
    }

    private def push(i: Int, v: Double): Unit = {
      ensureLevel(i)
      if (sizes(i) == levels(i).length) {
        val grown = new Array[Double](math.max(8, levels(i).length * 2))
        System.arraycopy(levels(i), 0, grown, 0, sizes(i))
        levels(i) = grown
      }
      levels(i)(sizes(i)) = v
      sizes(i) += 1
    }

    def update(v: Double): Unit = {
      require(k > 0, "kll: update on an uninitialized (k=0) buffer")
      push(0, v)
      n += 1
      compress()
    }

    /** Compact the lowest over-capacity level until all levels fit.
      * Each compaction halves a level (promoting every other sorted
      * item at doubled weight), so the loop terminates. */
    private def compress(): Unit = {
      var again = true
      while (again) {
        again = false
        var i = 0
        while (i < height && !again) {
          if (sizes(i) > cap(i)) { compact(i); again = true }
          i += 1
        }
      }
    }

    private def compact(i: Int): Unit = {
      val m = sizes(i)
      if (m < 2) return
      java.util.Arrays.sort(levels(i), 0, m)
      val even = m - (m & 1)
      val offset = (compactions & 1L).toInt
      compactions += 1
      ensureLevel(i + 1)
      var j = 0
      while (j < even / 2) {
        push(i + 1, levels(i)(2 * j + offset))
        j += 1
      }
      // odd leftover (the max) stays behind at its own weight —
      // total weight is conserved exactly
      if ((m & 1) == 1) {
        levels(i)(0) = levels(i)(m - 1)
        sizes(i) = 1
      } else sizes(i) = 0
    }

    def mergeFrom(other: KllBuffer): Unit = {
      if (other.n == 0 && other.k == 0) return
      if (k == 0) k = other.k
      require(other.k == 0 || other.k == k,
        s"kll: merging sketches with different k (${other.k} vs $k)")
      n += other.n
      compactions += other.compactions
      var i = 0
      while (i < other.sizes.length) {
        var j = 0
        while (j < other.sizes(i)) { push(i, other.levels(i)(j)); j += 1 }
        i += 1
      }
      compress()
    }

    /** Value at rank ceil(q·n): walk the weight-sorted items. */
    def quantile(q: Double): Double = {
      require(n > 0, "kll: quantile of an empty sketch")
      val qq = math.min(1.0, math.max(0.0, q))
      var total = 0
      var i = 0
      while (i < height) { total += sizes(i); i += 1 }
      val vals = new Array[Double](total)
      val wts = new Array[Long](total)
      var p = 0
      i = 0
      while (i < height) {
        var j = 0
        while (j < sizes(i)) {
          vals(p) = levels(i)(j); wts(p) = 1L << i; p += 1; j += 1
        }
        i += 1
      }
      // indirect sort by value
      val idx = (0 until total).sortBy(vals(_))
      val target = math.max(1L, math.ceil(qq * n).toLong)
      var cum = 0L
      var r = 0
      while (r < total) {
        cum += wts(idx(r))
        if (cum >= target) return vals(idx(r))
        r += 1
      }
      vals(idx(total - 1))
    }

    def serialize(): Array[Byte] = {
      var total = 0
      var i = 0
      while (i < sizes.length) { total += sizes(i); i += 1 }
      val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + sizes.length * 4 + total * 8)
      bb.putInt(k); bb.putLong(n); bb.putLong(compactions)
      bb.putInt(sizes.length)
      i = 0
      while (i < sizes.length) {
        bb.putInt(sizes(i))
        var j = 0
        while (j < sizes(i)) { bb.putDouble(levels(i)(j)); j += 1 }
        i += 1
      }
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt)
    buf.n = bb.getLong
    buf.compactions = bb.getLong
    val h = bb.getInt
    buf.levels = new Array[Array[Double]](h)
    buf.sizes = new Array[Int](h)
    var i = 0
    while (i < h) {
      val m = bb.getInt
      buf.sizes(i) = m
      buf.levels(i) = new Array[Double](math.max(m, 1))
      var j = 0
      while (j < m) { buf.levels(i)(j) = bb.getDouble; j += 1 }
      i += 1
    }
    buf
  }

  // ----------------------------------------------------------- aggregates

  /** `kll_sketch_agg(value, k)`: double column → serialized sketch. */
  case class KllSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with ImplicitCastInputTypes {

    require(k >= 8, s"kll_sketch_agg: k must be >= 8, got $k")

    override def inputTypes: Seq[DataType] = Seq(DoubleType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: KllBuffer): Any = buf.serialize()
    override def serialize(buf: KllBuffer): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): KllBuffer = KllSketch.deserialize(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): KllSketchAgg = copy(child = c(0))
    override def prettyName: String = "kll_sketch_agg"
  }

  /** `kll_merge_agg(sk)`: serialized sketches → one serialized sketch.
    * The initial buffer is the k=0 empty sentinel; the first merged
    * blob's k is adopted, and mismatched k fails loudly. */
  case class KllMergeAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] with ExpectsInputTypes {

    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): KllBuffer = new KllBuffer(0)

    override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
      val v = child.eval(input)
      if (v != null) buf.mergeFrom(KllSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: KllBuffer): Any = buf.serialize()
    override def serialize(buf: KllBuffer): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): KllBuffer = KllSketch.deserialize(bytes)

    override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): KllMergeAgg = copy(child = c(0))
    override def prettyName: String = "kll_merge_agg"
  }

  /** `kll_quantile(sk, q)`: value at rank ceil(q·n) of a serialized
    * sketch; null on null/empty input. Deserialization cost is per
    * ROW — this is meant for the handful of rows a sketch table
    * aggregates down to, not for corpus-scale columns. */
  case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

    override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(blob: Any, q: Any): Any = {
      val buf = KllSketch.deserialize(blob.asInstanceOf[Array[Byte]])
      if (buf.n == 0) null else buf.quantile(q.asInstanceOf[Double])
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): KllQuantile = copy(left = l, right = r)
    override def prettyName: String = "kll_quantile"
  }

  // ------------------------------------------------------------ column API

  def kll_sketch_agg(value: Column, k: Int): Column =
    ColumnBridge.column(KllSketchAgg(
      ColumnBridge.expression(value), k).toAggregateExpression())

  def kll_merge_agg(sk: Column): Column =
    ColumnBridge.column(KllMergeAgg(
      ColumnBridge.expression(sk)).toAggregateExpression())

  def kll_quantile(sk: Column, q: Column): Column =
    ColumnBridge.column(KllQuantile(
      ColumnBridge.expression(sk), ColumnBridge.expression(q)))
}
