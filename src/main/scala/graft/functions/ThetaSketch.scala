package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** KMV / theta sketch (Bar-Yossef et al. 2002; Dasgupta, Lang, Rhodes,
  * Thaler, "Theta sketches", 2016) — the SET-OPERATION member of the
  * engine's mergeable-sketch family. HLL (distinct), CMS (frequency),
  * Bloom (membership), MinHash (similarity) and KLL (rank) all union,
  * but none of them can INTERSECT two summaries: "how many users were
  * active on BOTH days" from two per-day blobs is exactly the query HLL
  * cannot answer. A KMV sketch — the k smallest distinct 64-bit hash
  * values of a key column — can, because two sketches' retained samples
  * are comparable below their common theta threshold.
  *
  *  - `theta_sketch_agg(key, k)`       — aggregate a long key column
  *    into one serialized sketch (BINARY, 8k bytes + header at cap);
  *  - `theta_union_agg(sk)`            — aggregate sketch blobs into
  *    one (exact set-union of retained hashes, re-trimmed to k);
  *  - `theta_estimate(sk)`             — distinct-count estimate;
  *  - `theta_intersect_estimate(a, b)` — |A ∩ B| estimate from two
  *    blobs;
  *  - `theta_anotb_estimate(a, b)`     — |A \ B| estimate from two
  *    blobs (set difference — churn from the same per-day table whose
  *    intersection gives retention).
  *
  * Structure: hash each key through splitmix64 (public-domain finalizer,
  * Steele/Lea/Flood 2014) and keep the k smallest DISTINCT values under
  * unsigned order. Below capacity the sketch is the exact distinct hash
  * set, so every estimate is exact; at capacity the k-th minimum v_k
  * defines theta = v_k/2^64 and the k−1 retained values below it are a
  * uniform theta-sample of the key universe, giving the classic
  * estimates |A| ≈ (k−1)/theta and, for two sketches compared below
  * theta_cap = min(theta_A, theta_B), |A ∩ B| ≈ |{x ∈ A ∩ B : x <
  * theta_cap}| / theta_cap. Relative standard error is ~1/sqrt(k−2) for
  * the distinct estimate; the intersection error scales with
  * sqrt(|A ∪ B| / (k·|A ∩ B|)), so callers gate it against an exact
  * column (the shipped `events_retention_sketch` discipline) rather
  * than trusting the constant.
  *
  * Unlike KLL (whose compaction coin makes partial-merge order visible
  * in the bits), KMV state is a pure set: "k smallest distinct hashes"
  * is order-insensitive, so shard-merge equals one-pass BYTE-FOR-BYTE —
  * [[graft.ThetaSketchSpec]] pins that equality, and it is why the
  * per-day sketch table is safely content-fingerprintable.
  *
  * Sketches built at different k merge naturally (the union trims to
  * the SMALLER k — a theta sketch downsamples); the merge aggregate's
  * initial buffer is the k=0 empty sentinel that adopts the first
  * blob's k.
  */
object ThetaSketch {

  /** splitmix64 finalizer: golden-gamma increment + two xor-multiply
    * rounds. Deterministic across runs/JVMs — the same key always lands
    * on the same hash, so sketches replay identically on any cluster. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Monotone map from unsigned-long hash space to (0, 1]: the fraction
    * of the hash universe at or below h. Top 53 bits — enough that the
    * estimate's own ~1/sqrt(k) error dwarfs the truncation. */
  private def unit(h: Long): Double =
    ((h >>> 11).toDouble + 1.0) / (1L << 53).toDouble

  /** Mutable sketch state: the k smallest distinct hashes in unsigned
    * order. `k == 0` is the "empty, k not yet adopted" sentinel used by
    * the union aggregate's initial buffer. */
  final class ThetaBuffer(var k: Int) {
    val set = new java.util.TreeSet[java.lang.Long](
      new java.util.Comparator[java.lang.Long] {
        override def compare(a: java.lang.Long, b: java.lang.Long): Int =
          java.lang.Long.compareUnsigned(a, b)
      })

    def isFull: Boolean = k > 0 && set.size == k

    def updateHash(h: Long): Unit = {
      require(k > 0, "theta: update on an uninitialized (k=0) buffer")
      if (set.size < k) { set.add(h); () }
      else if (java.lang.Long.compareUnsigned(h, set.last) < 0 && !set.contains(h)) {
        set.add(h)
        set.remove(set.last)
      }
    }

    def update(key: Long): Unit = updateHash(splitmix64(key))

    /** Set-union of retained hashes, trimmed to min(k, other.k): a
      * theta sketch downsamples, so mixed-k unions are well-defined. */
    def mergeFrom(other: ThetaBuffer): Unit = {
      if (other.k == 0) return
      k = if (k == 0) other.k else math.min(k, other.k)
      val it = other.set.iterator()
      while (it.hasNext) set.add(it.next())
      while (set.size > k) set.remove(set.last)
    }

    /** Exact (= retained count) below capacity; (k−1)/theta at it. */
    def estimate: Double =
      if (!isFull) set.size.toDouble
      else (k - 1).toDouble / unit(set.last)

    def serialize(): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 4 + set.size * 8)
      bb.putInt(k)
      bb.putInt(set.size)
      val it = set.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }
  }

  def deserialize(bytes: Array[Byte]): ThetaBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ThetaBuffer(bb.getInt)
    val m = bb.getInt
    var i = 0
    while (i < m) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  /** Retained sample (ascending unsigned) and theta boundary of a
    * serialized sketch: a FULL sketch's sample is its k−1 values
    * strictly below v_k with theta = v_k; a partial sketch's sample is
    * everything with theta = "whole universe" (hasTheta = false). */
  private def sampleOf(bytes: Array[Byte]): (Array[Long], Boolean, Long) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val m = bb.getInt
    val vals = new Array[Long](m)
    var i = 0
    while (i < m) { vals(i) = bb.getLong; i += 1 }
    if (k > 0 && m == k) (java.util.Arrays.copyOf(vals, m - 1), true, vals(m - 1))
    else (vals, false, 0L)
  }

  /** |A ∩ B| estimate: count the common sample hashes below the capped
    * theta, divide by it. Exact when both sketches are below capacity
    * (theta = 1, samples are the full distinct hash sets). O(k) merge
    * walk over two sorted arrays. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (sa, fa, ta) = sampleOf(a)
    val (sb, fb, tb) = sampleOf(b)
    val hasTheta = fa || fb
    val thetaLong =
      if (fa && fb) { if (java.lang.Long.compareUnsigned(ta, tb) < 0) ta else tb }
      else if (fa) ta else tb
    var i = 0
    var j = 0
    var common = 0L
    while (i < sa.length && j < sb.length) {
      val c = java.lang.Long.compareUnsigned(sa(i), sb(j))
      if (c == 0) {
        if (!hasTheta || java.lang.Long.compareUnsigned(sa(i), thetaLong) < 0) common += 1
        i += 1; j += 1
      } else if (c < 0) i += 1
      else j += 1
    }
    if (!hasTheta) common.toDouble else common.toDouble / unit(thetaLong)
  }

  /** |A \ B| estimate — the third set operation (union, intersection,
    * DIFFERENCE), same comparable-sample argument as
    * [[intersectEstimate]]: below the capped theta both samples are
    * uniform theta-samples of the key universe, so the A-sample hashes
    * absent from B's sample are a theta-sample of A \ B. Count them,
    * divide by the capped theta. Exact when both sketches are below
    * capacity. Identity with the intersection (pinned in
    * [[graft.ThetaSketchSpec]]): at a common capped theta,
    * a_not_b(A,B) + intersect(A,B) = |{x ∈ sample_A : x < theta_cap}| /
    * theta_cap, so churn + retention reconstructs the day's actives. */
  def aNotBEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val (sa, fa, ta) = sampleOf(a)
    val (sb, fb, tb) = sampleOf(b)
    val hasTheta = fa || fb
    val thetaLong =
      if (fa && fb) { if (java.lang.Long.compareUnsigned(ta, tb) < 0) ta else tb }
      else if (fa) ta else tb
    var i = 0
    var j = 0
    var only = 0L
    while (i < sa.length) {
      val h = sa(i)
      if (hasTheta && java.lang.Long.compareUnsigned(h, thetaLong) >= 0) {
        i = sa.length // samples are ascending: everything past theta is out
      } else {
        while (j < sb.length && java.lang.Long.compareUnsigned(sb(j), h) < 0) j += 1
        if (j >= sb.length || sb(j) != h) only += 1
        i += 1
      }
    }
    if (!hasTheta) only.toDouble else only.toDouble / unit(thetaLong)
  }

  // ----------------------------------------------------------- aggregates

  /** `theta_sketch_agg(key, k)`: long key column → serialized sketch. */
  case class ThetaSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaBuffer] with ImplicitCastInputTypes {

    require(k >= 16, s"theta_sketch_agg: k must be >= 16, got $k")

    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): ThetaBuffer = new ThetaBuffer(k)

    override def update(buf: ThetaBuffer, input: InternalRow): ThetaBuffer = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: ThetaBuffer, other: ThetaBuffer): ThetaBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: ThetaBuffer): Any = buf.serialize()
    override def serialize(buf: ThetaBuffer): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): ThetaBuffer = ThetaSketch.deserialize(bytes)

    override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): ThetaSketchAgg = copy(child = c(0))
    override def prettyName: String = "theta_sketch_agg"
  }

  /** `theta_union_agg(sk)`: serialized sketches → one serialized sketch
    * (set-union of retained hashes, trimmed to the smallest k seen). */
  case class ThetaUnionAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaBuffer] with ExpectsInputTypes {

    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = BinaryType

    override def createAggregationBuffer(): ThetaBuffer = new ThetaBuffer(0)

    override def update(buf: ThetaBuffer, input: InternalRow): ThetaBuffer = {
      val v = child.eval(input)
      if (v != null) buf.mergeFrom(ThetaSketch.deserialize(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: ThetaBuffer, other: ThetaBuffer): ThetaBuffer = {
      buf.mergeFrom(other); buf
    }

    override def eval(buf: ThetaBuffer): Any = buf.serialize()
    override def serialize(buf: ThetaBuffer): Array[Byte] = buf.serialize()
    override def deserialize(bytes: Array[Byte]): ThetaBuffer = ThetaSketch.deserialize(bytes)

    override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): ThetaUnionAgg = copy(child = c(0))
    override def prettyName: String = "theta_union_agg"
  }

  // ------------------------------------------------------------- scalars

  /** `theta_estimate(sk)`: distinct-count estimate of a serialized
    * sketch — exact (retained count) below capacity. Per-row
    * deserialization: meant for the handful of rows a sketch table
    * aggregates down to, not for corpus-scale columns. */
  case class ThetaEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[DataType] = Seq(BinaryType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(blob: Any): Any =
      ThetaSketch.deserialize(blob.asInstanceOf[Array[Byte]]).estimate

    override protected def withNewChildInternal(c: Expression): ThetaEstimate =
      copy(child = c)
    override def prettyName: String = "theta_estimate"
  }

  /** `theta_intersect_estimate(a, b)`: |A ∩ B| estimate from two
    * serialized sketches — exact when both are below capacity. */
  case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any =
      intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaIntersectEstimate =
      copy(left = l, right = r)
    override def prettyName: String = "theta_intersect_estimate"
  }

  /** `theta_anotb_estimate(a, b)`: |A \ B| estimate from two serialized
    * sketches — exact when both are below capacity. */
  case class ThetaANotBEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

    override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def nullSafeEval(a: Any, b: Any): Any =
      aNotBEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): ThetaANotBEstimate =
      copy(left = l, right = r)
    override def prettyName: String = "theta_anotb_estimate"
  }

  // ------------------------------------------------------------ column API

  def theta_sketch_agg(key: Column, k: Int): Column =
    ColumnBridge.column(ThetaSketchAgg(
      ColumnBridge.expression(key), k).toAggregateExpression())

  def theta_union_agg(sk: Column): Column =
    ColumnBridge.column(ThetaUnionAgg(
      ColumnBridge.expression(sk)).toAggregateExpression())

  def theta_estimate(sk: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(sk)))

  def theta_intersect_estimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersectEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def theta_anotb_estimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaANotBEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
