package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property coverage for the SQ8 expressions over random stats and
  * vectors (the oracle only ever sees the fixture's distribution):
  * code bounds, the distortion identity, encode→ADC consistency, and
  * the exactness law that zero-width dimensions reconstruct
  * exactly. Seeded generators, the RoundtripPropertySpec discipline. */
class SqPropertySpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A])(body: A => Unit): Unit =
    (1 to 15).foreach { i =>
      gen.apply(Gen.Parameters.default.withSize(8), Seed(i.toLong)) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $a", e)
          }
        case None =>
      }
    }

  private val Levels = 256

  private val genCase: Gen[(Array[Long], Array[Long], Array[Long])] = for {
    dim <- Gen.chooseNum(1, 16)
    mins <- Gen.listOfN(dim, Gen.chooseNum(-5000L, 5000L))
    widths <- Gen.listOfN(dim, Gen.chooseNum(0L, 10000L))
    // the vector: anywhere from inside the range to well outside it
    xs <- Gen.listOfN(dim, Gen.chooseNum(-20000L, 20000L))
  } yield (mins.toArray,
    mins.zip(widths).map { case (m, w) => m + w }.toArray,
    xs.toArray)

  private def encode(vq: Array[Long], mns: Array[Long], mxs: Array[Long]) = {
    import spark.implicits._
    Seq(Tuple1(vq.toSeq)).toDF("vq")
      .select(VectorOps.sq_encode(col("vq"), mns, mxs, Levels).as("sc"))
      .select(col("sc.codes"), col("sc.distortion")).head()
  }

  test("codes stay in [0, 255] and distortion is the exact error sum") {
    forAllSeeded(genCase) { case (mns, mxs, xs) =>
      val r = encode(xs, mns, mxs)
      val codes = r.getSeq[Int](0)
      assert(codes.forall(c => c >= 0 && c < Levels), s"code out of range: $codes")
      val dist = codes.indices.map { i =>
        val rng = mxs(i) - mns(i)
        val recon = mns(i) + codes(i).toLong * rng / (Levels - 1)
        val e = xs(i) - recon
        e * e
      }.sum
      assert(r.getLong(1) == dist)
    }
  }

  test("in-range vectors reconstruct within one quantization step per dim") {
    forAllSeeded(genCase) { case (mns, mxs, xs) =>
      val clamped = xs.indices.map(i =>
        math.max(mns(i), math.min(mxs(i), xs(i)))).toArray
      val r = encode(clamped, mns, mxs)
      val codes = r.getSeq[Int](0)
      codes.indices.foreach { i =>
        val rng = mxs(i) - mns(i)
        val recon = mns(i) + codes(i).toLong * rng / (Levels - 1)
        val step = math.max(1L, rng / (Levels - 1) + 1)
        assert(math.abs(clamped(i) - recon) <= step,
          s"dim $i: x=${clamped(i)} recon=$recon step=$step (rng=$rng)")
      }
    }
  }

  test("sq_adc_l2 of a vector's own codes equals its distortion (in range)") {
    import spark.implicits._
    forAllSeeded(genCase) { case (mns, mxs, xs) =>
      val clamped = xs.indices.map(i =>
        math.max(mns(i), math.min(mxs(i), xs(i)))).toArray
      val r = encode(clamped, mns, mxs)
      val codes = r.getSeq[Int](0)
      val adc = Seq((codes, clamped.toSeq)).toDF("codes", "y")
        .select(VectorOps.sq_adc_l2(col("codes"), col("y"), mns, mxs, Levels))
        .head().getLong(0)
      assert(adc == r.getLong(1),
        "ADC against the vector's own reconstruction must equal encode distortion")
    }
  }

  test("zero-width dimensions reconstruct exactly") {
    forAllSeeded(Gen.chooseNum(-9999L, 9999L)) { v =>
      val r = encode(Array(v), Array(v), Array(v))
      assert(r.getSeq[Int](0) == Seq(0) && r.getLong(1) == 0L)
    }
  }

  test("corrupt inputs are nulls, not wrong answers") {
    import spark.implicits._
    val mns = Array(0L, 0L); val mxs = Array(10L, 10L)
    // wrong dimension
    val e = Seq(Tuple1(Seq(1L))).toDF("vq")
      .select(VectorOps.sq_encode(col("vq"), mns, mxs, Levels).as("sc")).head()
    assert(e.isNullAt(0))
    // out-of-range code in the ADC
    val a = Seq((Seq(0, 999), Seq(1L, 1L))).toDF("codes", "y")
      .select(VectorOps.sq_adc_l2(col("codes"), col("y"), mns, mxs, Levels)).head()
    assert(a.isNullAt(0))
  }
}
