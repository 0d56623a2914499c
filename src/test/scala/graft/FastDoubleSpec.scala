package graft

import graft.functions.FastDouble.fast_try_double
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** fast_try_double must be BIT-identical to `try_cast(s AS DOUBLE)` on
  * every input: the parse leg substitutes it for the cast, so any
  * divergence is an oracle-parity bug, not a perf trade. Adversarial
  * fixed cases + seeded random decimals (both inside and beyond the
  * 15-digit fast path). */
class FastDoubleSpec extends SparkSpec {

  private def check(inputs: Seq[String]): Unit = {
    import spark.implicits._
    val df = inputs.toDF("s")
      .select(col("s"), fast_try_double(col("s")).as("fast"),
        col("s").try_cast(DoubleType).as("cast"))
    // bit-exact compare driver-side (collect runs the codegen'd path)
    val rows = df.collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val f = if (r.isNullAt(1)) null else java.lang.Double.valueOf(r.getDouble(1))
      val c = if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2))
      val eq = (f == null && c == null) || (f != null && c != null &&
        java.lang.Double.doubleToLongBits(f) == java.lang.Double.doubleToLongBits(c))
      assert(eq, s"fast_try_double('$s') = $f, try_cast = $c")
    }
  }

  test("fixed adversarial inputs match try_cast bit-for-bit") {
    check(Seq(
      "0", "-0", "+0", "0.0", "-0.0", "1", "-1", "  42  ", "3.14", "-3.14",
      "12345.67", "999999999999999", "9999999999999999", "99999999999999999999",
      "0.000000000000001", "1.7976931348623157E308", "4.9e-324", "2.5e10",
      "1e999", "-1e999", ".5", "5.", "-.5", "+5.", "5..5", "..", ".",
      "", " ", "+", "-", "abc", "1a", "a1", "0x1.8p1", "1.5d", "1.5f",
      "NaN", "nan", "NAN", "Infinity", "-Infinity", "inf", "+inf", "-inf",
      "infinity", "+infinity", "-infinity", "Inf", " iNf ", "infinityy",
      "0.30000000000000004", "0.1", "0.2", "0.3", "1.005", "1000000.000001",
      "00000000000000000000001.5", "1.50000000000000000000000",
      "179769313486231570000000000000000000000000000000000000000000000000" +
        "0000000000000000000000000000000000000000000000000000000000000000" +
        "000000000000000000000000000000000000000000000000000000000000000000" +
        "00000000000000000000000000000000000000000000000000000000000000000000",
      "é1.5", "1.5é", "１.５" // non-ASCII digits must fail both sides
    ))
  }

  test("seeded random decimals match try_cast bit-for-bit") {
    val genPlain = for {
      neg <- Gen.oneOf("", "-", "+")
      ints <- Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, Gen.numChar)).map(_.mkString)
      dot <- Gen.oneOf(true, false)
      fracs <- Gen.chooseNum(0, 20).flatMap(n => Gen.listOfN(n, Gen.numChar)).map(_.mkString)
      pad <- Gen.oneOf("", " ", "  ")
    } yield s"$pad$neg$ints${if (dot) "." else ""}$fracs$pad"
    val genExp = for {
      base <- genPlain
      e <- Gen.oneOf("e", "E")
      es <- Gen.oneOf("", "-", "+")
      ed <- Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, Gen.numChar)).map(_.mkString)
    } yield s"${base.trim}$e$es$ed"
    val inputs = (1 to 400).flatMap { i =>
      val g = if (i % 3 == 0) genExp else genPlain
      g.apply(Gen.Parameters.default.withSize(10), Seed(i.toLong)).toSeq
    }
    check(inputs)
  }
}
