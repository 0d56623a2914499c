package graft

import graft.functions.VectorOps
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** vec_grid must be BIT-identical to the transform(round(x·scale)
  * .cast(long)) chain it replaced — every persisted index artifact
  * (PQ codebook, SQ stats, BQ medians, IVFADC codes) derives from
  * these grid values, so even a one-ulp rounding drift would orphan
  * them. Pins the corpus, the rounding edge cases (half-way ties both
  * signs, values Spark's BigDecimal.valueOf string-round path treats
  * differently from naive floor(x+0.5)), null elements, and the plan
  * property the expression exists for. */
class VecGridSpec extends SparkSpec {

  private def chain(c: org.apache.spark.sql.Column, scale: Int) =
    transform(c, x => round(x * scale).cast(LongType))

  test("vec_grid == the round-cast chain on the corpus, row for row") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
      .select(col("vec_id"),
        VectorOps.vec_grid(col("v"), Similarity.PqScale).as("a"),
        chain(col("v"), Similarity.PqScale).as("b"))
    val diff = df.where(not(col("a") <=> col("b")))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("rounding edge cases: ties away from zero, both signs, null elements") {
    import spark.implicits._
    // 0.0005 * 1000 = 0.5 (as doubles: 0.0005 is not exact — the
    // BigDecimal.valueOf string path and a naive floor(x+0.5) can
    // disagree here, which is exactly why vec_grid replicates Spark's
    // own arithmetic instead of reimplementing it).
    val vals: Seq[java.lang.Double] = Seq(
      0.0005, -0.0005, 0.0015, -0.0015, 0.49999999999, -0.49999999999,
      1.9999999999999998, -1.9999999999999998, 0.0, -0.0,
      12345.6785, -12345.6785, null)
    val df = Seq(Tuple1(vals)).toDF("v")
      .select(
        VectorOps.vec_grid(col("v").cast(ArrayType(DoubleType)), 1000).as("a"),
        chain(col("v").cast(ArrayType(DoubleType)), 1000).as("b"))
    val r = df.head()
    assert(r.getSeq[Any](0) == r.getSeq[Any](1),
      s"edge-case drift: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
  }

  test("overflow fails loudly, like the ANSI cast it replaces") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(Tuple1(Seq(1.0e19))).toDF("v")
        .select(VectorOps.vec_grid(col("v").cast(ArrayType(DoubleType)), 1000))
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("overflows the long grid"), msgs)
  }

  test("the grid projection stays inside whole-stage codegen") {
    val df = Similarity.embeddingPq(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val gridLines = plan.linesIterator.filter(_.contains("vec_grid")).toSeq
    assert(gridLines.nonEmpty, "vec_grid missing from the PQ encode plan")
    assert(gridLines.exists(_.contains("*(")),
      s"grid projection out of codegen:\n${gridLines.mkString("\n")}")
    assert(!plan.contains("lambdafunction"),
      "a higher-order function is back in the PQ encode plan")
  }
}
