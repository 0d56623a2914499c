package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: array<float>, label).
  *
  * `similarity_topk` is the exact baseline: a block-partitioned
  * self-join computing cosine in double (cast once), windowed
  * row_number <= k. At 100 TB the quadratic baseline is what you run on
  * a filtered candidate set; for full-corpus ANN, `similarity_ann_ivf`
  * is the scale path: deterministic IVF — assign every vector to its
  * nearest of C pivot centroids (one broadcast of C*dim doubles), probe
  * the nProbe nearest cells per query, exact cosine only within probed
  * cells. Recall is validated in the test suite against the exact
  * baseline; the ANN result is approximate by construction, so it gets
  * a rows-only check rather than a value oracle.
  */
object Similarity {

  val K = 5

  private def normed(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"),
        transform(col("embedding"), x => x.cast(DoubleType)).as("v"))
      .withColumn("nrm", graft.functions.VectorOps.vec_norm(col("v")))

  /** Exact cosine top-k per query vector. */
  def similarityTopk(spark: SparkSession, dir: String): DataFrame = {
    val n = normed(spark, dir)
    val a = n.select(col("vec_id").as("query_id"), col("v").as("va"), col("nrm").as("na"))
    val b = n.select(col("vec_id").as("neighbor_id"), col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a.crossJoin(b).filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Dedup.dot(col("va"), col("vb")) / (col("na") * col("nb"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.select(col("query_id"), col("neighbor_id"), col("sim"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"),
        col("rank").cast(IntegerType).as("rank"))
      .orderBy("query_id", "rank")
  }

  val similarityTopkOracle: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         list_cosine_similarity(a.v, b.v) AS sim
       |  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
       |r AS (
       |  SELECT query_id, neighbor_id, sim,
       |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM p)
       |SELECT query_id, neighbor_id, round(sim, 6) AS sim, CAST(rank AS INTEGER) AS rank
       |FROM r WHERE rank <= $K ORDER BY query_id, rank""".stripMargin

  // ------------------------------------------------------------ IVF ANN

  val IvfCells = 16
  val IvfProbes = 6

  /** Approximate top-k: IVF with deterministic pivots (the vectors whose
    * vec_id is the smallest in each of IvfCells residue classes — no RNG,
    * stable across runs). Returns the same schema as similarityTopk. */
  def similarityAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val n = normed(spark, dir)
    // Deterministic pivots: one per vec_id residue class, driver-collected
    // (IvfCells * dim doubles — metadata scale), then broadcast as literals.
    val pivots = n.withColumn("cls", col("vec_id") % IvfCells)
      .withColumn("rk", row_number().over(Window.partitionBy("cls").orderBy("vec_id")))
      .filter(col("rk") === 1)
      .select(col("cls"), col("v"), col("nrm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    def cosTo(cell: (Long, Array[Double], Double)) =
      Dedup.dot(col("v"), typedLit(cell._2.toSeq)) / (col("nrm") * lit(cell._3))
    // Cell similarity array → assigned cell (argmax) per vector, probe
    // list (top nProbe cells) per query.
    val cellSims = array(pivots.map(cosTo): _*)
    val withCells = n.withColumn("cellSims", cellSims)
      .withColumn("cell", expr(
        s"array_position(cellSims, array_max(cellSims)) - 1"))
    val assigned = withCells.select(col("vec_id"), col("v"), col("nrm"), col("cell"))
    val probes = withCells.select(col("vec_id").as("query_id"),
      col("v").as("va"), col("nrm").as("na"),
      explode(slice(expr(
        "transform(array_sort(zip_with(cellSims, sequence(0, size(cellSims)-1), (s, i) -> struct(-s AS negs, i AS idx))), p -> p.idx)"),
        1, IvfProbes)).as("cell"))
    val pairs = probes.join(assigned, "cell")
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (Dedup.dot(col("va"), col("v")) / (col("na") * col("nrm"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    pairs.select(col("query_id"), col("neighbor_id"), col("sim"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("neighbor_id"), round(col("sim"), 6).as("sim"),
        col("rank").cast(IntegerType).as("rank"))
      .orderBy("query_id", "rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "similarity_topk" -> (similarityTopk _),
    "similarity_ann_ivf" -> (similarityAnnIvf _),
  )

  def oracleSql: Map[String, String] = Map(
    "similarity_topk" -> similarityTopkOracle,
    // similarity_ann_ivf: approximate by construction → rows-only check;
    // recall vs the exact baseline is asserted in SimilaritySpec.
  )
}
