package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.drift.table

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Brute-force cosine top-k is the correctness baseline: dot products via
  * the `aggregate`/`zip_with` higher-order functions (codegen'd, no UDF),
  * query side broadcast so the scan of the candidate side is
  * embarrassingly parallel. The scale path is [[lshTopK]]: random-
  * hyperplane signatures bucket the vectors, so each query only scores its
  * bucket — at 10⁹ vectors the bucket join replaces the full scan. Cosines
  * are rounded to 6 decimals BEFORE ranking so Spark and DuckDB rank
  * identically.
  */
object Similarity {

  val TopK = 5
  val NumQueries = 10 // query set: vec_id < 10

  private def withNorm(df: DataFrame, prefix: String): DataFrame =
    df.select(col("vec_id").as(s"${prefix}_id"),
      col("embedding").cast("array<double>").as(s"${prefix}_v"))
      .withColumn(s"${prefix}_n",
        expr(s"sqrt(aggregate(${prefix}_v, 0d, (acc, x) -> acc + x * x))"))

  /** Brute-force cosine top-k for the first [[NumQueries]] vectors. */
  def annCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val q = withNorm(emb.filter(col("vec_id") < NumQueries), "q")
    val c = withNorm(emb, "c")
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cosine", expr(
        "round(aggregate(zip_with(q_v, c_v, (x, y) -> x * y), 0d, (acc, v) -> acc + v) / (q_n * c_n), 6)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)))
      .filter(col("rk") <= TopK)
      .select(col("q_id").as("query_id"), col("rk"), col("c_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  def annCosineSql: String =
    s"WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS q_n " +
      s"FROM embeddings WHERE vec_id < $NumQueries), " +
      "c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS c_n FROM embeddings), " +
      "scored AS (SELECT q_id, c_id, ROUND(list_dot_product(q_v, c_v) / (q_n * c_n), 6) AS cosine " +
      "FROM q JOIN c ON q_id <> c_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk FROM scored) " +
      s"SELECT q_id AS query_id, rk, c_id AS neighbor_id, cosine FROM ranked WHERE rk <= $TopK " +
      "ORDER BY query_id, rk"

  /** Top-20 most-similar pairs over ALL vectors (embedding near-dup pass).
    * orderBy.limit plans distributed TakeOrderedAndProject — no
    * single-partition window over the n² pair stream. */
  def embedNeardup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // block brute force: broadcast the (id, vector, norm) block, stream the
    // other side through mapPartitions with a tight double loop and keep a
    // per-partition partial top-k — no per-pair array allocation, and only
    // ~20 rows per partition reach the global TakeOrdered. Math matches the
    // oracle bit-for-bit: sequential-index dot product, BigDecimal HALF_UP
    // rounding (what Spark's round() does).
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
    val block = emb.collect().map { case (id, v) =>
      val arr = v.toArray
      var s = 0.0; var i = 0
      while (i < arr.length) { s += arr(i) * arr(i); i += 1 }
      (id, arr, math.sqrt(s))
    }
    val bc = spark.sparkContext.broadcast(block)
    implicit val ord: Ordering[(Double, Long, Long)] =
      Ordering.Tuple3(Ordering[Double].reverse, Ordering[Long], Ordering[Long])
    val partial = emb.repartition(spark.sparkContext.defaultParallelism).mapPartitions { it =>
      val cands = bc.value
      val best = scala.collection.mutable.ArrayBuffer[(Double, Long, Long)]()
      for ((aId, aSeq) <- it) {
        val aV = aSeq.toArray
        var an = 0.0; var i = 0
        while (i < aV.length) { an += aV(i) * aV(i); i += 1 }
        an = math.sqrt(an)
        for ((bId, bV, bn) <- cands if aId < bId) {
          var dot = 0.0; var j = 0
          while (j < aV.length) { dot += aV(j) * bV(j); j += 1 }
          val c = BigDecimal(dot / (an * bn))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          best += ((c, aId, bId))
          if (best.length > 400) {
            val keep = best.sorted(ord).take(20); best.clear(); best ++= keep
          }
        }
      }
      best.sorted(ord).take(20).iterator
    }.toDF("cosine", "doc_a", "doc_b")
    partial
      .orderBy(col("cosine").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_a").asc, col("doc_b").asc)))
      .select("rk", "doc_a", "doc_b", "cosine")
      .orderBy("rk")
  }

  def embedNeardupSql: String =
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n FROM embeddings), " +
      "pairs AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, " +
      "ROUND(list_dot_product(a.e, b.e) / (a.n * b.n), 6) AS cosine FROM v a JOIN v b ON a.vec_id < b.vec_id) " +
      "SELECT rk, doc_a, doc_b, cosine FROM (SELECT *, ROW_NUMBER() OVER " +
      "(ORDER BY cosine DESC, doc_a ASC, doc_b ASC) AS rk FROM pairs) r WHERE rk <= 20 ORDER BY rk"

  // ------------------------------------------- LSH-bucketed ANN (scale path)

  /** Random-hyperplane signature: `bits` sign-bits of dot(v, h_b) with
    * seeded hyperplanes embedded as plan literals. Vectors sharing a
    * signature land in one bucket; queries only score their bucket. Not
    * oracle-checked (hyperplane literals are seeded Scala constants);
    * covered by SimilaritySpec recall tests against [[annCosine]]. */
  def lshBuckets(df: DataFrame, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val dim = 64
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(bits, dim)(rnd.nextGaussian())
    val sigExpr = (0 until bits).map { b =>
      val dot = planes(b).zipWithIndex
        .map { case (wv, i) => s"(v[$i] * $wv)" }.mkString(" + ")
      s"(CASE WHEN ($dot) > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString(" + ")
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", expr(s"CAST($sigExpr AS BIGINT)"))
  }

  /** Bucketed top-k: exact cosine within each bucket only. */
  def lshTopK(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val b = lshBuckets(table(spark, dir, "embeddings"))
      .withColumn("n", expr("sqrt(aggregate(v, 0d, (acc, x) -> acc + x * x))"))
    b.as("q").join(b.as("c"), col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cosine", expr(
        "round(aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0d, (acc, v) -> acc + v) / (q.n * c.n), 6)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q.vec_id").orderBy(col("cosine").desc, col("c.vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q.vec_id").as("query_id"), col("rk"), col("c.vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  // ----------------------------------------------------------------- API

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_cosine" -> ((s, d) => annCosine(s, d)),
    "embed_neardup" -> ((s, d) => embedNeardup(s, d)),
    "ann_lsh" -> ((s, d) => lshTopK(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "ann_cosine" -> annCosineSql,
    "embed_neardup" -> embedNeardupSql,
    // ann_lsh: rows-only (seeded hyperplane literals, verified in SimilaritySpec)
  )
}
