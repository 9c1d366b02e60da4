package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** TEST-ONLY reference implementations the library deliberately does not
  * ship. The uncapped all-pairs trigram-Jaccard baseline was removed from
  * src/main in round 13 (it had been test-only since round 9): its O(df²)
  * per-shingle fan-out is the one plan shape that dies at 100× scale, so
  * no production code path can emit it anymore — the capped≡uncapped
  * verification pin runs against this replica on BOUNDED corpora only
  * (the planted fixture and sf0.001). Body mirrors the retired
  * `Dedup.ngramJaccardUncapped` verbatim. */
object TestBaselines {

  def ngramJaccardUncapped(spark: SparkSession, dir: String): DataFrame = {
    val tri = Dedup.shinglesOf(
      graft.drift.table(spark, dir, "documents").select("doc_id", "text")).cache()
    val sz = tri.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = tri.as("a").join(tri.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .selectExpr("doc_a", "doc_b", "ROUND(i * 1e0 / (na + nb - i), 6) AS jaccard")
      .filter(col("jaccard") >= Dedup.JaccardThreshold)
      .orderBy("doc_a", "doc_b")
  }
}
