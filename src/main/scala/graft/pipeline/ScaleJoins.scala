package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join strategies for the 100 TB posture: skew salting and bucketed
  * co-location. These are the two levers the drift/dedup operators reach
  * for when a shuffle key is pathological at cluster scale — AQE's skew
  * handling covers sort-merge joins automatically, but aggregation-side
  * skew (one hot key's groupBy partition) and repeated co-located joins
  * (fact-to-fact on the same key every run) need explicit treatment.
  */
object ScaleJoins {

  /** Salted aggregate-then-merge: two-phase groupBy for skewed keys. Phase
    * one aggregates on (key, salt) — the hot key's rows spread over `n`
    * partitions instead of one straggler — phase two merges the ≤n partial
    * rows per key. Correct for any algebraic aggregate expressed as
    * (partial, merge) pairs; here: count and sum, the building blocks of
    * the drift counts. The salt is derived from a hash of the whole row
    * (deterministic, no rand()), so replays produce identical partials. */
  def saltedCount(df: DataFrame, key: String, n: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(n)))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy(col(key))
      .agg(sum("partial_cnt").as("cnt"))
  }

  /** Write both frames bucketed by the join key into the session warehouse:
    * subsequent equi-joins on that key read co-partitioned buckets and plan
    * NO shuffle exchange — the repeated-join amortization a drift pipeline
    * wants when every run joins the same snapshot tables on the same keys.
    * Returns the two table names to join. */
  def bucketize(spark: SparkSession, a: DataFrame, aName: String,
      b: DataFrame, bName: String, key: String, buckets: Int = 8): (String, String) = {
    a.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(aName)
    b.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(bName)
    (aName, bName)
  }
}
