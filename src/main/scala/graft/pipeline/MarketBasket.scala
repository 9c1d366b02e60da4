package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.drift.table

/** Market-basket association mining over the order/lineitem star: top part
  * pairs co-occurring in an order, with support / confidence / lift — the
  * classic affinity surface (and, for a training-data engine, the shape of
  * any "items co-occurring in a context" count: tag pairs, tool pairs,
  * co-cited docs).
  *
  * Scale shape: the pair generator is a SELF-JOIN on l_orderkey over the
  * DISTINCT (order, part) frame — Catalyst co-partitions both sides on the
  * join key, so the pair fan-out is local to each order's partition and
  * bounded by Σ C(basket_size, 2), never corpus². The `p1 < p2` guard
  * emits each unordered pair once. Pair counts partial-aggregate map-side;
  * the top-k is TakeOrderedAndProject (count desc, pair tiebreak — fully
  * deterministic); and the per-part order frequencies join back against
  * the BROADCAST top-k frame (scan the parts frame once, never shuffle it
  * against pairs). All probabilities are exact-integer quotients with one
  * shared final text.
  */
object MarketBasket {

  val TopPairs = 20

  /** Top co-occurring part pairs with support, confidence (p(b|a)) and
    * lift. Output: part_a, part_b, n_orders_both, n_orders_a, n_orders_b,
    * support, confidence, lift — ordered by (n_orders_both desc, pair). */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    // the distinct basket frame feeds FOUR subtrees (both self-join sides,
    // the item frequencies, the order count) whose exchanges share no key,
    // so without a cache the fact scan + distinct would execute once per
    // subtree (the minhash_lsh signature-frame discipline)
    val op = table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .cache()
    val nOrders = op.agg(countDistinct(col("ok")).as("n_orders"))
    val itemFreq = op.groupBy(col("pk")).agg(count(lit(1)).as("n_ord"))
    val top = op.as("a").join(op.as("b"), "ok")
      .filter(col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_orders_both"))
      .orderBy(col("n_orders_both").desc, col("part_a"), col("part_b"))
      .limit(TopPairs)
    val withA = itemFreq.join(broadcast(top), col("pk") === col("part_a"))
      .select(col("part_a"), col("part_b"), col("n_orders_both"), col("n_ord").as("n_orders_a"))
    itemFreq.withColumnRenamed("n_ord", "n_orders_b")
      .join(broadcast(withA), col("pk") === col("part_b"))
      .drop("pk")
      .crossJoin(broadcast(nOrders))
      .selectExpr(
        "part_a", "part_b", "n_orders_both", "n_orders_a", "n_orders_b",
        "ROUND(n_orders_both * 1e0 / n_orders, 6) AS support",
        "ROUND(n_orders_both * 1e0 / n_orders_a, 6) AS confidence",
        "ROUND((n_orders_both * 1e0 / n_orders) / ((n_orders_a * 1e0 / n_orders) * (n_orders_b * 1e0 / n_orders)), 6) AS lift")
      .orderBy(col("n_orders_both").desc, col("part_a"), col("part_b"))
  }

  def basketPairsSql: String =
    s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM op),
       |freq AS (SELECT pk, COUNT(*) AS n_ord FROM op GROUP BY 1),
       |top AS (SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_orders_both
       |  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 ORDER BY n_orders_both DESC, part_a, part_b LIMIT $TopPairs)
       |SELECT part_a, part_b, n_orders_both, fa.n_ord AS n_orders_a, fb.n_ord AS n_orders_b,
       |  ROUND(n_orders_both * 1e0 / n_orders, 6) AS support,
       |  ROUND(n_orders_both * 1e0 / fa.n_ord, 6) AS confidence,
       |  ROUND((n_orders_both * 1e0 / n_orders) / ((fa.n_ord * 1e0 / n_orders) * (fb.n_ord * 1e0 / n_orders)), 6) AS lift
       |FROM top JOIN freq fa ON part_a = fa.pk JOIN freq fb ON part_b = fb.pk, n
       |ORDER BY n_orders_both DESC, part_a, part_b""".stripMargin.replace("\n", " ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "basket_pairs" -> ((s, d) => basketPairs(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "basket_pairs" -> basketPairsSql,
  )
}
