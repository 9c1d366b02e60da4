package graft

import org.apache.spark.sql.functions._
import graft.pipeline.MarketBasket

/** Market-basket pair mining: driver-side replay of counts/support/lift and
  * the bounded-fan-out plan shape. */
class MarketBasketSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("basket_pairs matches a driver-side pair replay") {
    val op = graft.drift.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = op.map(_._1).distinct.length.toDouble
    val freq = op.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairCounts = op.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val wantTop = pairCounts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(MarketBasket.TopPairs)
    val got = MarketBasket.basketPairs(spark, sf).collect()
    assert(got.length == wantTop.length)
    got.zip(wantTop).foreach { case (r, ((a, b), n)) =>
      assert((r.getLong(0), r.getLong(1)) == (a, b), s"pair order: got (${r.getLong(0)},${r.getLong(1)}) want ($a,$b)")
      assert(r.getLong(2) == n)
      assert(r.getLong(3) == freq(a) && r.getLong(4) == freq(b))
      assert(math.abs(r.getDouble(5) - n / nOrders) < 1e-6)
      assert(math.abs(r.getDouble(6) - n.toDouble / freq(a)) < 1e-6)
      val lift = (n / nOrders) / ((freq(a) / nOrders) * (freq(b) / nOrders))
      assert(math.abs(r.getDouble(7) - lift) < 1e-4, s"lift $a,$b")
    }
  }

  test("affinity_triangles matches a driver-side census on a planted graph") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    // orders each repeated twice so every pair passes MinSupport=2:
    // K4 on parts {1,2,3,4} via orders (1,2,3), (1,3,4), (2,4) pairs...
    // plant explicitly: orders carrying {1,2,3} and {1,3,4} and {2,4}
    val baskets = Seq(Seq(1L, 2L, 3L), Seq(1L, 3L, 4L), Seq(2L, 4L))
    val rows = for {
      rep <- 0 to 1 // duplicate each order so every pair has support 2
      (b, i) <- baskets.zipWithIndex
      p <- b
    } yield (rep * 100L + i, p)
    rows.toDF("l_orderkey", "l_partkey").withColumn("l_quantity", lit(1.0))
      .write.parquet(s"$dir/lineitem.parquet")
    // edges: 12,13,23,14(no:1-4 co-occur? basket2={1,3,4} -> 13,14,34), 24
    // edge set: {12,13,23,14,34,24} = K4 minus nothing? pairs: b1:12,13,23
    // b2:13,14,34 b3:24 -> edges {12,13,23,14,34,24} = complete K4
    val r = MarketBasket.affinityTriangles(spark, dir).collect()(0)
    assert(r.getLong(0) == 4 && r.getLong(1) == 6)
    assert(r.getLong(2) == 4, "K4 has 4 triangles")
    // triads: each node degree 3 -> 4 * C(3,2) = 12; transitivity = 12/12 = 1
    assert(r.getLong(3) == 12)
    assert(r.getDouble(4) == 1.0)
  }

  test("basket_pairs mega-basket: lower-key cap bounds the fan-out, b side keeps every part") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-megabk").toString
    // one 40-part mega-basket (order 1) + two sane 3-part orders; with
    // cap = 5 the a side of the self-join keeps only the 5 lowest pks of
    // the mega-basket — B×cap pairs, never C(B,2)
    val rows = (0 until 40).map(p => (1L, 100L + p)) ++
      Seq((2L, 100L), (2L, 101L), (2L, 102L), (3L, 100L), (3L, 101L), (3L, 103L))
    rows.toDF("l_orderkey", "l_partkey").withColumn("l_quantity", lit(1.0))
      .write.parquet(s"$dir/lineitem.parquet")
    val capped = MarketBasket.basketPairs(spark, dir, cap = 5L).collect()
    // every surviving pair's LOWER key comes from the kept representative
    // set (5 lowest mega pks, plus the sane orders' parts which sit under
    // any cap); the upper key ranges over the whole basket
    assert(capped.nonEmpty)
    assert(capped.forall(_.getLong(0) <= 104L),
      "an over-cap part escaped onto the capped a side")
    assert(capped.exists(_.getLong(1) > 104L),
      "the b side lost over-cap parts — eviction cut them from every pair")
    // inert cap (above the corpus) reproduces the unguarded census
    val free = MarketBasket.basketPairs(spark, dir, cap = Long.MaxValue)
      .collect().map(_.toSeq).toSeq
    val inert = MarketBasket.basketPairs(spark, dir, cap = 1000L)
      .collect().map(_.toSeq).toSeq
    assert(inert == free)
  }

  test("basket_pairs plan: co-partitioned self-join, top-k heap, broadcast enrichments") {
    val plan = MarketBasket.basketPairs(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n${plan.take(2000)}")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"freq enrichment must broadcast the tiny pair frame:\n${plan.take(2500)}")
    // the only non-broadcast join allowed is the orderkey-co-partitioned
    // pair generator
    val wide = plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")).toSeq
    assert(wide.forall(_.contains("ok")), s"wide joins must be on the basket key only:\n${wide.mkString("\n")}")
  }
}
