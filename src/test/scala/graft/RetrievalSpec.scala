package graft

import graft.pipeline.Retrieval

/** BM25 keyword retrieval: score math vs a driver-side recomputation, rank
  * determinism, and the explode-free plan shape. */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def driverScores(): Map[Long, Double] = {
    val docs = graft.drift.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq)
    val n = docs.length.toDouble
    val sumDl = docs.map(_._2.length.toLong).sum.toDouble
    val terms = Retrieval.QueryTerms
    val df = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val k1 = 1.2; val b = 0.75
    docs.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val score = terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
        idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl * n / sumDl))
      }.sum
      id -> score
    }.toMap
  }

  test("bm25_search scores match the driver-side BM25 formula") {
    val want = driverScores()
    val got = Retrieval.bm25Search(spark, sf).collect()
    assert(got.nonEmpty && got.length <= Retrieval.TopK)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(math.abs(r.getDouble(6) - want(id)) < 1e-5, s"doc $id score")
    }
    // the returned rows ARE the global top-k under (score desc, doc_id)
    val wantTop = want.toSeq
      .map { case (id, s) => (id, math.rint(s * 1e6) / 1e6) }
      .filter(_._2 > 0)
      .sortBy { case (id, s) => (-s, id) }
      .take(Retrieval.TopK).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == wantTop)
  }

  test("bm25_search rank order is deterministic and scores positive, tf columns honest") {
    val a = Retrieval.bm25Search(spark, sf).collect().map(_.toSeq)
    val b2 = Retrieval.bm25Search(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq == b2.toSeq)
    a.foreach { row =>
      assert(row(6).asInstanceOf[Double] > 0)
      // a top doc must contain at least one query term
      assert((3 to 5).map(i => row(i).asInstanceOf[Long]).sum > 0)
    }
  }

  test("term-stats artifact reuse is bit-identical to the self-contained search") {
    val dir = java.nio.file.Files.createTempDirectory("termstats").toString
    Retrieval.writeTermStats(spark, sf, dir)
    val stats = Retrieval.readTermStats(spark, dir)
    // artifact invariants: one corpus constant pair, df bounded by n_docs
    val consts = stats.select("n_docs", "sum_dl").distinct().collect()
    assert(consts.length == 1)
    val n = consts(0).getLong(0)
    assert(stats.collect().forall(r => r.getLong(1) >= 1 && r.getLong(1) <= n))
    val direct = Retrieval.bm25Search(spark, sf).collect().map(_.toSeq).toSeq
    val reused = Retrieval.bm25SearchWith(spark, sf, stats).collect().map(_.toSeq).toSeq
    assert(reused == direct)
  }

  test("empty-corpus artifact: bm25SearchWith degrades to the empty search, no throw") {
    import spark.implicits._
    val corpus = java.nio.file.Files.createTempDirectory("emptycorp").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val art = java.nio.file.Files.createTempDirectory("emptystats").toString
    Retrieval.writeTermStats(spark, corpus, art)
    val got = Retrieval.bm25SearchWith(spark, corpus, Retrieval.readTermStats(spark, art))
    assert(got.collect().isEmpty)
    assert(Retrieval.bm25Search(spark, corpus).collect().isEmpty)
  }

  test("hybrid_search equals an exact driver-side RRF recomputation") {
    // lexical ranks from the BM25 driver reference
    val lexRanks: Map[Long, Long] = driverScores().toSeq
      .map { case (id, s) => (id, math.rint(s * 1e6) / 1e6) }
      .filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }
      .take(Retrieval.RrfDepth).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    // semantic ranks: cosine of every vector to the query vector
    val embs = graft.drift.table(spark, sf, "embeddings")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val qv = embs(Retrieval.SemanticQueryId)
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    val qn = math.sqrt(dot(qv, qv))
    val semRanks: Map[Long, Long] = embs.toSeq
      .filter(_._1 != Retrieval.SemanticQueryId)
      .map { case (id, v) =>
        id -> math.rint(dot(v, qv) / (math.sqrt(dot(v, v)) * qn) * 1e6) / 1e6 }
      .sortBy { case (id, c) => (-c, id) }
      .take(Retrieval.RrfDepth).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    val wantTop = (lexRanks.keySet ++ semRanks.keySet).toSeq
      .map { id =>
        val s = lexRanks.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0) +
          semRanks.get(id).map(r => 1.0 / (Retrieval.RrfK + r)).getOrElse(0.0)
        (id, math.rint(s * 1e6) / 1e6)
      }
      .sortBy { case (id, s) => (-s, id) }.take(Retrieval.HybridTopK)
    val got = Retrieval.hybridSearch(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == wantTop.map(_._1))
    got.zip(wantTop).foreach { case (r, (_, s)) =>
      assert(math.abs(r.getDouble(3) - s) < 1e-6)
      assert(Option(r.get(1)).map(_.asInstanceOf[Long]) == lexRanks.get(r.getLong(0)))
      assert(Option(r.get(2)).map(_.asInstanceOf[Long]) == semRanks.get(r.getLong(0)))
    }
  }

  test("bm25_search plans no explode and no join wider than the 1-row stats broadcast") {
    val plan = Retrieval.bm25Search(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("Generate"), s"tf counts are in-row array folds, no explode:\n${plan.take(2000)}")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"), s"stats join must broadcast:\n${plan.take(2000)}")
  }
}
