package graft

import org.apache.spark.sql.functions._
import graft.pipeline.CorpusDesign

/** Closed-form semantics of the corpus design/eval statistics: the Heaps
  * curve on a corpus with one planted new token per decile, Neyman
  * allocation on strata with hand-computable variances, and Cohen's kappa
  * at its three anchor points (perfect, chance-level, fixture recompute). */
class CorpusDesignSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def planted(rows: Seq[(Long, String, String, String, Long)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-design").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("vocab_growth: one planted new token per decile accumulates exactly") {
    // doc i contributes tokens {w_i, common}: every decile (1 doc each) adds
    // exactly one new type; "common" is new only in decile 1.
    val dir = planted((0L until 10L).map(i =>
      (i, s"w$i common", "en", "s", 2L)))
    val rows = CorpusDesign.vocabGrowth(spark, dir).collect()
    assert(rows.length == 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      val d = i + 1
      assert(r.getAs[Long]("decile") == d)
      assert(r.getAs[Long]("cum_docs") == d)
      assert(r.getAs[Long]("cum_tokens") == 2L * d)
      assert(r.getAs[Long]("cum_vocab") == d + 1)
      assert(r.getAs[Double]("type_token_ratio") ==
        graft.drift.pr6Scalar((d + 1).toDouble / (2.0 * d)))
    }
  }

  test("vocab_growth: fixture curve is monotone and reconciles to exact totals") {
    val rows = CorpusDesign.vocabGrowth(spark, sf).collect()
    assert(rows.length == 10)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("cum_vocab") >= a.getAs[Long]("cum_vocab"))
      assert(b.getAs[Long]("cum_tokens") > a.getAs[Long]("cum_tokens"))
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val totTok = docs.select(sum(expr("size(split(text, '\\\\s+'))"))).first.getLong(0)
    val totVocab = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .agg(countDistinct("w")).first.getLong(0)
    assert(rows.last.getAs[Long]("cum_tokens") == totTok)
    assert(rows.last.getAs[Long]("cum_vocab") == totVocab)
    assert(rows.last.getAs[Long]("cum_docs") == docs.count())
  }

  test("neyman_allocation: zero-variance stratum gets nothing, all budget to the varying one") {
    val dir = planted(Seq(
      (0L, "x", "en", "flat", 100L), (1L, "x", "en", "flat", 100L),
      (2L, "x", "en", "vary", 100L), (3L, "x", "en", "vary", 200L)))
    val byS = CorpusDesign.neymanAllocation(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(byS("flat").getAs[Double]("sd_chars") == 0.0)
    assert(byS("flat").getAs[Double]("neyman_share") == 0.0)
    assert(byS("flat").getAs[Long]("neyman_alloc") == 0L)
    // sd of {100, 200} = sqrt(5000); share = 1 for the only varying stratum
    assert(byS("vary").getAs[Double]("sd_chars") ==
      graft.drift.pr6Scalar(math.sqrt(5000.0)))
    assert(byS("vary").getAs[Double]("neyman_share") == 1.0)
    assert(byS("vary").getAs[Long]("neyman_alloc") == CorpusDesign.Budget)
    // proportional ignores variance: 2 of 4 docs each -> half the budget
    Seq("flat", "vary").foreach(s =>
      assert(byS(s).getAs[Long]("prop_alloc") == CorpusDesign.Budget / 2))
  }

  test("neyman_allocation: fixture shares sum to 1 and beat proportional on weighted variance") {
    val rows = CorpusDesign.neymanAllocation(spark, sf).collect()
    assert(rows.length == 20)
    val shareSum = rows.map(_.getAs[Double]("neyman_share")).sum
    assert(math.abs(shareSum - 1.0) < 2e-5, s"shares sum to $shareSum")
    rows.foreach { r =>
      assert(r.getAs[Long]("neyman_alloc") >= 0)
      assert(r.getAs[Long]("neyman_alloc") <= CorpusDesign.Budget)
    }
    // allocations never exceed the budget in total (floor can undershoot)
    assert(rows.map(_.getAs[Long]("neyman_alloc")).sum <= CorpusDesign.Budget)
  }

  test("lang agreement: perfect labeling gives kappa 1, chance-level gives 0") {
    val en = "the a of and is"
    val de = "der die das und nicht"
    val perfect = planted(Seq(
      (0L, en, "en", "s", 15L), (1L, de, "de", "s", 21L),
      (2L, en, "en", "s", 15L), (3L, de, "de", "s", 21L)))
    val p = CorpusDesign.langAgreement(spark, perfect).first
    assert(p.getAs[Long]("n_total") == 4)
    assert(p.getAs[Double]("accuracy") == 1.0)
    assert(p.getAs[Double]("kappa") == 1.0)
    // prediction constant 'en' while gold is half en, half de:
    // po = 0.5, pe = (2*4 + 2*0)/16 = 0.5 -> kappa = 0 exactly
    val chance = planted(Seq(
      (0L, en, "en", "s", 15L), (1L, en, "de", "s", 15L),
      (2L, en, "en", "s", 15L), (3L, en, "de", "s", 15L)))
    val c = CorpusDesign.langAgreement(spark, chance).first
    assert(c.getAs[Double]("accuracy") == 0.5)
    assert(c.getAs[Double]("expected_agreement") == 0.5)
    assert(c.getAs[Double]("kappa") == 0.0)
  }

  test("lang agreement: fixture kappa reproduces from the confusion matrix") {
    val conf = CorpusDesign.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n")))
    val n = conf.map(_._3).sum
    val diag = conf.filter(c => c._1 == c._2).map(_._3).sum
    val rowT = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colT = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val labels = (rowT.keySet ++ colT.keySet).toSeq
    val peNum = labels.map(l => rowT.getOrElse(l, 0L) * colT.getOrElse(l, 0L)).sum
    val po = diag.toDouble / n.toDouble
    val pe = peNum.toDouble / (n.toDouble * n.toDouble)
    val a = CorpusDesign.langAgreement(spark, sf).first
    assert(a.getAs[Long]("n_total") == n)
    assert(a.getAs[Double]("accuracy") == graft.drift.pr6Scalar(po))
    assert(a.getAs[Double]("kappa") == graft.drift.pr6Scalar((po - pe) / (1.0 - pe)))
    // confusion total reconciles with the document count
    assert(n == spark.read.parquet(s"$sf/documents.parquet").count())
  }
}
