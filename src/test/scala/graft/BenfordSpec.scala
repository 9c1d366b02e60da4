package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Benford

/** Semantics of the Benford first-digit conformance check: exact digit
  * extraction on edge values, a log-uniform sample passing while uniform
  * samples fail, and bit-exact JVM recomputation of the TVD fold. */
class BenfordSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Writes the three audited tables with the given value lists. */
  private def planted(cust: Seq[Option[Double]], line: Seq[Option[Double]],
                      ord: Seq[Option[Double]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-benford").toString
    cust.toDF("c_acctbal").write.mode("overwrite").parquet(s"$dir/customer.parquet")
    line.toDF("l_extendedprice").write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    ord.toDF("o_totalprice").write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("first-digit extraction: ABS, |x| < 1 and NULL excluded, exact heads") {
    val dir = planted(
      cust = Seq(Some(0.5), Some(-123.45), Some(9.99), Some(1.0), None,
        Some(987654.3), Some(-0.9)),
      line = Seq(Some(2.0)), ord = Seq(Some(3.0)))
    val rows = Benford.benfordCheck(spark, dir).collect()
      .filter(_.getString(1) == "c_acctbal")
      .map(r => r.getLong(2) -> r.getAs[Long]("n_d")).toMap
    // 0.5, -0.9 and NULL excluded; -123.45 and 1.0 -> digit 1; 9.99 and 987654.3 -> 9
    assert(rows == (1L to 9L).map(d => d -> (if (d == 1 || d == 9) 2L else 0L)).toMap)
    // the spine stays dense: every (column, digit) pair present even when 0
    assert(Benford.benfordCheck(spark, dir).count() == 27)
  }

  test("log-uniform amounts pass, uniform amounts fail the TVD verdict") {
    // 3000 points evenly spaced in log10 over 3 decades: first digits follow
    // Benford to within O(1/1000); uniform integers put ~1/9 on each digit
    // (TVD vs Benford ~ 0.269, far over the 0.1 alert line).
    val logUni = (0 until 3000).map(i => Some(math.pow(10.0, i / 1000.0)))
    val uniform = (1000 until 9999).map(i => Some(i.toDouble))
    val dir = planted(cust = logUni, line = uniform, ord = uniform)
    val v = Benford.benfordVerdict(spark, dir).collect()
      .map(r => r.getString(1) -> (r.getAs[Double]("tvd"), r.getAs[Boolean]("benford_ok"))).toMap
    assert(v("c_acctbal")._2, s"log-uniform should conform: tvd=${v("c_acctbal")._1}")
    assert(v("c_acctbal")._1 < 0.01)
    Seq("l_extendedprice", "o_totalprice").foreach { c =>
      assert(!v(c)._2, s"uniform should fail: tvd=${v(c)._1}")
      assert(math.abs(v(c)._1 - 0.268) < 0.01)
    }
  }

  test("verdict TVD reproduces bit-exactly from check's integer counts") {
    val check = Benford.benfordCheck(spark, sf).collect()
    val verdict = Benford.benfordVerdict(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(verdict.size == 3)
    check.groupBy(r => (r.getString(0), r.getString(1))).foreach { case (key, rows) =>
      val byDigit = rows.map(r => r.getLong(2) -> r.getAs[Long]("n_d")).toMap
      val n = byDigit.values.sum
      assert(verdict(key).getAs[Long]("n") == n)
      // mirror the query term-for-term: each |obs − exp| quantized half-up
      // at 6 dp (graft.drift.microScalar ≡ microTermSql), summed as exact
      // integers, back to DOUBLE by one ÷10⁶ (≡ microSumDoubleSql)
      val foldU = (1 to 9).foldLeft(0L) { (a, d) =>
        a + graft.drift.microScalar(math.abs(byDigit(d.toLong).toDouble / n.toDouble -
          math.log10(1.0 + 1.0 / d)))
      }
      val fold = foldU.toDouble / 1e6
      assert(verdict(key).getAs[Double]("tvd") == graft.drift.pr6Scalar(0.5 * fold))
      // observed shares reconcile to 1 within rounding of the 9 terms
      assert(math.abs(rows.map(_.getAs[Double]("p_observed")).sum - 1.0) < 9e-6)
    }
    // the synthetic fixtures are uniform generators: every column must fail
    Benford.benfordVerdict(spark, sf).collect()
      .foreach(r => assert(!r.getAs[Boolean]("benford_ok"), r.getString(1)))
  }
}
