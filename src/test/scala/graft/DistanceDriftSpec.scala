package graft

import org.apache.spark.sql.DataFrame
import graft.drift.DistanceDrift
import graft.pipeline.{Dedup, EmbeddingDrift}

/** Distribution-distance metrics (PSI / KS / Wasserstein-1 / Cramér's V)
  * plus the embedding-drift and n-gram-novelty extensions: hand-computed
  * values on tiny frames, identity/symmetry properties, and the
  * approx-vs-exact ECDF closeness the bench surface relies on. */
class DistanceDriftSpec extends SparkSpec {

  import spark.implicits._

  private def num(xs: Seq[Double]): DataFrame = xs.toDF("x")

  private def one(df: DataFrame): org.apache.spark.sql.Row = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    rows(0)
  }

  test("KS: disjoint supports give D = 1, identical samples give D = 0") {
    val a = num(Seq(1, 2, 3))
    val b = num(Seq(4, 5, 6))
    assert(one(DistanceDrift.ksForPair(a, b, Seq("x"))).getAs[Double]("ks_stat") == 1.0)
    assert(one(DistanceDrift.ksForPair(a, a, Seq("x"))).getAs[Double]("ks_stat") == 0.0)
  }

  test("KS critical value matches the asymptotic formula and gates `drifted`") {
    val a = num(Seq(1, 2, 3))
    val b = num(Seq(4, 5, 6))
    val r = one(DistanceDrift.ksForPair(a, b, Seq("x")))
    val crit = 1.358 * math.sqrt((3.0 + 3.0) / (3.0 * 3.0))
    assert(math.abs(r.getAs[Double]("ks_crit") - crit) < 1e-6)
    // D = 1 under n=3: crit ≈ 1.109 > 1 → not significant at these sizes
    assert(!r.getAs[Boolean]("drifted"))
  }

  test("Wasserstein-1 equals the mean shift for a pure translation") {
    // {1,2,3} -> {4,5,6}: W1 = 3 exactly (translation by 3)
    val r = one(DistanceDrift.wassersteinForPair(
      num(Seq(1, 2, 3)), num(Seq(4, 5, 6)), Seq("x")))
    assert(r.getAs[Double]("wasserstein") == 3.0)
    // combined range is 5 -> normalized 0.6
    assert(r.getAs[Double]("wasserstein_norm") == 0.6)
    // identical -> 0
    val z = one(DistanceDrift.wassersteinForPair(
      num(Seq(1, 2, 3)), num(Seq(1, 2, 3)), Seq("x")))
    assert(z.getAs[Double]("wasserstein") == 0.0)
  }

  test("PSI: identical distributions give 0; swap symmetry holds; value is hand-checkable") {
    val a = num(Seq.tabulate(100)(i => (i % 10).toDouble))
    assert(one(DistanceDrift.psiForPair(a, a, Seq("x"))).getAs[Double]("psi") == 0.0)

    // two bins: ref 90/10 vs curr 50/50 over values {0, 1}
    val ref = num(Seq.fill(90)(0.0) ++ Seq.fill(10)(1.0))
    val curr = num(Seq.fill(50)(0.0) ++ Seq.fill(50)(1.0))
    val expected = (0.5 - 0.9) * math.log(0.5 / 0.9) + (0.5 - 0.1) * math.log(0.5 / 0.1)
    val got = one(DistanceDrift.psiForPair(ref, curr, Seq("x"))).getAs[Double]("psi")
    assert(math.abs(got - expected) < 1e-6, s"psi $got vs $expected")
    // PSI is symmetric in (ref, curr)
    val swapped = one(DistanceDrift.psiForPair(curr, ref, Seq("x"))).getAs[Double]("psi")
    assert(got == swapped)
    // 0.51 > 0.25 -> significant band
    assert(one(DistanceDrift.psiForPair(ref, curr, Seq("x"))).getAs[String]("band") == "significant")
  }

  test("PSI smoothing keeps one-sided-empty bins finite") {
    // curr occupies a bin ref never does: without the 1e-4 floor this is ±inf
    val ref = num(Seq.fill(100)(0.0))
    val curr = num(Seq.fill(50)(0.0) ++ Seq.fill(50)(10.0))
    val psi = one(DistanceDrift.psiForPair(ref, curr, Seq("x"))).getAs[Double]("psi")
    assert(!psi.isInfinite && !psi.isNaN && psi > 0.25)
  }

  test("Cramér's V: perfect association gives 1, independence gives 0") {
    val ref = Seq.fill(50)("a").toDF("c")
    val curr = Seq.fill(50)("b").toDF("c")
    val perfect = one(DistanceDrift.cramersVForPair(ref, curr, Seq("c")))
    assert(perfect.getAs[Double]("cramers_v") == 1.0)
    assert(perfect.getAs[String]("effect") == "large")

    val mixed = (Seq.fill(25)("a") ++ Seq.fill(25)("b")).toDF("c")
    val indep = one(DistanceDrift.cramersVForPair(mixed, mixed, Seq("c")))
    assert(indep.getAs[Double]("cramers_v") == 0.0)
    assert(indep.getAs[String]("effect") == "negligible")
  }

  test("Cramér's V integer gate surface reconciles bit-exactly with the full floats") {
    val dir = "/root/testdata/sf0.001"
    val ints = DistanceDrift.cramersV(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val fulls = DistanceDrift.cramersVFull(spark, dir).collect()
    assert(fulls.length == ints.size && fulls.nonEmpty)
    fulls.foreach { f =>
      val i = ints((f.getString(0), f.getString(1)))
      assert(i.getAs[Long]("n_total") == f.getAs[Long]("n_total"))
      assert(i.getAs[Long]("dof") == f.getAs[Long]("dof"))
      val chi2U = i.getAs[Long]("chi2_micro")
      val n = i.getAs[Long]("n_total")
      assert(f.getAs[Double]("chi2") == graft.drift.pr6Scalar(chi2U.toDouble / 1e6))
      val vRaw = if (i.getAs[Long]("dof") < 1) 0.0
        else math.sqrt(chi2U.toDouble / 1e6 / n.toDouble)
      assert(f.getAs[Double]("cramers_v") == graft.drift.pr6Scalar(vRaw))
      // integer banding agrees with the float banding (exact thresholds)
      assert(i.getAs[String]("effect") == f.getAs[String]("effect"))
    }
  }

  test("Cramér's V: a single-category column yields V = 0, not a division blowup") {
    val a = Seq.fill(10)("only").toDF("c")
    val r = one(DistanceDrift.cramersVForPair(a, a, Seq("c")))
    assert(r.getAs[Double]("cramers_v") == 0.0)
    assert(r.getAs[Long]("dof") == 0L)
  }

  test("approx ECDF path tracks exact within grid tolerance on real data") {
    val dir = "/root/testdata/sf0.001"
    val exactKs = DistanceDrift.ksTest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("ks_stat")).toMap
    val approxKs = DistanceDrift.ksTest(spark, dir, approx = true).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("ks_stat")).toMap
    assert(exactKs.keySet == approxKs.keySet)
    exactKs.foreach { case (k, v) =>
      // grid snapping moves each F step by at most the mass inside one of
      // the 10k cells; 0.01 is a loose envelope over that
      assert(math.abs(approxKs(k) - v) <= 0.01, s"$k ks exact=$v approx=${approxKs(k)}")
    }
    val exactW = DistanceDrift.wasserstein(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("wasserstein_norm")).toMap
    val approxW = DistanceDrift.wasserstein(spark, dir, approx = true).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("wasserstein_norm")).toMap
    exactW.foreach { case (k, v) =>
      // W1/range error is bounded by one grid cell: 1/10000 plus rounding
      assert(math.abs(approxW(k) - v) <= 2e-4, s"$k w1n exact=$v approx=${approxW(k)}")
    }
  }

  test("embedding drift: a planted per-dim shift is flagged, clean dims are not") {
    // 2-dim embeddings: dim 0 shifts by +1 between parities, dim 1 is iid
    val rnd = new scala.util.Random(7)
    val rows = (0 until 400).map { i =>
      val base = Array(rnd.nextGaussian() * 0.1, rnd.nextGaussian() * 0.1)
      val shifted = if (i % 2 == 0) base else Array(base(0) + 1.0, base(1))
      (i.toLong, shifted.map(_.toFloat))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-embdrift").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val dims = EmbeddingDrift.dimShift(spark, dir).collect()
    assert(dims.length == 2)
    val byDim = dims.map(r => r.getAs[Int]("dim") -> r).toMap
    assert(byDim(0).getAs[Boolean]("drifted"), "planted shift must flag")
    assert(!byDim(1).getAs[Boolean]("drifted"), "clean dim must not flag")
    assert(math.abs(byDim(0).getAs[Double]("shift") - 1.0) < 0.05)
    val s = EmbeddingDrift.drift(spark, dir).collect()(0)
    assert(s.getAs[Long]("n_ref") == 200L && s.getAs[Long]("n_curr") == 200L)
    assert(s.getAs[Long]("n_drifted_dims") == 1L)
  }

  test("embedding drift: identical halves give cosine 1 and zero drifted dims") {
    val rows = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(4)(d => (d + 1).toFloat)) // constant vectors
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-embsame").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val s = EmbeddingDrift.drift(spark, dir).collect()(0)
    assert(s.getAs[Double]("centroid_cosine") == 1.0)
    assert(s.getAs[Double]("centroid_l2") == 0.0)
    assert(s.getAs[Long]("n_drifted_dims") == 0L)
  }

  test("cat distances: hand-checked TVD/Hellinger/KL on a 2-category shift; identity is 0") {
    // ref 90a/10b vs curr 50a/50b
    val ref = (Seq.fill(90)("a") ++ Seq.fill(10)("b")).toDF("c")
    val curr = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("c")
    val r = one(DistanceDrift.catDistancesForPair(ref, curr, Seq("c")))
    assert(r.getAs[Double]("tvd") == 0.4)
    val hel = math.sqrt((math.pow(math.sqrt(0.9) - math.sqrt(0.5), 2) +
      math.pow(math.sqrt(0.1) - math.sqrt(0.5), 2)) / 2)
    assert(math.abs(r.getAs[Double]("hellinger") - hel) < 1e-6)
    val kl = 0.9 * math.log(0.9 / 0.5) + 0.1 * math.log(0.1 / 0.5)
    assert(math.abs(r.getAs[Double]("kl_ref_curr") - kl) < 1e-6)
    assert(r.getAs[Boolean]("drifted")) // hellinger 0.32 > 0.1

    val same = one(DistanceDrift.catDistancesForPair(ref, ref, Seq("c")))
    assert(same.getAs[Double]("tvd") == 0.0 && same.getAs[Double]("hellinger") == 0.0
      && same.getAs[Double]("kl_ref_curr") == 0.0 && !same.getAs[Boolean]("drifted"))
  }

  test("cat distances: disjoint supports hit the TVD/Hellinger ceiling and keep KL finite") {
    val a = Seq.fill(20)("only_ref").toDF("c")
    val b = Seq.fill(20)("only_curr").toDF("c")
    val r = one(DistanceDrift.catDistancesForPair(a, b, Seq("c")))
    assert(r.getAs[Double]("tvd") == 1.0)
    assert(r.getAs[Double]("hellinger") == 1.0)
    val kl = r.getAs[Double]("kl_ref_curr")
    assert(!kl.isInfinite && !kl.isNaN && kl > 1.0, s"floored KL must be a large finite penalty, got $kl")
    assert(r.getAs[Boolean]("drifted"))
  }

  test("seasonality drift: an hour-profile move flags with the right peaks; a flat profile does not") {
    import java.sql.Timestamp
    // ref side < 2024-01-16, curr side after (drift.splits.eventsCutoff)
    def ts(day: Int, hour: Int) = Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:30:00")
    val rows =
      // type "shift": ref all at hour 9, curr all at hour 21
      (1 to 40).map(i => (ts(10, 9), "shift", 1.0)) ++
        (1 to 40).map(i => (ts(20, 21), "shift", 1.0)) ++
        // type "flat": same 9/21 mix on both sides
        (1 to 20).flatMap(i => Seq((ts(10, 9), "flat", 1.0), (ts(10, 21), "flat", 1.0),
          (ts(20, 9), "flat", 1.0), (ts(20, 21), "flat", 1.0)))
    val dir = java.nio.file.Files.createTempDirectory("graft-seasonality").toString
    rows.toDF("ts", "event_type", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val bySt = graft.drift.TimelineDrift.seasonalityDrift(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(bySt("shift").getAs[Boolean]("drifted"), "9h->21h move must flag")
    assert(bySt("shift").getAs[Int]("ref_peak_hour") == 9)
    assert(bySt("shift").getAs[Int]("curr_peak_hour") == 21)
    assert(!bySt("flat").getAs[Boolean]("drifted"), "unchanged profile must not flag")
    assert(bySt("flat").getAs[Double]("psi_hours") == 0.0)
    // deterministic tie-break: flat's 9/21 tie resolves to the lower hour on both sides
    assert(bySt("flat").getAs[Int]("ref_peak_hour") == 9)
    assert(bySt("flat").getAs[Int]("curr_peak_hour") == 9)
  }

  test("vocab divergence: a single-source corpus scores 0; a vocabulary fork is ranked and flagged") {
    import graft.pipeline.Dsir
    val solo = Seq((0L, "only", "alpha beta gamma delta")).toDF("doc_id", "source", "text")
    val dir1 = java.nio.file.Files.createTempDirectory("graft-vocab1").toString
    solo.write.mode("overwrite").parquet(s"$dir1/documents.parquet")
    val r1 = Dsir.vocabDivergence(spark, dir1).collect()(0)
    // the lone source IS the corpus distribution
    assert(r1.getAs[Double]("js_distance") == 0.0 && !r1.getAs[Boolean]("drifted"))

    val docs = (
      (0 until 20).map(i => (i.toLong, "src_norm_a", "alpha beta gamma delta epsilon")) ++
        (20 until 40).map(i => (i.toLong, "src_norm_b", "alpha beta gamma delta epsilon")) ++
        (40 until 60).map(i => (i.toLong, "src_forked", "zulu yankee xray whiskey victor"))
      ).toDF("doc_id", "source", "text")
    val dir2 = java.nio.file.Files.createTempDirectory("graft-vocab2").toString
    docs.write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val by = Dsir.vocabDivergence(spark, dir2).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val (na, nb, fk) = (by("src_norm_a").getAs[Double]("js_distance"),
      by("src_norm_b").getAs[Double]("js_distance"),
      by("src_forked").getAs[Double]("js_distance"))
    assert(na == nb, "identical-vocabulary sources must score identically")
    assert(fk > na, "the forked vocabulary must diverge more than the norm")
    assert(by("src_forked").getAs[Boolean]("drifted"))
    Seq(na, nb, fk).foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("ngram novelty: fresh text scores 1, re-served text scores 0") {
    val docs = Seq(
      // ref side (even ids) establishes the corpus vocabulary
      (0L, "src_a", "the quick brown fox jumps over dogs"),
      (2L, "src_b", "lorem ipsum dolor sit amet consectetur"),
      // curr: doc 1 repeats ref text (novelty 0), doc 3 is all-new
      (1L, "src_a", "the quick brown fox jumps over dogs"),
      (3L, "src_b", "entirely unseen words appear in this document")
    ).toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-novelty").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Dedup.ngramNovelty(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x.getAs[Double]("novelty_rate")).toMap
    assert(r("src_a") == 0.0, "verbatim re-serve must be 0-novel")
    assert(r("src_b") == 1.0, "all-new text must be fully novel")
  }
}
