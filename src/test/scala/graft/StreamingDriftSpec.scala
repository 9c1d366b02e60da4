package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingDrift, StreamingSlices}

/** Structured-Streaming drift monitor driven through MemoryStream. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed monitor flags a mean shift against reference stats") {
    implicit val sqlCtx = spark.sqlContext
    val refStats = StreamingDrift.referenceStats(
      Seq.tabulate(200)(i => ("click", 10.0 + (i % 5))).toDF("event_type", "value"))

    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamingDrift.monitor(events, refStats, "10 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    try {
      // window 10:00-10:10: values near ref mean (12) -> no drift
      input.addData((0 until 20).map(i => (ts(i % 10), "click", 12.0 + (i % 3) * 0.1)): _*)
      // window 10:10-10:20: strongly shifted values -> drift
      input.addData((0 until 20).map(i => (ts(10 + i % 10), "click", 50.0)): _*)
      // advance watermark far enough to close both windows
      input.addData((ts(59), "click", 12.0))
      q.processAllAvailable()
      val rows = spark.table("drift_out").collect()
      assert(rows.length >= 2)
      val byStart = rows.map(r => r.getAs[Timestamp]("window_start") -> r.getAs[Boolean]("drift_detected")).toMap
      assert(byStart(Timestamp.valueOf("2024-01-01 10:00:00")) == false)
      assert(byStart(Timestamp.valueOf("2024-01-01 10:10:00")) == true)
    } finally q.stop()
  }

  test("stateful sessionization closes sessions on inactivity gaps (flatMapGroupsWithState)") {
    import graft.streaming.StreamingSessions
    import graft.streaming.StreamingSessions.Event
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val out = StreamingSessions.sessionize(input.toDS(), gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: burst at 10:00-10:05 (6 events), then again at 11:30 (new session)
      input.addData((0 to 5).map(i => Event(ts(i), 1L, "click", i.toDouble)): _*)
      input.addData(Event(Timestamp.valueOf("2024-01-01 11:30:00"), 1L, "click", 9.0))
      // push watermark beyond 11:30 + 30min to time out the second session
      input.addData(Event(Timestamp.valueOf("2024-01-01 13:00:00"), 2L, "click", 0.0))
      input.addData(Event(Timestamp.valueOf("2024-01-01 15:00:00"), 2L, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_out").collect()
        .filter(_.getAs[Long]("user_id") == 1L)
        .map(r => (r.getAs[Timestamp]("start_ts").toString, r.getAs[Long]("n_events"),
          r.getAs[Double]("duration_sec")))
        .sortBy(_._1)
      assert(rows.length == 2)
      assert(rows(0) == ("2024-01-01 10:00:00.0", 6L, 300.0))
      assert(rows(1)._2 == 1L && rows(1)._3 == 0.0)
    } finally q.stop()
  }

  test("constant reference stats yield null z and no drift flag (no divide-by-zero)") {
    implicit val sqlCtx = spark.sqlContext
    val refStats = StreamingDrift.referenceStats(
      Seq.fill(100)(("click", 5.0)).toDF("event_type", "value")) // std = 0
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamingDrift.monitor(events, refStats, "10 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("zdrift_out")
      .outputMode("append").start()
    try {
      input.addData((0 until 10).map(i => (ts(i), "click", 99.0)): _*)
      input.addData((ts(59), "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("zdrift_out").collect()
      assert(rows.nonEmpty)
      assert(rows.forall(r => !r.getAs[Boolean]("drift_detected")))
      assert(rows.forall(_.isNullAt(rows.head.fieldIndex("mean_z"))))
    } finally q.stop()
  }

  test("streaming dedup drops same-content docs within the watermark horizon") {
    import graft.streaming.StreamingDedup
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val out = StreamingDedup.dedupStream(docs, "30 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // three distinct texts, two of them duplicated within minutes
      input.addData(
        (ts(0), 1L, "the quick brown fox"),
        (ts(1), 2L, "lorem ipsum dolor"),
        (ts(2), 3L, "the quick brown fox"), // dup of doc 1
        (ts(3), 4L, "unique third text"),
        (ts(4), 5L, "lorem ipsum dolor"))   // dup of doc 2
      q.processAllAvailable()
      val texts = spark.table("dedup_out").collect().map(_.getAs[String]("text"))
      assert(texts.length == 3 && texts.distinct.length == 3)
      assert(texts.toSet ==
        Set("the quick brown fox", "lorem ipsum dolor", "unique third text"))
    } finally q.stop()
  }

  test("streaming corpus-prep gates language/quality and dedups within the watermark") {
    import graft.streaming.StreamingPrep
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "source", "text")
    val out = StreamingPrep.prepStream(docs, "30 minutes")
    val q = out.writeStream.format("memory").queryName("prep_out")
      .outputMode("append").start()
    try {
      val good = Seq.fill(12)("the mountain and river of silver stone is near garden").mkString(" ")
      val german = Seq.fill(12)("der die das und nicht haus baum wasser").mkString(" ")
      input.addData(
        (ts(0), 1L, "s", good),
        (ts(1), 2L, "s", german), // language gate
        (ts(2), 3L, "s", "x"),    // quality gate
        (ts(3), 4L, "s", good))   // exact dup within the horizon
      q.processAllAvailable()
      val rows = spark.table("prep_out").collect()
      assert(rows.length == 1)
      assert(rows.head.getAs[Long]("doc_id") == 1L)
    } finally q.stop()
  }

  test("streaming corpus-prep entropy floor drops templated docs statelessly") {
    import graft.streaming.StreamingPrep
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "source", "text")
    // the gate must stay a pure projection: append mode with only the
    // dedup's watermark state, same as the entropy-less variant
    val out = StreamingPrep.prepStream(docs, "30 minutes", minEntropyBits = Some(3.0))
    val q = out.writeStream.format("memory").queryName("prep_ent_out")
      .outputMode("append").start()
    try {
      // diverse: passes lang/quality gates and has high word entropy
      val diverse = ("the mountain and river of silver stone is near garden " +
        "while the harbor light of copper wind is past meadow " +
        "then the valley shade of amber rain is under orchard " +
        "and the forest echo of marble frost is over hillside " +
        "but the island shadow of golden mist is beside canyon " +
        "so the prairie whisper of ivory storm is behind lagoon " +
        "yet the tundra murmur of bronze cloud is within grove " +
        "for the desert rumor of silken haze is around summit")
      // templated: same gate-passing vocabulary but one line cycled — the
      // repetition collapses entropy below 3 bits
      val templated = Seq.fill(30)("the stone is a stone and the stone is a stone").mkString(" ")
      input.addData(
        (ts(0), 1L, "s", diverse),
        (ts(1), 2L, "s", templated))
      q.processAllAvailable()
      val rows = spark.table("prep_ent_out").collect()
      assert(rows.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L),
        "only the diverse doc survives the entropy floor")
    } finally q.stop()
  }

  test("streaming constraint monitor reports per-window pass rates") {
    import graft.pipeline.Constraints._
    import graft.streaming.StreamingConstraints
    implicit val sqlCtx = spark.sqlContext
    val suite = Seq(
      Complete("m1_complete_v", "t", "v", 0.8),
      InRange("m2_range_v", "t", "v", Some(0.0), Some(100.0), 0.5),
      Accepted("m3_accepted_s", "t", "s", Seq("A", "B"), 0.9),
      Unique("m4_unique_skipped", "t", Seq("v"))) // batch-side: silently excluded
    val input = MemoryStream[(Timestamp, Option[Double], String)]
    val rows = input.toDF().toDF("ts", "v", "s")
    val out = StreamingConstraints.constraintMonitor(rows, suite, "10 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("cons_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts(0), Some(10.0), "A"),
        (ts(1), Some(200.0), "B"), // out of range
        (ts(2), None, "A"),        // null v: fails complete AND range
        (ts(3), Some(50.0), "C"))  // off-list s
      input.addData((ts(59), Some(1.0), "A")) // advances the watermark
      q.processAllAvailable()
      val got = spark.table("cons_out").collect()
        .map(r => r.getAs[String]("check_name") ->
          ((r.getAs[Long]("n_ok"), r.getAs[Long]("n_rows"),
            r.getAs[Double]("metric"), r.getAs[Boolean]("passed")))).toMap
      assert(got.size == 3, s"one closed window x 3 row-local checks: $got")
      assert(got("m1_complete_v") == ((3L, 4L, 0.75, false)))
      assert(got("m2_range_v") == ((2L, 4L, 0.5, true)))
      assert(got("m3_accepted_s") == ((3L, 4L, 0.75, false)))
    } finally q.stop()
  }

  test("categorical windowed counts emit per-window frequencies") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val out = StreamingDrift.categoricalMonitor(events, "10 minutes", "10 minutes")
    val q = out.writeStream.format("memory").queryName("cat_out")
      .outputMode("append").start()
    try {
      input.addData((0 until 30).map(i => (ts(i % 10), if (i % 3 == 0) "a" else "b", 1.0)): _*)
      input.addData((ts(59), "a", 1.0))
      q.processAllAvailable()
      val rows = spark.table("cat_out").collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("cnt")).toMap
      assert(rows("a") == 10 && rows("b") == 20)
    } finally q.stop()
  }

  test("streaming LM gate scores the feed identically to the batch scorer") {
    import graft.pipeline.LmScore
    import graft.streaming.StreamingLm
    implicit val sqlCtx = spark.sqlContext
    // train batch-side on the trusted slice
    val trusted = Seq(("en", "a b a b a c"), ("en", "a b c a"))
      .toDF("lang", "text")
    val model = LmScore.trainModel(trusted)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingLm.scoreStream(
      input.toDF().toDF("ts", "doc_id", "text"), model, "10 minutes")
    val q = out.writeStream.format("memory").queryName("lm_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "a b a"), (ts(1), 2L, "x y"), (ts(2), 3L, "a"))
      input.addData((ts(59), 99L, "a b")) // advance the watermark
      q.processAllAvailable()
      val rows = spark.table("lm_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r).toMap
      // batch scorer on the same docs, same model slice: scoreDocs trains
      // on lang='en' rows of its input, so feed trusted + scored docs
      val batch = LmScore.scoreDocs(
        trusted.selectExpr("CAST(-1 AS BIGINT) AS doc_id", "lang", "text")
          .unionByName(Seq((1L, "xx", "a b a"), (2L, "xx", "x y"), (3L, "xx", "a"))
            .toDF("doc_id", "lang", "text").selectExpr("doc_id", "lang", "text")))
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      for (id <- Seq(1L, 2L)) {
        assert(rows(id).getAs[Long]("n_bigrams") == batch(id).getAs[Long]("n_bigrams"))
        assert(rows(id).getAs[Double]("ppl") == batch(id).getAs[Double]("ppl"))
        assert(rows(id).getAs[Double]("oov_rate") == batch(id).getAs[Double]("oov_rate"))
      }
      assert(rows(3L).getAs[Long]("n_bigrams") == 0) // too short, NULL metrics
      assert(rows(3L).isNullAt(rows(3L).fieldIndex("ppl")))
    } finally q.stop()
  }

  test("streaming LM gate refuses an over-ceiling model at construction (fail-loud)") {
    import graft.pipeline.LmScore
    import graft.streaming.StreamingLm
    implicit val sqlCtx = spark.sqlContext
    // 3 unigrams + 4 bigrams = 7 collected model rows: a ceiling of 4
    // must refuse BEFORE any stream starts (the guard is the plan-level
    // limit collect — no unbounded fetch happens on the refusal path either)
    val model = LmScore.trainModel(
      Seq(("en", "a b a b a c"), ("en", "a b c a")).toDF("lang", "text"))
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingLm.scoreStream(docs, model, "10 minutes", maxModelRows = 4)
    }
    assert(e.getMessage.contains("smaller trusted sample"))
    // the same model under the default ceiling still constructs fine (the
    // batch-equality test above pins the scores themselves)
    StreamingLm.scoreStream(docs, model, "10 minutes")
  }

  test("LM redelivery dedup drops a replayed doc_id even with a re-stamped ts") {
    import graft.pipeline.LmScore
    import graft.streaming.StreamingLm
    implicit val sqlCtx = spark.sqlContext
    val trusted = Seq(("en", "a b a b a c")).toDF("lang", "text")
    val model = LmScore.trainModel(trusted)
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingLm.scoreStream(
      input.toDF().toDF("ts", "doc_id", "text"), model, "10 minutes",
      dedupeRedeliveries = true)
    val q = out.writeStream.format("memory").queryName("lm_dedup_out")
      .outputMode("append").start()
    try {
      // doc 1 delivered, then replayed with a RE-STAMPED ts inside the
      // watermark window: the contract is per-doc uniqueness, so the
      // doc_id-keyed dedup must drop the replay (a (ts, doc_id) key would
      // pass it through)
      input.addData((ts(0), 1L, "a b a"), (ts(1), 2L, "x y"))
      input.addData((ts(2), 1L, "a b a"))
      q.processAllAvailable()
      val rows = spark.table("lm_dedup_out").collect()
      assert(rows.count(_.getAs[Long]("doc_id") == 1L) == 1,
        s"replayed doc must emit exactly once, got:\n${rows.mkString("\n")}")
      assert(rows.count(_.getAs[Long]("doc_id") == 2L) == 1)
    } finally q.stop()
  }

  test("streaming bucket gate applies batch-fit terciles identically to the batch path") {
    import graft.pipeline.LmScore
    import graft.streaming.StreamingLm
    implicit val sqlCtx = spark.sqlContext
    val trusted = Seq(("en", "a b a b a c"), ("en", "a b c a")).toDF("lang", "text")
    val model = LmScore.trainModel(trusted)
    // batch side: score a snapshot, fit the tercile thresholds
    val snapshot = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x b"), (4L, "a"))
      .toDF("doc_id", "text")
    val batchScored = LmScore.scoreAgainst(snapshot, model).cache()
    val (t1, t2) = LmScore.pplTerciles(batchScored)
    assert(t1 <= t2)
    val batchBuckets = batchScored.withColumn("bucket", LmScore.bucketExpr(t1, t2))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    // stream side: the same docs arrive on the feed; thresholds are literals
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = StreamingLm.bucketStream(
      input.toDF().toDF("ts", "doc_id", "text"), model, t1, t2, "10 minutes")
    val q = out.writeStream.format("memory").queryName("bucket_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "a b a b"), (ts(1), 2L, "a c"), (ts(2), 3L, "x b"), (ts(3), 4L, "a"))
      input.addData((ts(59), 99L, "a b")) // advance the watermark
      q.processAllAvailable()
      val streamBuckets = spark.table("bucket_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
      for (id <- 1L to 4L)
        assert(streamBuckets(id) == batchBuckets(id), s"doc $id")
      // three scored docs cut into one per bucket; the bigram-less doc is unscored
      assert(streamBuckets.filterKeys(_ <= 4L).values.toSeq.sorted ==
        Seq("head", "middle", "tail", "unscored"))
    } finally q.stop()
  }

  test("per-row band signatures equal the explode+groupBy batch signatures") {
    // rowBandSigs is the streaming-safe re-expression of triAndBands'
    // 16-min signature; any divergence silently breaks the increment gate
    val r = new scala.util.Random(13)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc() = Seq.fill(30)(vocab(r.nextInt(vocab.size))).mkString(" ")
    val docs = (0 until 15).map(i => (i.toLong, doc()))
      .toDF("doc_id", "text")
    val (_, batchBands) = graft.pipeline.Dedup.triAndBands(docs, identity)
    val batch = batchBands.collect()
      .map(row => (row.getAs[Long]("doc_id"), row.getAs[Int]("band")) -> row.getAs[String]("sig"))
      .toMap
    val sigs = graft.pipeline.Dedup.rowBandSigs("__w")
    val perRow = docs.withColumn("__w", split(col("text"), "\\s+"))
      .select(col("doc_id") +: sigs.zipWithIndex.map { case (s, b) => s.as(s"sig$b") }: _*)
      .collect()
    perRow.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      for (b <- 0 until 4)
        assert(row.getAs[String](s"sig$b") == batch((id, b)), s"doc $id band $b")
    }
  }

  test("streaming increment gate admits only genuinely new documents (stream-static)") {
    implicit val sqlCtx = spark.sqlContext
    val r = new scala.util.Random(7)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu")
    def doc() = Seq.fill(40)(vocab(r.nextInt(vocab.size))).mkString(" ")
    val corpus = (0 until 10).map(i => (i.toLong, doc())).toDF("doc_id", "text")
    val corpusRows = corpus.collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("text")).toMap
    val near = { val w = corpusRows(1L).split(" "); w(20) = "CHANGED"; w.mkString(" ") }

    val input = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingIncrement.incrementGate(
      input.toDF().toDF("doc_id", "text"), corpus)
    val q = out.writeStream.format("memory").queryName("incr_out")
      .outputMode("append").start()
    try {
      input.addData(
        (100L, corpusRows(0L)), // exact dup -> exact gate
        (101L, near),           // near dup -> band-collision gate
        (102L, doc()),          // fresh -> admitted
        (103L, "tiny doc"))     // <3 tokens: no shingles, admitted
      q.processAllAvailable()
      val kept = spark.table("incr_out").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(102L, 103L), s"gate admitted $kept")
    } finally q.stop()
  }

  test("streaming semantic gate drops corpus near-duplicates, admits fresh vectors") {
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Int) = {
      val rr = new scala.util.Random(seed); Array.fill(64)(rr.nextGaussian().toFloat)
    }
    val corpus = (0 until 20).map(i => (i.toLong, vec(i), 0))
      .toDF("vec_id", "embedding", "label")
    val input = MemoryStream[(Long, Array[Float])]
    val out = graft.streaming.StreamingSemantic.semanticGate(
      input.toDF().toDF("vec_id", "embedding"), corpus, threshold = 0.95)
    val q = out.writeStream.format("memory").queryName("sem_out")
      .outputMode("append").start()
    try {
      input.addData(
        (500L, vec(3).map(x => x + 0.001f)), // near-copy of corpus vec 3 -> dropped
        (501L, vec(777)),                    // fresh gaussian -> admitted
        (502L, vec(11)))                     // exact copy of corpus vec 11 -> dropped
      q.processAllAvailable()
      val kept = spark.table("sem_out").collect().map(_.getAs[Long]("vec_id")).toSet
      assert(kept == Set(501L), s"semantic gate admitted $kept")
    } finally q.stop()
  }

  test("a scoped semantic gate releases its static caches on release()") {
    // round-13 verdict item 5: semanticGate cache()d its static cellVecs
    // unconditionally — a service rebuilding the gate per corpus refresh
    // accumulated cached corpus-sized frames. With a CacheScope the
    // static side caches for the gate's lifetime and release() drops it
    // through the CacheManager (visible as the persistent-RDD set
    // returning to its pre-gate size).
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Int) = {
      val rr = new scala.util.Random(seed); Array.fill(64)(rr.nextGaussian().toFloat)
    }
    // a corpus PLAN-DISTINCT from every other test's (the CacheManager
    // dedupes by plan, so reusing another test's corpus would no-op this
    // gate's cache() and the persistent-RDD delta below would read 0);
    // ids still start at 0 — the prefix-stable centroid set is vec_id < K
    val corpus = (0 until 25).map(i => (i.toLong, vec(5000 + i), 0))
      .toDF("vec_id", "embedding", "label")
    val before = spark.sparkContext.getPersistentRDDs.size
    val scope = new graft.drift.CacheScope
    val input = MemoryStream[(Long, Array[Float])]
    val out = graft.streaming.StreamingSemantic.semanticGate(
      input.toDF().toDF("vec_id", "embedding"), corpus, threshold = 0.95,
      scope = Some(scope))
    val q = out.writeStream.format("memory").queryName("sem_scope_out")
      .outputMode("append").start()
    try {
      input.addData((500L, vec(5003).map(x => x + 0.001f)), (501L, vec(777)))
      q.processAllAvailable()
      val kept = spark.table("sem_scope_out").collect()
        .map(_.getAs[Long]("vec_id")).toSet
      assert(kept == Set(501L), s"scoped gate admitted $kept")
      assert(spark.sparkContext.getPersistentRDDs.size > before,
        "gate did not cache its static side")
    } finally q.stop()
    scope.release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release() left the gate's static caches behind")
  }

  test("streaming semantic gate on an empty corpus admits everything (fallback)") {
    implicit val sqlCtx = spark.sqlContext
    def vec(seed: Int) = {
      val rr = new scala.util.Random(seed); Array.fill(64)(rr.nextGaussian().toFloat)
    }
    val corpus = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val input = MemoryStream[(Long, Array[Float])]
    val out = graft.streaming.StreamingSemantic.semanticGate(
      input.toDF().toDF("vec_id", "embedding"), corpus, threshold = -1.0)
    val q = out.writeStream.format("memory").queryName("sem_empty_out")
      .outputMode("append").start()
    try {
      input.addData((1L, vec(1)), (2L, vec(2)))
      q.processAllAvailable()
      // no centroids -> no assignable cell -> keep-everything, even at a
      // threshold every comparison would satisfy
      val kept = spark.table("sem_empty_out").collect().map(_.getAs[Long]("vec_id")).toSet
      assert(kept == Set(1L, 2L), s"empty-corpus gate admitted $kept")
    } finally q.stop()
  }

  test("streaming funnel gate matches the batch funnel on an in-order feed") {
    import graft.streaming.StreamingSessions.Event
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    // replay the real fixture in timestamp order — the regime where the
    // streaming gate's first-touch logic must equal the batch recomputation
    val feed = graft.drift.table(spark, sf, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(_.ts.getTime)
    val input = MemoryStream[Event]
    val out = graft.streaming.StreamingFunnel.funnelGate(input.toDS())
    val q = out.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      feed.grouped(2000).foreach(b => { input.addData(b: _*); q.processAllAvailable() })
      val steps = spark.table("funnel_out").collect()
        .groupBy(_.getAs[String]("step")).map { case (k, v) => k -> v.length.toLong }
      val batch = graft.pipeline.EventAnalytics.funnel(spark, sf).collect()(0)
      assert(steps.getOrElse("view", 0L) == batch.getAs[Long]("n_view"))
      assert(steps.getOrElse("click", 0L) == batch.getAs[Long]("n_click_after_view"))
      assert(steps.getOrElse("purchase", 0L) == batch.getAs[Long]("n_purchase_after_click"))
      // at most one completion per (user, step)
      val dup = spark.table("funnel_out").collect()
        .groupBy(r => (r.getAs[Long]("user_id"), r.getAs[String]("step")))
        .exists(_._2.length > 1)
      assert(!dup, "a (user, step) completed twice")
    } finally q.stop()
  }

  test("streaming DAU sketches match the batch HLL counts per finalized day") {
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val feed = graft.drift.table(spark, sf, "events")
      .select(col("ts"), col("user_id"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1)))
      .sortBy(_._1.getTime)
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    val out = graft.streaming.StreamingEngagement.dauStream(
      input.toDF().toDF("ts", "user_id"))
    val q = out.writeStream.format("memory").queryName("dau_out")
      .outputMode("append").start()
    try {
      feed.grouped(2000).foreach(b => { input.addData(b: _*); q.processAllAvailable() })
      // advance watermark far past the last day so every window finalizes
      val last = feed.last._1.getTime
      input.addData((new java.sql.Timestamp(last + 3L * 86400 * 1000), 0L))
      q.processAllAvailable()
      val got = spark.table("dau_out").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      val batch = graft.drift.table(spark, sf, "events")
        .groupBy(date_trunc("DAY", col("ts")).as("d"))
        .agg(approx_count_distinct("user_id").as("dau"))
        .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      batch.foreach { case (d, n) =>
        assert(got.get(d).contains(n), s"day $d stream=${got.get(d)} batch=$n")
      }
    } finally q.stop()
  }

  test("streaming TWAP gate converges to the batch integral on an in-order feed") {
    import graft.streaming.StreamingAttribution.AttrEvent
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val feed = graft.drift.table(spark, sf, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"), col("event_id"))
      .as[AttrEvent].collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val input = MemoryStream[AttrEvent]
    val out = graft.streaming.StreamingEngagement.twapGate(input.toDS())
    val q = out.writeStream.format("memory").queryName("twap_out")
      .outputMode("append").start()
    try {
      feed.grouped(1500).foreach(b => { input.addData(b: _*); q.processAllAvailable() })
      // last emitted row per user is the converged running TWAP
      val stream = spark.table("twap_out").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rows) => u -> rows.maxBy(_.getAs[Long]("n_events")) }
      val batch = graft.pipeline.EventAnalytics.timeWeightedValue(spark, sf).collect()
        .map(r => r.getLong(0) -> r).toMap
      assert(stream.keySet == batch.keySet)
      batch.foreach { case (u, b) =>
        val s = stream(u)
        assert(s.getAs[Long]("n_events") == b.getLong(1), s"user $u n_events")
        if (b.isNullAt(3)) assert(s.isNullAt(3), s"user $u twap should be null")
        else assert(math.abs(s.getAs[Double]("twap") - b.getDouble(3)) < 1e-6, s"user $u twap")
      }
    } finally q.stop()
  }

  test("streaming attribution gate matches batch last-touch crediting on an in-order feed") {
    import graft.streaming.StreamingAttribution.AttrEvent
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val feed = graft.drift.table(spark, sf, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("value"), col("event_id"))
      .as[AttrEvent].collect().sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val input = MemoryStream[AttrEvent]
    val out = graft.streaming.StreamingAttribution.attributionGate(input.toDS())
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      feed.grouped(1500).foreach(b => { input.addData(b: _*); q.processAllAvailable() })
      val credits = spark.table("attr_out").collect()
      val streamCounts = credits.groupBy(_.getAs[String]("channel"))
        .map { case (k, v) => k -> v.length.toLong }
      val streamRev = credits.groupBy(_.getAs[String]("channel"))
        .map { case (k, v) => k -> v.map(_.getAs[Double]("value")).sum }
      val batch = graft.pipeline.EventAnalytics.attribution(spark, sf).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamCounts.keySet == batch.keySet,
        s"channels stream=${streamCounts.keySet} batch=${batch.keySet}")
      batch.foreach { case (ch, (n, rev)) =>
        assert(streamCounts(ch) == n, s"$ch count")
        assert(math.abs(streamRev(ch) - rev) < 1e-3, s"$ch revenue")
      }
      // exactly one credit per conversion event
      val nPurch = graft.drift.table(spark, sf, "events")
        .filter(col("event_type") === "purchase").count()
      assert(credits.length.toLong == nPurch)
    } finally q.stop()
  }

  test("streaming slice monitor covers every dimension from one stateful agg") {
    implicit val sqlCtx = spark.sqlContext
    // reference: channel 'web' mean 10, 'app' mean 20; region 'eu' mean 15
    val ref = Seq.tabulate(40) { i =>
      (if (i % 2 == 0) "web" else "app", "eu", if (i % 2 == 0) 10.0 else 20.0)
    }.toDF("channel", "region", "value")
    val refSlices = StreamingSlices.referenceSlices(ref, Seq("channel", "region"), "value")

    val input = MemoryStream[(Timestamp, String, String, Double)]
    val events = input.toDF().toDF("ts", "channel", "region", "value")
    val out = StreamingSlices.monitor(events, refSlices, Seq("channel", "region"),
      "value", "10 minutes", "10 minutes", threshold = 0.1)
    val q = out.writeStream.format("memory").queryName("slices_out")
      .outputMode("append").start()
    try {
      // window 10:00-10:10: web holds at 10 (no drift), app shifts to 30
      input.addData((0 until 10).map(i => (ts(i), "web", "eu", 10.0)) ++
        (0 until 10).map(i => (ts(i), "app", "eu", 30.0)): _*)
      input.addData((ts(59), "web", "eu", 10.0)) // close the window
      q.processAllAvailable()
      val rows = spark.table("slices_out").collect()
        .filter(_.getAs[Timestamp]("window_start") == Timestamp.valueOf("2024-01-01 10:00:00"))
      val byKey = rows.map(r => (r.getString(2), r.getString(3)) -> r).toMap
      // BOTH dimensions emitted from the one query
      assert(byKey.keySet == Set(("channel", "web"), ("channel", "app"), ("region", "eu")))
      assert(!byKey(("channel", "web")).getAs[Boolean]("drift_detected"))
      assert(byKey(("channel", "app")).getAs[Boolean]("drift_detected"))
      assert(byKey(("channel", "app")).getAs[Double]("win_mean") == 30.0)
      // region slice blends both channels: window mean (10*10 + 10*30)/20 = 20
      // vs reference 15 -> pct change 1/3 -> flagged
      val eu = byKey(("region", "eu"))
      assert(eu.getAs[Long]("n") == 20 && eu.getAs[Double]("win_mean") == 20.0)
      assert(math.abs(eu.getAs[Double]("mean_pct_change") - 1.0 / 3) < 1e-9)
      // the whole monitor is ONE stateful aggregation (one state store),
      // not one per dimension
      assert(q.lastProgress.stateOperators.size == 1)
    } finally q.stop()
  }

  test("k-anonymity monitor flags below-k classes per closed window") {
    import graft.streaming.StreamingPrivacy
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Int, Double)]
    val rows = input.toDF().toDF("ts", "c_nationkey", "c_acctbal")
    // the batch customer_profile QI text: (nation, acctbal kilobucket)
    val out = StreamingPrivacy.kAnonymityMonitor(rows,
      Seq("c_nationkey", "CAST(FLOOR(c_acctbal / 1000e0) AS BIGINT)"))
    val q = out.writeStream.format("memory").queryName("kanon_out")
      .outputMode("append").start()
    try {
      // window 10:00-10:10: class (1,1) has 5 rows, class (2,1) has 1
      input.addData((0 until 5).map(i => (ts(i), 1, 1200.0 + i)) :+
        ((ts(6), 2, 1100.0)): _*)
      input.addData((ts(59), 3, 1.0)) // advance the watermark
      q.processAllAvailable()
      val got = spark.table("kanon_out").collect()
        .map(r => (r.getAs[Int]("qi0"), r.getAs[Long]("qi1")) ->
          ((r.getAs[Long]("class_size"), r.getAs[Boolean]("at_risk")))).toMap
      assert(got.size == 2, s"one closed window x 2 classes: $got")
      assert(got((1, 1L)) == ((5L, false)))
      assert(got((2, 1L)) == ((1L, true)))
      // one stateful aggregation: state = windows x classes
      assert(q.lastProgress.stateOperators.size == 1)
    } finally q.stop()
  }
}
