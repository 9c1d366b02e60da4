package graft

import org.apache.spark.sql.functions._
import graft.pipeline._

/** Heavy-hitter stress for the aggregation and dedup families (round-12
  * verdict item 5): the gate corpora are benign, so this plants the skew a
  * 100 TB shard actually ships — one category holding 50% of all rows, one
  * user holding 20% of all events, one document duplicated 1000× — and
  * asserts the families (a) stay correct, (b) keep their map-side partial
  * aggregation so the hot key collapses BEFORE the exchange (measured at
  * runtime via per-task shuffle-read records, not just plan text), and
  * (c) the band-bucket guard actually fires on the 1000-copy document. */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  private val NEvents = 20000
  private val NDays = 10
  private val HotUser = 42L
  private val HotDoc = "alpha beta gamma delta epsilon zeta eta theta"
  private val NHotCopies = 1000
  private val NColdDocs = 200

  /** events: 50% `view`, user 42 on every 5th row (20%), 10 UTC days ×
    * 2000 events; documents: 1000 copies of one text + 200 distinct. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until NEvents).map { i =>
      val ts = new java.sql.Timestamp(base + (i / (NEvents / NDays)) * 86400000L +
        (i % (NEvents / NDays)) * 1000L)
      val user = if (i % 5 == 0) HotUser else 100L + (i % 397)
      val et = if (i % 2 == 0) "view" else Seq("click", "purchase", "scroll")(i % 3)
      (i.toLong, ts, user, et, (i % 100).toDouble, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rnd = new scala.util.Random(13)
    val vocab = Seq("red", "blue", "green", "gold", "gray", "pink", "teal", "cyan")
    val docs = (0 until NHotCopies).map(i => (i.toLong, HotDoc)) ++
      (0 until NColdDocs).map(i =>
        (NHotCopies + i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Runs `body` and returns the worst single-task shuffle-read record
    * count it caused — the number that says whether a hot key was
    * collapsed map-side (shuffle carries per-key partials) or shipped raw
    * (one reducer task reads the hot key's entire row set). */
  private def maxShuffleReadPerTask(body: => Unit): Long = {
    val worst = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          worst.getAndUpdate(v => math.max(v, m.shuffleReadMetrics.recordsRead))
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      // the listener bus is async: poll until the counter holds still
      var prev = -1L
      var tries = 0
      while (worst.get != prev && tries < 50) {
        prev = worst.get; Thread.sleep(20); tries += 1
      }
    } finally spark.sparkContext.removeSparkListener(l)
    worst.get
  }

  test("hot-category groupBy collapses map-side: bounded shuffle, exact counts") {
    val out = Sessions.eventWindow(spark, dir)
    val worst = maxShuffleReadPerTask { out.collect() }
    // 10000 `view` rows must NOT cross the exchange as rows: with partial
    // aggregation the shuffle carries (day, event_type) partials — a few
    // hundred records at most, not the hot category's ten thousand
    assert(worst < NEvents / 10, s"hot category shipped raw: $worst records in one task")
    val views = out.filter(col("event_type") === "view").collect()
    assert(views.length == NDays)
    views.foreach(r => assert(r.getAs[Long]("n_events") == NEvents / NDays / 2,
      s"day ${r.get(0)} view count"))
  }

  test("privacy k_anon_trend under the hot category: partial-agg'd and exact") {
    val out = Privacy.kAnonTrend(spark, dir)
    val worst = maxShuffleReadPerTask { out.collect() }
    assert(worst < NEvents / 10, s"hot QI class shipped raw: $worst records in one task")
    val rows = out.collect()
    assert(rows.length == NDays)
    // independent recomputation of the per-day class structure (same QI
    // bucketing, different plan: plain SQL over the raw frame)
    graft.drift.table(spark, dir, "events").createOrReplaceTempView("skew_ev")
    val exp = spark.sql(
      """SELECT day, COUNT(*) AS n_classes, MIN(sz) AS k_anon FROM (
        |  SELECT date_format(ts, 'yyyy-MM-dd') AS day, event_type,
        |         CAST(FLOOR(value / 10e0) AS BIGINT) AS b, COUNT(*) AS sz
        |  FROM skew_ev GROUP BY 1, 2, 3) c GROUP BY day ORDER BY day
        |""".stripMargin).collect()
    rows.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getAs[Long]("n_classes") == e.getAs[Long]("n_classes"), s"day ${e.get(0)} classes")
      assert(g.getAs[Long]("k_anonymity") == e.getAs[Long]("k_anon"), s"day ${e.get(0)} k")
      assert(g.getAs[Long]("n_rows") == (NEvents / NDays).toLong, s"day ${e.get(0)} rows")
    }
  }

  test("exact dedup collapses the 1000-copy document map-side") {
    val worstHolder = new Array[Long](1)
    val r = {
      var row: org.apache.spark.sql.Row = null
      worstHolder(0) = maxShuffleReadPerTask {
        row = Dedup.dedupExact(spark, dir).collect()(0)
      }
      row
    }
    assert(r.getAs[Long]("n_docs") == NHotCopies + NColdDocs)
    assert(r.getAs[Long]("n_dup_docs") == NHotCopies - 1)
    // the 1000 identical fingerprints collapse in the map-side partial —
    // the shuffle carries per-hash partial counts, not the copies
    assert(worstHolder(0) < NHotCopies / 2,
      s"hot fingerprint shipped raw: ${worstHolder(0)} records in one task")
  }

  test("the band-bucket guard fires on the 1000-copy document") {
    val cap = 100L
    val tri = Dedup.shinglesOf(
      graft.drift.table(spark, dir, "documents").select("doc_id", "text")).cache()
    val bands = Dedup.bandsFromTri(tri, _.cache())
    // every copy lands in ONE (band, sig) bucket per band; the lower-side
    // representative set must hold exactly `cap` lowest doc_ids per bucket
    val nDocs = graft.drift.table(spark, dir, "documents").count()
    val reps = Dedup.bandReps(bands, _.cache(), maxBucket = cap,
      docsUpperBound = nDocs)
    val hotBucketMax = reps.filter(col("doc_id") < NHotCopies)
      .groupBy("band", "sig").count().agg(max("count")).collect()(0).getLong(0)
    assert(hotBucketMax == cap, s"guard did not fire: hot bucket holds $hotBucketMax")
    val hotReps = reps.filter(col("doc_id") < NHotCopies)
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
    assert(hotReps == (0L until cap).toSeq, "representatives must be the lowest doc_ids")
    // candidate fan-out is B×cap-bounded (94 950 pairs, not
    // C(1000,2) = 499 500) AND no copy escapes: all 999 non-minimum
    // copies still pair with a representative
    val hotPairs = Dedup.pairsFromTriAndBands(tri, bands, maxBucket = cap,
      docsUpperBound = nDocs)
      .filter(col("doc_a") < NHotCopies && col("doc_b") < NHotCopies)
      .select("doc_a", "doc_b").collect()
    assert(hotPairs.length == (0 until cap.toInt).map(a => NHotCopies - 1 - a).sum,
      s"hot candidate pairs: ${hotPairs.length}")
    assert(hotPairs.map(_.getLong(0)).toSet.subsetOf((0L until cap).toSet))
    assert(hotPairs.map(_.getLong(1)).toSet == (1L until NHotCopies.toLong).toSet,
      "an evicted copy escaped the dedup decision")
  }

  test("sessionize under the 20% hot user stays exact") {
    val out = Sessions.sessionize(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(HotUser).getAs[Long]("total_events") == NEvents / 5)
    assert(out.values.map(_.getAs[Long]("total_events")).sum == NEvents)
  }
}
