package graft

import org.apache.spark.sql.DataFrame
import graft.streaming.{Replay, StreamingReplay}

/** Batch-replay equivalence: each streaming gate row must reproduce its
  * batch twin BIT-FOR-BIT (same values through the same exact arithmetic),
  * not just approximately — the CORRECTNESS gate hashes them against the
  * twin's DuckDB oracle, so any tolerance here would be a lie about what
  * the gate demands. Runs at sf0.001; the gate replica covers sf0.01/0.1. */
class ReplaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.toString)

  test("streaming event_window replay equals the batch tumbling-window agg") {
    assert(rows(StreamingReplay.streamingEventWindow(spark, sf)) ==
      rows(pipeline.Sessions.eventWindow(spark, sf)))
  }

  test("streaming sessionize replay equals the batch per-user session rollup") {
    assert(rows(StreamingReplay.streamingSessionize(spark, sf)) ==
      rows(pipeline.Sessions.sessionize(spark, sf)))
  }

  test("streaming funnel replay equals the batch first-touch funnel") {
    assert(rows(StreamingReplay.streamingFunnel(spark, sf)) ==
      rows(pipeline.EventAnalytics.funnel(spark, sf)))
  }

  test("streaming LM score replay equals the batch scorer") {
    assert(rows(StreamingReplay.streamingLmScore(spark, sf)) ==
      rows(pipeline.LmScore.lmScore(spark, sf)))
  }

  test("streaming attribution replay equals the batch last-touch rollup") {
    assert(rows(StreamingReplay.streamingAttribution(spark, sf)) ==
      rows(pipeline.EventAnalytics.attribution(spark, sf)))
  }

  test("streaming constraints replay: window totals equal a whole-table audit and detect the failing check") {
    val got = StreamingReplay.streamingConstraints(spark, sf).collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("n_ok"), r.getAs[Long]("n_rows"), r.getAs[Boolean]("passed")))).toMap
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(got.values.forall(_._2 == total)) // every event in exactly one closed window
    assert(got("sm1_value_complete")._3)     // value has no NULLs
    assert(!got("sm3_engagement_types")._3)  // error/signup are off-list by design
  }

  test("streaming corpus-prep replay admits exactly the batch funnel's gated contents") {
    import org.apache.spark.sql.functions._
    val got = StreamingReplay.streamingPrep(spark, sf)
      .collect().map(_.getString(0)).toSeq
    val batch = pipeline.TextAnalysis.prepDocs(spark, sf)
      .filter(col("qual_ok")).select(md5(col("text")).as("h")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming k-anonymity trend replay equals the batch per-day audit") {
    assert(rows(StreamingReplay.streamingKAnonTrend(spark, sf)) ==
      rows(pipeline.Privacy.kAnonTrend(spark, sf)))
  }

  test("streaming dedup replay admits each distinct content exactly once") {
    import org.apache.spark.sql.functions._
    val admitted = StreamingReplay.streamingDedup(spark, sf)
      .collect().map(_.getString(0)).toSeq
    val batch = spark.read.parquet(s"$sf/documents.parquet")
      .select(md5(col("text")).as("h")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(admitted == batch) // exactly once: no double admission, no loss
  }

  test("streaming increment replay equals the collision-only batch recomputation") {
    import org.apache.spark.sql.functions._
    // the oracle's semantics, recomputed with batch Spark ops: exact-dup
    // anti-join, then drop on ANY shared band with the corpus (no Jaccard
    // verification — the stream gate's documented deviation)
    val docs = drift.table(spark, sf, "documents")
    val bs = docs.agg(max("source")).collect()(0).getString(0)
    val batch = docs.filter(col("source") === bs).select("doc_id", "text")
    val corpus = docs.filter(col("source") =!= bs).select("doc_id", "text")
    val exactKept = batch.join(
      corpus.select(md5(col("text")).as("h")).distinct(),
      md5(batch("text")) === col("h"), "left_anti")
    val (_, bands) = pipeline.Dedup.triAndBands(docs, identity)
    val cb = bands.join(corpus.select("doc_id"), "doc_id")
      .select(col("band").as("cband"), col("sig").as("csig"))
    val bb = bands.join(batch.select("doc_id"), "doc_id")
    val coll = bb.join(cb, bb("band") === col("cband") && bb("sig") === col("csig"))
      .select("doc_id").distinct()
    val expect = exactKept.join(coll, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = StreamingReplay.streamingIncrementKept(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect)
    assert(got.nonEmpty) // the fixture feed must actually admit something
  }

  test("streaming slices replay covers every dimension and flags a drifted slice") {
    val rowsOut = StreamingReplay.streamingSlices(spark, sf).collect()
    val dims = rowsOut.map(_.getAs[String]("dimension")).toSet
    assert(dims == Set("event_type", "vbucket")) // both dims from ONE agg
    // pre-cutoff windows compare a day against the whole ref period: some
    // slices must sit inside the 10% band and the fixture must also show
    // at least one genuinely drifted (flagged) slice
    assert(rowsOut.exists(_.getAs[Boolean]("drift_detected")))
    assert(rowsOut.exists(!_.getAs[Boolean]("drift_detected")))
    // a slice absent from the reference never flags
    rowsOut.filter(_.isNullAt(5)).foreach(r => assert(!r.getAs[Boolean]("drift_detected")))
  }

  test("streaming pack replay: cursors are gapless and windows follow the offsets") {
    val a = StreamingReplay.streamingPack(spark, sf).collect()
    assert(a.nonEmpty)
    // per bucket: offsets in doc_id order tile the token stream exactly
    a.groupBy(_.getAs[String]("bucket")).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_offset") == cum)
        cum += r.getAs[Long]("tok")
      }
    }
    a.foreach { r =>
      val (s, t) = (r.getAs[Long]("start_offset"), r.getAs[Long]("tok"))
      val w = pipeline.Packing.WindowTokens
      assert(r.getAs[Long]("first_window") == s / w)
      assert(r.getAs[Long]("last_window") == (s + t - 1) / w)
      assert(r.getAs[Boolean]("crosses_boundary") == (s / w != (s + t - 1) / w))
    }
  }

  test("sentinel flush rows can never reach a replay sink projection") {
    // the raw sink of the windowed replay: sentinel windows must not have
    // finalized (nothing advances the watermark past them), so even the
    // UNfiltered sink carries no 2100-era window
    val sink = Replay.replayTable(spark, sf, "events",
      Seq("ts", "event_type", "value"),
      streaming.StreamingDrift.windowedStats(_, "1 day", "1 hour"))
    val max = sink.agg(org.apache.spark.sql.functions.max("window_start"))
      .collect()(0).getTimestamp(0)
    assert(max.before(Replay.SentinelBaseTs))
    assert(sink.filter(s"event_type = '${Replay.SentinelLabel}'").count() == 0)
  }

  test("replay over an empty snapshot terminates with an empty, schema-correct sink") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-replay-empty").toString
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    // the full dedup gate row (watermarked, default flushes = 2) on an
    // empty corpus: only its own sentinels flow, and the gate filters them
    val dedup = StreamingReplay.streamingDedup(spark, dir)
    assert(dedup.columns.toSeq == Seq("content_hash") && dedup.count() == 0)
    // watermark path (flushes = 2): only sentinels flow, none may emit
    val sink = Replay.replayTable(spark, dir, "documents",
      Seq("timestampadd(SECOND, CAST(doc_id AS INT), TIMESTAMP'2024-01-01 00:00:00') AS ts",
        "doc_id", "text"),
      d => streaming.StreamingDedup.dedupStream(d, "24 hours"))
    assert(sink.filter(col("doc_id") =!= Replay.SentinelId).count() == 0)
  }

  test("streaming_twap gate replay matches the batch integral in exact micro-units") {
    val sf = "/root/testdata/sf0.001"
    val gate = StreamingReplay.streamingTwap(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    val batch = graft.pipeline.EventAnalytics.timeWeightedValue(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(gate.keySet == batch.keySet && gate.nonEmpty)
    // EXACT integer expectation, recomputed from the snapshot via the same
    // BigInteger micro-value·µs fold the gate runs (r12 ADVICE: comparing
    // against the batch twin's rounded DOUBLE scaled by 1e6 flaked once
    // twap magnitudes push the product's ULP past the fixed slack)
    val expected = graft.drift.table(spark, sf, "events")
      .selectExpr("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"),
        (streaming.StreamingSessions.eventUs(r.getAs[java.sql.Timestamp]("ts")),
          r.getAs[Long]("event_id"),
          streaming.StreamingEngagement.valueMicro(r.getAs[Double]("value")))))
      .groupBy(_._1).map { case (u, evs) =>
        val seq = evs.map(_._2).toSeq.sortBy(e => (e._1, e._2))
        val area = seq.sliding(2).filter(_.size == 2).foldLeft(java.math.BigInteger.ZERO) {
          case (acc, Seq((us0, _, v0), (us1, _, _))) =>
            acc.add(java.math.BigInteger.valueOf(v0)
              .multiply(java.math.BigInteger.valueOf(us1 - us0)))
          case (acc, _) => acc
        }
        val span = seq.last._1 - seq.head._1
        u -> (seq.size.toLong, span,
          if (span > 0) Some(area.divide(java.math.BigInteger.valueOf(span)).longValueExact())
          else None)
      }
    assert(gate.keySet == expected.keySet)
    expected.foreach { case (u, (nEv, span, micro)) =>
      val g = gate(u)
      assert(g.getAs[Long]("n_events") == nEv, s"user $u n_events")
      assert(g.getAs[Long]("span_us") == span, s"user $u span_us")
      micro match {
        case None => assert(g.isNullAt(3), s"user $u twap_micro should be null")
        case Some(m) =>
          assert(g.getAs[Long]("twap_micro") == m, s"user $u twap_micro")
      }
      // and the batch twin's n_events still agrees (stream ≡ batch surface)
      assert(batch(u).getLong(1) == nEv, s"user $u batch n_events")
    }
  }

  test("streaming semantic gate replay equals the batch execution of the same gate") {
    import org.apache.spark.sql.functions._
    val emb = graft.drift.table(spark, sf, "embeddings")
    val corpus = emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
    val feed = emb.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
    // semanticGate is stateless, so it also runs as a plain batch plan —
    // the replayed admitted set must equal the batch execution's
    val batch = streaming.StreamingSemantic.semanticGate(feed, corpus)
      .select("vec_id").orderBy("vec_id")
    val replayed = StreamingReplay.streamingSemantic(spark, sf)
    assert(rows(replayed) == rows(batch) && replayed.count() > 0)
    // and the gate actually drops something on this corpus (both branches live)
    assert(replayed.count() < feed.count())
  }

  test("streaming dau tolerance gate: every finalized day within the sketch band") {
    val out = StreamingReplay.streamingDau(spark, sf).collect()
    assert(out.nonEmpty)
    // every row fully populated (full-outer join found both sides) and
    // inside the tolerance contract the gate row hashes on
    out.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("n_exact")), s"day ${r.getString(0)} lost its exact count")
      assert(r.getAs[Boolean]("within_tol"), s"day ${r.getString(0)} outside tolerance")
    }
    // and the day key matches the batch daily grain (no window misalignment)
    val days = graft.drift.table(spark, sf, "events")
      .selectExpr("date_format(ts, 'yyyy-MM-dd') AS day").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    assert(out.map(_.getString(0)).toSeq == days)
  }

  test("twapGate fails loud on negative areas (trunc-vs-floor divergence guard)") {
    import spark.implicits._
    // one user, two events, NEGATIVE value held over the interval →
    // negative area → the gate's non-negative contract must throw, not
    // silently emit a quotient whose rounding mode DuckDB may not share
    val ds = Seq(
      streaming.StreamingAttribution.AttrEvent(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "view", -5.0, 1L),
      streaming.StreamingAttribution.AttrEvent(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:10"), 7L, "view", 1.0, 2L))
      .toDS()
    val e = intercept[org.apache.spark.SparkException] {
      streaming.StreamingEngagement.twapGate(ds).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("negative TWAP area")), s"unexpected: $e")
  }

  test("exact µs round-trip: usToTs inverts eventUs including sub-ms residue") {
    val us = 1704067199123456L // ...:59.123456
    val ts = streaming.StreamingSessions.usToTs(us)
    assert(streaming.StreamingSessions.eventUs(ts) == us)
    assert(ts.getNanos == 123456000)
  }

  test("snapshotParts is layout-only: a multi-file snapshot replay equals the single-file one") {
    // the r17 scan-parallelism knob must never change what a gate computes:
    // pin a stateless gate (per-row math + set output) and a WATERMARKED
    // set-output gate at 1 vs 4 part files
    import org.apache.spark.sql.functions._
    def gate(parts: Int): Seq[String] = rows(
      Replay.replayTable(spark, sf, "documents",
          Seq("doc_id", "text"),
          df => df.filter(length(col("text")) > 0)
            .select(md5(col("text")).as("h")).dropDuplicates("h"),
          flushes = 0, snapshotParts = parts)
        .orderBy("h"))
    assert(gate(1) == gate(4))
    def dedupGate(parts: Int): Seq[String] = rows(
      Replay.replayTable(spark, sf, "documents",
          Seq("timestampadd(SECOND, CAST(doc_id % 3000 AS INT), " +
            "TIMESTAMP'2024-01-01 00:00:00') AS ts", "doc_id", "text"),
          streaming.StreamingDedup.dedupStream(_, "24 hours"),
          snapshotParts = parts)
        .filter(col("doc_id") =!= lit(Replay.SentinelId))
        .select(col("fingerprint")).orderBy("fingerprint"))
    assert(dedupGate(1) == dedupGate(4))
  }
}
