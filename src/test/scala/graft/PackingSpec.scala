package graft

import graft.pipeline.{Packing, TextAnalysis}
import org.apache.spark.sql.functions._

/** Invariant + plan-shape coverage for the packing/chunking operators. The
  * value-level contract lives in the DuckDB oracle (seq_pack,
  * length_buckets, doc_chunks, chunk_stats all hash-checked); these tests
  * pin the properties the oracle can't see — conservation laws, the
  * closed-form-vs-exploded equivalence, and the partitioned-window scale
  * shape. */
class PackingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val W = Packing.WindowTokens

  private lazy val corpusTokens: Long =
    graft.drift.table(spark, sf, "documents")
      .selectExpr(s"size(regexp_extract_all(text, '${TextAnalysis.PretokenRegexSpark}', 0)) + 1L AS tok")
      .agg(sum("tok")).collect()(0).getLong(0)

  test("seq_pack conserves every token across shards") {
    val rows = Packing.seqPack(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("total_tokens")).sum === corpusTokens)
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      graft.drift.table(spark, sf, "documents").count())
  }

  test("seq_pack per-shard window math is internally consistent") {
    Packing.seqPack(spark, sf).collect().foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      val nw = r.getAs[Long]("n_windows")
      assert(nw === (total + W - 1) / W)
      val fill = r.getAs[Double]("last_fill")
      assert(fill > 0.0 && fill <= 1.0)
      // a doc can cross at most (its windows - 1) boundaries; across the
      // shard, crossings are bounded by total window boundaries
      assert(r.getAs[Long]("n_crossing") >= 0 &&
        r.getAs[Long]("n_crossing") <= math.max(0L, nw - 1) + r.getAs[Long]("n_docs"))
    }
  }

  test("seq_pack is deterministic across runs") {
    val a = Packing.seqPack(spark, sf).collect().map(_.toString)
    val b = Packing.seqPack(spark, sf).collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("length_buckets accounts every doc and never over-fills a window") {
    val rows = Packing.lengthBuckets(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      graft.drift.table(spark, sf, "documents").count())
    rows.foreach { r =>
      val cls = r.getAs[Long]("class_tokens")
      val dpw = r.getAs[Long]("docs_per_window")
      assert(dpw === W / cls)
      assert(dpw * cls <= W) // no window exceeds the token budget
      val util = r.getAs[Double]("utilization")
      assert(util > 0.0 && util <= 1.0)
      assert(r.getAs[Long]("pad_tokens") >= 0)
      // windows suffice for the docs: capacity in docs >= docs
      assert(r.getAs[Long]("n_windows") * dpw >= r.getAs[Long]("n_docs"))
    }
  }

  test("chunk_stats closed form equals an explicit chunk explode") {
    // materialize a chunk row per (doc, k) the expensive way and compare
    // the per-source counts/chars with the closed-form rollup
    val exploded = graft.drift.table(spark, sf, "documents")
      .selectExpr("source", "CAST(length(text) AS BIGINT) AS len")
      .selectExpr("source", "len",
        s"CASE WHEN len <= ${Packing.ChunkChars} THEN 1L ELSE " +
          s"(len - ${Packing.ChunkChars} + ${Packing.ChunkStride - 1}) DIV ${Packing.ChunkStride} + 1L END AS k")
      .selectExpr("source", "len", "explode(sequence(0L, k - 1L)) AS i")
      .selectExpr("source",
        s"CAST(least(${Packing.ChunkChars}, len - i * ${Packing.ChunkStride}) AS BIGINT) AS chunk_len")
      .groupBy("source").agg(
        count(lit(1)).as("total_chunks"),
        sum("chunk_len").as("total_chunk_chars"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("total_chunks"), r.getAs[Long]("total_chunk_chars"))).toMap
    Packing.chunkStats(spark, sf).collect().foreach { r =>
      val (nc, chars) = exploded(r.getAs[String]("source"))
      assert(r.getAs[Long]("total_chunks") === nc)
      assert(r.getAs[Long]("total_chunk_chars") === chars)
    }
  }

  test("batch assignments tile each shard contiguously and aggregate to seq_pack") {
    val docs = graft.drift.table(spark, sf, "documents")
    val as = Packing.assignments(docs).collect()
    // per bucket: offsets are a contiguous tiling — sorted by offset, each
    // doc starts where the previous ended
    as.groupBy(_.getAs[String]("bucket")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("start_offset"))
      sorted.foldLeft(0L) { (expect, r) =>
        assert(r.getAs[Long]("start_offset") === expect)
        expect + r.getAs[Long]("tok")
      }
    }
    // the stats query is exactly an aggregation of this frame
    val statRows = Packing.seqPack(spark, sf).collect()
      .map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_crossing"))).toMap
    as.groupBy(_.getAs[String]("bucket")).foreach { case (b, rows) =>
      assert(statRows(b) === (rows.length.toLong,
        rows.count(_.getAs[Boolean]("crosses_boundary")).toLong))
    }
  }

  test("streaming pack assignments replay the batch fold across micro-batches") {
    import graft.streaming.StreamingPack
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // real corpus text through the stream, split into two micro-batches on
    // doc_id — the bucket cursors must carry across the batch boundary
    val docs = graft.drift.table(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val (b1, b2) = docs.partition(_._1 < docs(docs.length / 2)._1)
    val input = MemoryStream[(Long, String)]
    val out = StreamingPack.packStream(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("pack_out")
      .outputMode("append").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("pack_out").collect().map { r =>
        r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("start_offset"), r.getAs[Long]("first_window"),
            r.getAs[Long]("last_window"), r.getAs[Boolean]("crosses_boundary"))
      }.toMap
      // expected: an offline fold in the same order — per bucket, batch-1
      // docs then batch-2 docs, doc_id-sorted within each (the split is on
      // doc_id, so that is plain doc_id order per bucket)
      val toks = graft.drift.table(spark, sf, "documents")
        .selectExpr("doc_id",
          s"size(regexp_extract_all(text, '${TextAnalysis.PretokenRegexSpark}', 0)) + 1L AS tok",
          "substring(md5(cast(cast(doc_id AS STRING) AS BINARY)), 1, 1) AS bucket")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      assert(got.size === toks.length)
      toks.groupBy(_._3).foreach { case (_, ds) =>
        var cum = 0L
        ds.sortBy(_._1).foreach { case (id, tok, _) =>
          val exp = (cum, cum / W, (cum + tok - 1) / W, cum / W != (cum + tok - 1) / W)
          assert(got(id) === exp, s"doc $id")
          cum += tok
        }
      }
    } finally q.stop()
  }

  test("doc_chunks boundaries tile each sampled document exactly") {
    val byDoc = Packing.docChunks(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val lens = graft.drift.table(spark, sf, "documents")
      .filter("doc_id % 25 = 0").selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS len")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc.keySet === lens.keySet)
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (c, i) =>
        assert(c.getAs[Long]("chunk_idx") === i.toLong)
        assert(c.getAs[Long]("chunk_start") === i.toLong * Packing.ChunkStride)
      }
      // every chunk except the last is full; the last ends exactly at len
      sorted.init.foreach(c => assert(c.getAs[Long]("chunk_len") === Packing.ChunkChars.toLong))
      val last = sorted.last
      assert(last.getAs[Long]("chunk_start") + last.getAs[Long]("chunk_len") === lens(id))
      // successive chunks overlap by exactly C - S chars
      if (sorted.length > 1)
        assert(sorted(0).getAs[Long]("chunk_start") + Packing.ChunkChars -
          sorted(1).getAs[Long]("chunk_start") ===
          (Packing.ChunkChars - Packing.ChunkStride).toLong)
    }
  }
}
