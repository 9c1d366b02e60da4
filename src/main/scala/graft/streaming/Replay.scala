package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.types._

/** Batch-replay harness for the streaming twins: runs a Structured-Streaming
  * transform over a BOUNDED snapshot table and hands back the sink as an
  * ordinary DataFrame, so the stream's output can face the SAME DuckDB
  * oracle every batch operator faces. This is what turns the streaming
  * modules from spec-only into CORRECTNESS-gated surfaces (round-10 verdict
  * item 3): any drift between a streaming twin and its batch operator now
  * hash-fails a gate row instead of hiding behind a unit test.
  *
  * Mechanics — a real file-source micro-batch pipeline, not a shortcut:
  *   1. the snapshot is re-written (via [[graft.drift.table]], so the
  *      events nanos→µs normalization applies) into a watched directory;
  *      the file source picks every file up as micro-batch 0, so in-batch
  *      event-time ordering matches the batch engine's global ordering.
  *   2. the transform's output streams through `foreachBatch` into an
  *      append-mode parquet sink — the deployment shape; nothing is
  *      collected to the driver and the sink scales with the output, not
  *      the stream.
  *   3. append-mode results (windowed aggs, stateful timeouts) only emit
  *      once the WATERMARK passes them, and a drained source never advances
  *      it — so the harness feeds `flushes` sentinel rows stamped far in
  *      the future (2100; one micro-batch each). Two flushes suffice by
  *      construction: the watermark available to batch N is computed from
  *      data through batch N−1, so sentinel #1's batch runs with the
  *      real data's watermark and sentinel #2's batch runs with a
  *      past-everything watermark that finalizes every real window /
  *      times out every real session. The sentinels' own windows and
  *      sessions never finalize (nothing follows them), so they can never
  *      leak into the sink.
  */
object Replay {

  /** Every temp tree this JVM creates (per-replay dirs + staged snapshots),
    * deleted on JVM exit: the returned DataFrame reads the sink lazily, so
    * eager deletion is impossible, but a bench run (warm-up + min-of-3 over
    * 13 replay rows) would otherwise leave ~50 snapshot+sink parquet copies
    * in /tmp per JVM. */
  private val tempTrees = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private def registerTemp(p: Path): Path = { tempTrees.add(p); p }

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      tempTrees.iterator().asScala.foreach { root =>
        try Files.walk(root).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
        catch { case _: Throwable => () }
      }
    }, "graft-replay-temp-cleanup"))
  }

  /** Opt-in per-stage wall timings on stderr (`GRAFT_REPLAY_PROFILE=1`):
    * the replay rows carry a fixed engine overhead per gate (stream
    * start/stop, per-micro-batch state commits, snapshot + sink IO) that
    * this breaks down so a perf pass can see WHERE the seconds go instead
    * of guessing. */
  private val profile = sys.env.contains("GRAFT_REPLAY_PROFILE")

  private def staged[T](label: String, tableName: String)(body: => T): T =
    if (!profile) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[replay-profile] $tableName%s $label%s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

  /** Event-time stamp of flush sentinel i (far past any testdata ts). */
  val SentinelBaseTs: Timestamp = Timestamp.valueOf("2100-01-01 00:00:00")

  /** Sentinel key marker for id/string fields — kept out of every gate
    * projection by construction (see class doc); gate rows may still
    * filter on it defensively. */
  val SentinelId: Long = -1L
  val SentinelLabel: String = "__sentinel__"

  private def sentinelRow(schema: StructType, i: Int): Row =
    Row.fromSeq(schema.fields.toSeq.map(_.dataType match {
      case TimestampType => new Timestamp(SentinelBaseTs.getTime + i * 3600000L)
      case LongType => SentinelId
      case IntegerType => SentinelId.toInt
      case DoubleType => -1.0
      case FloatType => -1.0f
      case StringType => SentinelLabel
      case dt => throw new IllegalArgumentException(
        s"replay sentinel: unsupported field type $dt")
    }))

  /** Copy a staged frame's part files into the watched directory via an
    * atomic per-file move (the file source must never list a half-written
    * parquet). */
  private def admitFiles(stagedDir: Path, watchDir: Path, label: String): Unit = {
    import scala.jdk.CollectionConverters._
    Files.list(stagedDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet")).zipWithIndex
      .foreach { case (p, i) =>
        val tmp = watchDir.resolve(s".$label-$i.parquet.tmp")
        Files.copy(p, tmp, StandardCopyOption.REPLACE_EXISTING)
        Files.move(tmp, watchDir.resolve(s"$label-$i.parquet"),
          StandardCopyOption.ATOMIC_MOVE)
      }
  }

  /** Sentinel parquet files staged once per (schema, i) per JVM: a replay's
    * sentinel admission is then a file copy instead of a Spark write job —
    * the 1-row write was pure fixed overhead paid per watermarked gate per
    * run (round-11 verdict item 4). Same trick for the empty sink seed,
    * keyed by output schema. */
  private val frameCache =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  private def stagedFrame(spark: SparkSession, key: String, schema: StructType,
      rows: java.util.List[Row]): Path =
    frameCache.computeIfAbsent(s"$key|${schema.json}", _ => {
      val dir = registerTemp(Files.createTempDirectory("graft-replay-frame-"))
      spark.createDataFrame(rows, schema).coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
      dir
    })

  /** Staged snapshot part files per (dir, table, projection), written ONCE
    * per JVM and COPIED into each replay's fresh watch directory: the
    * snapshot is deterministic input materialization, not the streaming
    * logic under measurement, so repeated replays (the bench's warm-up +
    * min-of-3) should not re-pay a Spark write per run — the same
    * philosophy as the bench's up-front warm-touch of every input table.
    * Each replay still gets its OWN watch dir (sentinels never accumulate
    * across runs). */
  private val snapshotCache =
    new java.util.concurrent.ConcurrentHashMap[String, Path]()

  private def stagedSnapshot(spark: SparkSession, dir: String,
      tableName: String, fields: Seq[String], parts: Int): Path =
    snapshotCache.computeIfAbsent(
      s"$dir|$tableName|${fields.mkString(";")}|$parts",
      _ => staged("snapshot-write", tableName) {
        val snap = registerTemp(
          Files.createTempDirectory(s"graft-replay-snap-$tableName-"))
        val base = graft.drift.table(spark, dir, tableName).selectExpr(fields: _*)
        (if (parts > 1) base.repartition(parts) else base)
          .write.mode("overwrite").parquet(snap.toString)
        snap
      })

  /** Replays `tableName`'s snapshot (projected to `fields` — plain column
    * names or SQL select expressions, e.g. a synthesized event-time column
    * for a table that has none) through a streaming `transform` and
    * returns the drained sink. `flushes` extra sentinel micro-batches
    * advance the watermark past all real data (see class doc for why 2 is
    * sufficient and safe). */
  /** State partitions for a replay's stateful operators: each micro-batch
    * commits per-partition state files to the checkpoint, so a gate replay
    * over a bounded snapshot pays (partitions × stateful ops × batches)
    * file commits of mostly-empty state at the session's full shuffle
    * width. 1 minimizes the fixed harness overhead — the r16 profile put
    * each SENTINEL micro-batch (1 row, pure state/commit machinery) at
    * ~0.6 s of which state+shuffle task fan-out is the bulk, and batch0's
    * post-shuffle work at gate SFs is sub-second even single-task (scan
    * parallelism is unaffected; round 12 had already measured 8 → 4 as
    * free); results are partition-invariant (that is the point of the
    * gate, re-verified against the oracle at width 1). A production
    * stream sizes this to its key cardinality instead. */
  val ReplayStatePartitions = 1

  /** NOT thread-safe: the shuffle-width cap below mutates the SHARED
    * session conf around `start()`, so a batch query planned concurrently
    * on the same SparkSession could snapshot the reduced width. Verify and
    * Bench (the only callers) run gate queries strictly sequentially; a
    * concurrent harness must serialize its replayTable calls. */
  /** `snapshotParts` (default 1): number of part files the staged snapshot
    * is written in — micro-batch 0's scan parallelism, since the narrow
    * per-row pipeline of a stateless gate never crosses an exchange and
    * otherwise grinds the whole feed in ONE task (r17 profile:
    * streaming_semantic batch0 = one 2.9 s task on a 32-core host). Only
    * ORDER-INSENSITIVE gates may pass > 1: multiple files interleave
    * arrival order inside the batch, which is invisible to per-row math
    * and set-valued outputs but changes any gate that folds state in
    * arrival order (streaming_pack's cursor, session splits). */
  def replayTable(spark: SparkSession, dir: String, tableName: String,
      fields: Seq[String], transform: DataFrame => DataFrame,
      flushes: Int = 2, snapshotParts: Int = 1): DataFrame = {
    // flushes = 1 is unsound with no-data micro-batches disabled (below):
    // the watermark available to batch N is computed from data through
    // batch N−1, so state finalized by sentinel #1's watermark only EMITS
    // in a LATER batch — one sentinel advances the clock but nothing
    // flushes it. Watermarked gates need >= 2; stateless gates use 0.
    require(flushes != 1,
      "replayTable: flushes = 1 would silently drop the final watermark " +
        "emission (no-data micro-batches are off for the replay clone); " +
        "use 0 for stateless gates or >= 2 for watermarked ones")
    // schema resolution only — no job runs on this frame
    val srcSchema = graft.drift.table(spark, dir, tableName)
      .selectExpr(fields: _*).schema
    val tmp = registerTemp(Files.createTempDirectory(s"graft-replay-$tableName-"))
    val (watch, sink, chk) =
      (tmp.resolve("in"), tmp.resolve("out"), tmp.resolve("chk"))
    Files.createDirectories(watch)
    // copy the once-written snapshot part files into this replay's watch dir
    staged("snapshot-copy", tableName) {
      import scala.jdk.CollectionConverters._
      val snap = stagedSnapshot(spark, dir, tableName, fields, snapshotParts)
      Files.list(snap).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet")).zipWithIndex
        .foreach { case (p, i) =>
          Files.copy(p, watch.resolve(s"snapshot-$i.parquet"))
        }
    }
    val out = transform(spark.readStream.schema(srcSchema).parquet(watch.toString))
    // seed the sink with the output schema so an (impossible) all-empty run
    // still reads back as an empty frame instead of a missing-path error;
    // the empty seed file is staged once per schema per JVM and copied
    Files.createDirectories(sink)
    staged("sink-seed", tableName) {
      admitFiles(stagedFrame(spark, "empty-seed", out.schema,
        java.util.List.of[Row]()), sink, "seed")
    }
    // the streaming query CLONES the session at start(), freezing conf —
    // so the cap + restore brackets only the planning call; batch queries
    // planned after this method keep the session's own settings
    val widthKey = "spark.sql.shuffle.partitions"
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val sessionWidth = spark.conf.get(widthKey)
    val sessionNoData = spark.conf.get(noDataKey)
    val query = try {
      spark.conf.set(widthKey,
        math.min(ReplayStatePartitions, sessionWidth.toInt).toString)
      // every emission this harness gates happens in a DATA batch (the
      // sentinels advance the watermark explicitly), so the engine's
      // trailing no-data batches — one after each watermark advance — are
      // pure per-gate overhead here and are disabled for the replay clone
      spark.conf.set(noDataKey, "false")
      staged("stream-start", tableName) {
        out.writeStream
          .outputMode("append")
          .option("checkpointLocation", chk.toString)
          .foreachBatch { (batch: Dataset[Row], _: Long) =>
            batch.write.mode("append").parquet(sink.toString)
          }
          .start()
      }
    } finally {
      spark.conf.set(widthKey, sessionWidth)
      spark.conf.set(noDataKey, sessionNoData)
    }
    try {
      staged("batch0", tableName) {
        query.processAllAvailable() // micro-batch 0: the whole snapshot
      }
      (1 to flushes).foreach { i =>
        staged(s"sentinel$i", tableName) {
          admitFiles(stagedFrame(spark, s"sentinel$i", srcSchema,
            java.util.List.of(sentinelRow(srcSchema, i))), watch, s"sentinel$i")
          query.processAllAvailable()
        }
      }
    } finally staged("stream-stop", tableName) { query.stop() }
    spark.read.parquet(sink.toString)
  }
}
