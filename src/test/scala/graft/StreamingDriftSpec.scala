package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingDrift

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
}
