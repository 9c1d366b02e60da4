package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named bench queries to files —
  * the plan evidence the optimization rounds commit under `plans/rNN/`.
  *
  * Usage: `tools/run.sh graft.PlanDump <sfDir> <outDir> [suffix] [name...]`
  * (no names = every bench query). Each query's plan lands in
  * `<outDir>/<name><suffix>.txt`. Building a DataFrame is enough to
  * capture the optimized plan; no action runs for lazy plans, but note
  * that some query builders are deliberately eager (cache
  * materialization / footer counts), so a dump is not free of jobs.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <outDir> [suffix] [name...]")
    val (sfDir, outDir) = (args(0), args(1))
    val suffix = if (args.length >= 3) args(2) else ""
    val names = if (args.length >= 4) args.drop(3).toSeq
      else SparkEntry.benchQueries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      SparkEntry.benchQueries.get(n) match {
        case None => System.err.println(s"[plandump] unknown query: $n")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"$n$suffix.txt"), plan)
            println(s"[plandump] wrote $n$suffix.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $n failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
