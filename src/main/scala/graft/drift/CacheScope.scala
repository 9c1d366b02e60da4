package graft.drift

import org.apache.spark.sql.DataFrame

/** Collects the `Dataset.cache()` handles a multi-stage sweep creates so
  * they can be released through Spark's CacheManager (`df.unpersist()`),
  * the route that actually removes the InMemoryRelation entry —
  * unpersisting the underlying RDDs directly would leave a dead
  * cached-plan entry that silently disables caching for those plans for
  * the rest of the session.
  *
  * Library contract: every pair/sweep API that caches intermediate frames
  * (`GroupDrift.forPair`, `Dedup.containmentPairs`, the corpus-prep
  * stages, ...) accepts an `Option[CacheScope]`; a long-lived session
  * passes one and calls [[release]] when the results are materialized.
  * Without a scope the frames stay Spark-cached for the session — fine
  * for one-shot Verify/Bench processes, a leak in a monitoring loop. */
final class CacheScope {
  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
  /** Cache `df` and remember the handle for [[release]]. */
  private[graft] def cached(df: DataFrame): DataFrame = { frames += df; df.cache() }
  def release(): Unit = frames.foreach(_.unpersist(blocking = false))
}
