package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, ApproximatePercentile, Count, HyperLogLogPlusPlus, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Session-wide "sketch mode": an optimizer rule that flips the two
  * aggregate shapes that die at 100 TB — exact `percentile` (buffers every
  * value per aggregation buffer) and `COUNT(DISTINCT x)` (an N-way Expand
  * shuffle of the raw distinct universe) — to their fixed-size mergeable
  * sketches (`percentile_approx` / HyperLogLog++), for EVERY query in the
  * session, with no code changes.
  *
  * This is the plan-level form of the per-operator `approx = true`
  * parameters threaded through [[graft.SparkEntry.benchQueries]]: a
  * deployment sets ONE config on the big cluster and the exact forms keep
  * serving the oracle/parity surface everywhere else. OFF by default and
  * gated per-query at optimization time on [[SketchMode.ConfKey]] — the
  * rewrite changes results (within sketch error), so it must be an
  * explicit operator decision, never a silent default.
  *
  * Guards (each keeps the rewrite type- and semantics-safe):
  *  - percentile: only DOUBLE-typed children (ApproximatePercentile
  *    returns the CHILD type — nearest-rank — while exact Percentile
  *    always returns interpolated DOUBLE; on a long child the rewrite
  *    would change the resolved schema), only unit frequency, only
  *    forward direction, and only foldable percentage expressions.
  *  - count-distinct: only single-argument COUNT(DISTINCT x); the
  *    rewritten HLL aggregate keeps the LongType result. Multi-column
  *    distincts and DISTINCT under other aggregates are left alone.
  */
object SketchModeRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.sketchMode"
  val AccuracyKey = "spark.graft.sketchMode.accuracy"
  val RsdKey = "spark.graft.sketchMode.rsd"

  // Config parsing is validated HERE with errors naming the conf key: a
  // malformed value would otherwise throw a bare NumberFormatException from
  // inside the optimizer on every query in the session.
  private def enabled: Boolean =
    conf.getConfString(ConfKey, "false").trim.toLowerCase match {
      case "true" | "1" | "yes" => true
      case "false" | "0" | "no" | "" => false
      case other => throw new IllegalArgumentException(
        s"$ConfKey must be true or false, got '$other'")
    }

  private def accuracy: Int = {
    val raw = conf.getConfString(AccuracyKey,
      ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toString)
    raw.trim.toIntOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
      s"$AccuracyKey must be a positive integer, got '$raw'"))
  }

  private def rsd: Double = {
    val raw = conf.getConfString(RsdKey, "0.05")
    raw.trim.toDoubleOption.filter(r => r > 0 && r < 1).getOrElse(
      throw new IllegalArgumentException(
        s"$RsdKey must be a double in (0, 1), got '$raw'"))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(
          p @ Percentile(child, percentage, Literal(1L, _), _, _, reverse), _, false, _, _)
          if !reverse && child.dataType == DoubleType && percentage.foldable &&
            p.resolved =>
        val approx = ApproximatePercentile(child, percentage, Literal(accuracy), 0, 0)
        if (approx.dataType == p.dataType) ae.copy(aggregateFunction = approx) else ae
      case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
        ae.copy(
          aggregateFunction = HyperLogLogPlusPlus(child, relativeSD = rsd),
          isDistinct = false)
    }
}
