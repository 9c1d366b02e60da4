package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming engagement counts — the incremental form of
  * [[graft.pipeline.EventAnalytics.activeUsers]]'s approx path: per
  * event-time day window, distinct users via `approx_count_distinct`
  * (HLL++). The aggregation state per window is ONE mergeable sketch
  * (fixed size), not a user set — the property that makes streaming
  * distinct-counting viable at all; an exact streaming distinct would hold
  * the day's entire user universe in the state store.
  *
  * Watermark bounds state: day windows finalize (and their sketches drop)
  * once event time passes window end + the lateness budget. Append mode
  * emits each day exactly once, on finalization — the same contract as
  * [[StreamingDrift]]'s windowed monitor.
  */
object StreamingEngagement {

  /** Relative-error bound the [[StreamingReplay.streamingDau]] gate holds
    * the sketch to, per finalized window: `approx_count_distinct`'s
    * default relativeSD is 0.05, so 0.15 is a 3-sigma band — wide enough
    * that the gate checks the TOLERANCE CONTRACT (the only thing a sketch
    * can promise), tight enough that a broken sketch merge, a lost
    * window, or a user-set leak into the wrong day flips it. The sketch
    * is deterministic for a given input, so the gate row is
    * deterministic too — this is a contract check, not a flaky bound. */
  val DauTolerance = 0.15

  /** `events` needs (ts TIMESTAMP, user_id). Emits (day_start, dau). */
  def dauStream(events: DataFrame, lateness: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(approx_count_distinct("user_id").as("dau"))
      .select(col("w.start").as("day_start"), col("dau"))

  // --------------------------------------------------------- running TWAP

  /** Per-user running integral for the streaming TWAP — the incremental
    * form of [[graft.pipeline.EventAnalytics.timeWeightedValue]]: the
    * piecewise-constant area accrues event-by-event, so state is FOUR
    * scalars per user regardless of history length. Round 12: the area
    * accumulates in EXACT micro-value·µs integer units (a BigInteger the
    * state store roundtrips as DECIMAL(38,0)) — the same discipline as the
    * batch twin's DECIMAL(18,6)·µs sum, shifted by 10^6 — so the replay
    * gate ([[StreamingReplay.streamingTwap]]) can face a DuckDB HUGEINT
    * oracle with NO float anywhere: `twap_micro` is one truncating integer
    * division, matching DuckDB's `//`. The double `twap` is derived from
    * the exact area for the spec/consumer surface; the spec pins
    * stream == batch to 1e-6. In-order contract as the other gates:
    * events sort by the batch operator's exact (µs, event_id) key within
    * each microbatch. */
  case class TwapState(firstUs: Long, lastUs: Long, lastVMicro: Long,
      areaMicro: java.math.BigInteger, nEvents: Long)

  case class TwapRow(user_id: Long, n_events: Long, span_us: Long,
      twap: Option[Double], twap_micro: Option[Long])

  /** value → exact micro-units, replaying Spark's double→DECIMAL(18,6)
    * cast (shortest decimal string, then HALF_UP at 6 dp — exact for the
    * ≤6 dp values the corpus contract guarantees). */
  private[graft] def valueMicro(v: Double): Long =
    new java.math.BigDecimal(java.lang.Double.toString(v))
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()

  import StreamingAttribution.AttrEvent

  def twapGate(events: org.apache.spark.sql.Dataset[AttrEvent])
      : org.apache.spark.sql.Dataset[TwapRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TwapState, TwapRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[TwapState]) =>
          var st = state.getOption.orNull
          for (e <- rows.toSeq.sortBy(e => (StreamingSessions.eventUs(e.ts), e.event_id))) {
            val us = StreamingSessions.eventUs(e.ts)
            st =
              if (st == null)
                TwapState(us, us, valueMicro(e.value), java.math.BigInteger.ZERO, 1L)
              else st.copy(
                areaMicro = st.areaMicro.add(
                  java.math.BigInteger.valueOf(st.lastVMicro)
                    .multiply(java.math.BigInteger.valueOf(us - st.lastUs))),
                lastUs = us, lastVMicro = valueMicro(e.value),
                nEvents = st.nEvents + 1)
          }
          state.update(st)
          val span = st.lastUs - st.firstUs
          // the truncate-toward-zero BigInteger division below matches
          // DuckDB's `//` ONLY on non-negative areas (verified: DuckDB
          // -7 // 2 = -3 locally, but the tie behavior is an engine
          // internal we refuse to depend on) — so the non-negative
          // contract is a loud check, not a comment (r12 verdict item 7)
          require(st.areaMicro.signum >= 0,
            s"twapGate: negative TWAP area for user $userId — truncating " +
              "and flooring division diverge on negative areas; this gate's " +
              "contract is non-negative values")
          Iterator.single(TwapRow(userId, st.nEvents, span,
            if (span > 0) Some(st.areaMicro.doubleValue() / (span * 1e6)) else None,
            if (span > 0) Some(st.areaMicro
              .divide(java.math.BigInteger.valueOf(span)).longValueExact())
            else None))
      }
  }
}
