package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.drift.{r6, table}

/** Time-series / product-analytics operators over the event stream —
  * rolling-window statistics, cohort retention and an ordered conversion
  * funnel. The reference engine stops at snapshot-pair drift; these are the
  * longitudinal questions the same event data answers, and each is shaped
  * so the heavy work happens on PRE-AGGREGATED frames (days, users), never
  * on raw events twice.
  *
  * Exactness contract (cross-engine hash stability): every windowed or
  * ratio output is derived from exact-integer or exact-DECIMAL partial
  * sums with ONE final double division — window aggregation ORDER inside
  * a frame differs between engines (Spark folds sequentially, DuckDB may
  * use a segment tree), which makes direct double window-AVG/STDDEV
  * nondeterministic in the last ulp; summing decimals sidesteps it.
  */
object EventAnalytics {

  /** Rolling-window days (current day + 6 preceding). */
  val RollDays = 7

  /** 7-day rolling mean/std of daily event value per type. Daily sums
    * accumulate in DECIMAL(18,6) (exact); the rolling mean and the
    * variance's second moment divide/cast only at the end, so both engines
    * see bit-identical doubles. The frame is a RANGE window over the
    * integer epoch-day index, NOT ROWS over present rows: with a ROWS
    * frame a calendar day with zero events for a type silently widens the
    * window to the 7 most recent ACTIVE days — a gap-skipping stat both
    * engines would agree on, so the oracle could never catch the semantic
    * drift. Scale shape: the window runs on the (day × type) aggregate —
    * O(days·types) rows — after one partial-aggregated scan. */
  def rollingStats(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .groupBy(date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"),
        datediff(date_trunc("DAY", col("ts")), lit("1970-01-01").cast("date")).as("day_idx"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"),
        sum((col("value").cast("decimal(18,6)") * col("value").cast("decimal(18,6)")))
          .as("sum_sq"))
    val w = Window.partitionBy("event_type").orderBy("day_idx")
      .rangeBetween(-(RollDays - 1), Window.currentRow)
    daily.select(col("day"), col("event_type"), col("n_events"),
        sum("n_events").over(w).as("roll_n"),
        sum("sum_value").over(w).as("roll_sum_dec"),
        sum("sum_sq").over(w).as("roll_sq_dec"))
      .selectExpr(rollingFinalCols: _*)
      .orderBy("event_type", "day")
  }

  /** Final projection — IDENTICAL text in Spark selectExpr and DuckDB.
    * Variance via the moment identity on exact sums: (Σx² − (Σx)²/n)/(n−1);
    * the subtraction happens on bit-identical doubles in both engines. */
  private def rollingFinalCols: Seq[String] = Seq(
    "day", "event_type", "n_events", "roll_n",
    "ROUND(CAST(roll_sum_dec AS DOUBLE), 6) AS roll_sum",
    "ROUND(CAST(roll_sum_dec AS DOUBLE) / roll_n, 6) AS roll_avg",
    "ROUND(CASE WHEN roll_n > 1 THEN " +
      "sqrt(greatest((CAST(roll_sq_dec AS DOUBLE) - CAST(roll_sum_dec AS DOUBLE) * CAST(roll_sum_dec AS DOUBLE) / roll_n) / (roll_n - 1), 0e0)) " +
      "ELSE 0e0 END, 6) AS roll_std")

  def rollingStatsSql: String =
    s"""WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |  datediff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_idx, event_type,
       |  COUNT(*) AS n_events, SUM(value::DECIMAL(18,6)) AS sum_value,
       |  SUM(value::DECIMAL(18,6) * value::DECIMAL(18,6)) AS sum_sq
       |  FROM events GROUP BY 1, 2, 3),
       |rolled AS (SELECT day, event_type, n_events,
       |  SUM(n_events) OVER w AS roll_n, SUM(sum_value) OVER w AS roll_sum_dec,
       |  SUM(sum_sq) OVER w AS roll_sq_dec FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day_idx RANGE BETWEEN ${RollDays - 1} PRECEDING AND CURRENT ROW))
       |SELECT ${rollingFinalCols.mkString(", ")} FROM rolled ORDER BY event_type, day"""
      .stripMargin.replace("\n", " ")

  /** Cohort retention: users cohorted by first-seen day; for each
    * (cohort_day, day_offset), how many of the cohort were active — the
    * standard retention triangle. Scale shape: first-seen and the distinct
    * activity set are both user-keyed aggregations (one shuffle each, and
    * Catalyst co-partitions the join on user_id); the triangle itself is
    * O(days²) rows. Retention rate is an exact-integer quotient. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    // ONE scan of events, ONE branch: distinct (user, day) activity,
    // cohort day as a user-partitioned window min over it (no second scan,
    // no self-join), and cohort sizes recovered from the triangle ITSELF —
    // every user contributes exactly one offset-0 row (their first day),
    // so the offset-0 count is the cohort size, lifted to the other
    // offsets by a cohort-partitioned window on the O(days²) frame
    // (a join formulation would recompute the whole upstream DAG for the
    // build side; observed as a second full scan in the executed plan).
    val act = table(spark, dir, "events")
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()
      .withColumn("cohort_day", min("day").over(Window.partitionBy("user_id")))
    val triangle = act
      .groupBy(col("cohort_day"), datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    triangle
      .withColumn("cohort_size", max(when(col("day_offset") === 0, col("n_active")))
        .over(Window.partitionBy("cohort_day")))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"),
        col("n_active"), col("cohort_size"))
      .withColumn("retention_rate", expr("ROUND(n_active * 1e0 / cohort_size, 6)"))
      .orderBy("cohort_day", "day_offset")
  }

  def cohortRetentionSql: String =
    """WITH ev AS (SELECT user_id, date_trunc('day', ts) AS day FROM events),
      |first_seen AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1),
      |cohort_size AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM first_seen GROUP BY 1),
      |active AS (SELECT f.cohort_day, datediff('day', f.cohort_day, e.day) AS day_offset, COUNT(*) AS n_active
      |  FROM (SELECT DISTINCT user_id, day FROM ev) e JOIN first_seen f USING (user_id) GROUP BY 1, 2)
      |SELECT strftime(a.cohort_day, '%Y-%m-%d') AS cohort_day, a.day_offset::BIGINT AS day_offset,
      |  a.n_active, c.cohort_size, ROUND(a.n_active * 1e0 / c.cohort_size, 6) AS retention_rate
      |FROM active a JOIN cohort_size c USING (cohort_day)
      |ORDER BY cohort_day, day_offset""".stripMargin.replace("\n", " ")

  /** Ordered conversion funnel view → click → purchase: a user converts a
    * step only with an event STRICTLY AFTER their previous step's first
    * completion (min-time semantics — the standard "first touch" funnel).
    *
    * Plan shape: ONE scan of events and ONE exchange — the three step
    * times are stacked window mins over the SAME user partitioning (each
    * gated on the previous column), so Catalyst plans a single shuffle +
    * sort feeding three Window operators, then a per-user rollup and a
    * 1-row total. The join formulation (3 type-filtered scans + user
    * joins) reads the fact table three times at 100 TB for no benefit. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    val perUser = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" && col("ts_us") > col("t1"),
        col("ts_us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
        col("ts_us"))).over(w))
      .groupBy("user_id").agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
    perUser.agg(
        count(lit(1)).as("n_users"),
        count("t1").as("n_view"),
        count("t2").as("n_click_after_view"),
        count("t3").as("n_purchase_after_click"))
      .selectExpr(funnelFinalCols: _*)
  }

  /** Zero-denominator guard: an empty prior step yields rate 0, not the
    * engines' divergent 0/0 (Spark NULL vs DuckDB NaN). */
  private def funnelFinalCols: Seq[String] = Seq(
    "n_users", "n_view", "n_click_after_view", "n_purchase_after_click",
    "ROUND(CASE WHEN n_users = 0 THEN 0e0 ELSE n_view * 1e0 / n_users END, 6) AS view_rate",
    "ROUND(CASE WHEN n_view = 0 THEN 0e0 ELSE n_click_after_view * 1e0 / n_view END, 6) AS click_conversion",
    "ROUND(CASE WHEN n_click_after_view = 0 THEN 0e0 ELSE n_purchase_after_click * 1e0 / n_click_after_view END, 6) AS purchase_conversion")

  def funnelSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
       |t2 AS (SELECT e.user_id, MIN(e.ts_us) AS t2 FROM ev e JOIN t1 ON e.user_id = t1.user_id AND e.ts_us > t1.t1
       |  WHERE e.event_type = 'click' GROUP BY 1),
       |t3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3 FROM ev e JOIN t2 ON e.user_id = t2.user_id AND e.ts_us > t2.t2
       |  WHERE e.event_type = 'purchase' GROUP BY 1),
       |tot AS (SELECT (SELECT COUNT(DISTINCT user_id) FROM ev) AS n_users,
       |  (SELECT COUNT(*) FROM t1) AS n_view,
       |  (SELECT COUNT(*) FROM t2) AS n_click_after_view,
       |  (SELECT COUNT(*) FROM t3) AS n_purchase_after_click)
       |SELECT ${funnelFinalCols.mkString(", ")} FROM tot""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------ RFM segmentation

  /** Quintile probabilities for the R/F/M cutpoints. */
  private val RfmCuts = Seq(0.2, 0.4, 0.6, 0.8)

  /** RFM (recency / frequency / monetary) customer segmentation over the
    * orders stream. The textbook formulation scores with `ntile(5)` — a
    * GLOBAL sort into one window partition, the canonical scale-killer.
    * Here each dimension is scored 1-5 against its four quintile CUTPOINTS
    * (one 1-row exact-percentile aggregate, broadcast back), so the plan is
    * one customer-keyed aggregation + two tiny aggs and never sorts the
    * customer universe. `approx = true` swaps the cutpoint fit for
    * `percentile_approx`'s mergeable sketch (the 100 TB path; boundaries
    * shift within sketch error, assignment stays one broadcast compare).
    *
    * Scoring is value-based (score = 1 + #cutpoints strictly below), so
    * ties on a cutpoint land deterministically in the lower band in BOTH
    * engines — ntile's equal-count split of ties is rank-dependent and
    * not reproducible across engines. */
  def rfmSegments(spark: SparkSession, dir: String, approx: Boolean = false): DataFrame = {
    val pct = if (approx) "percentile_approx" else "percentile"
    val perCust = table(spark, dir, "orders")
      .groupBy("o_custkey").agg(
        max("o_orderdate").as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("monetary"))
    val cutAggs = Seq(expr("max(last_order) AS max_date")) ++
      RfmCuts.zipWithIndex.flatMap { case (p, i) => Seq(
        expr(s"$pct(frequency, $p) AS f_cut$i"),
        expr(s"$pct(monetary, $p) AS m_cut$i")) }
    val cuts0 = perCust.agg(cutAggs.head, cutAggs.tail: _*)
    // recency needs max_date first; its cutpoints come from a second 1-row
    // agg over the recency column (still O(1) driver-free frames)
    val withRec = perCust.crossJoin(broadcast(cuts0))
      .withColumn("recency", datediff(col("max_date"), col("last_order")))
    val rCuts = withRec.agg(
      expr(s"$pct(recency, 0.2) AS r_cut0"), expr(s"$pct(recency, 0.4) AS r_cut1"),
      expr(s"$pct(recency, 0.6) AS r_cut2"), expr(s"$pct(recency, 0.8) AS r_cut3"))
    withRec.crossJoin(broadcast(rCuts))
      .selectExpr((Seq("o_custkey", "recency", "frequency", "monetary") ++ rfmScoreCols): _*)
      .selectExpr("*", s"$rfmSegmentExpr AS segment")
      .groupBy("segment").agg(
        count(lit(1)).as("n_customers"),
        (sum("recency") / count(lit(1))).as("avg_recency_days"),
        (sum("frequency") / count(lit(1))).as("avg_frequency"),
        r6(sum(col("monetary").cast("decimal(18,4)")).cast("double")).as("total_monetary"))
      .orderBy("segment")
  }

  /** Score fragments — IDENTICAL text both engines. Recency inverts (low
    * recency-days = best = 5). */
  private def rfmScoreCols: Seq[String] = {
    def score(v: String, c: String, invert: Boolean) = {
      val cmp = if (invert) "<" else ">"
      s"1 + ${(0 to 3).map(i => s"(CASE WHEN $v $cmp ${c}$i THEN 1 ELSE 0 END)").mkString(" + ")} AS ${v.take(1)}_score"
    }
    Seq(score("recency", "r_cut", invert = true),
      score("frequency", "f_cut", invert = false),
      score("monetary", "m_cut", invert = false))
  }

  private val rfmSegmentExpr: String =
    "CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions' " +
      "WHEN f_score >= 4 THEN 'loyal' " +
      "WHEN r_score >= 4 THEN 'recent' " +
      "WHEN m_score >= 4 THEN 'big_spender' " +
      "WHEN r_score <= 2 AND f_score <= 2 THEN 'at_risk' " +
      "ELSE 'regular' END"

  def rfmSegmentsSql: String = {
    val fCuts = RfmCuts.zipWithIndex.map { case (p, i) => s"quantile_cont(frequency, $p) AS f_cut$i" }
    val mCuts = RfmCuts.zipWithIndex.map { case (p, i) => s"quantile_cont(monetary, $p) AS m_cut$i" }
    s"""WITH per_cust AS (SELECT o_custkey, MAX(o_orderdate) AS last_order, COUNT(*) AS frequency,
       |  CAST(SUM(o_totalprice::DECIMAL(18,4)) AS DOUBLE) AS monetary FROM orders GROUP BY 1),
       |cuts0 AS (SELECT MAX(last_order) AS max_date, ${(fCuts ++ mCuts).mkString(", ")} FROM per_cust),
       |with_rec AS (SELECT p.*, datediff('day', last_order, max_date) AS recency,
       |  f_cut0, f_cut1, f_cut2, f_cut3, m_cut0, m_cut1, m_cut2, m_cut3 FROM per_cust p, cuts0),
       |r_cuts AS (SELECT quantile_cont(recency, 0.2) AS r_cut0, quantile_cont(recency, 0.4) AS r_cut1,
       |  quantile_cont(recency, 0.6) AS r_cut2, quantile_cont(recency, 0.8) AS r_cut3 FROM with_rec),
       |scored AS (SELECT o_custkey, recency, frequency, monetary, ${rfmScoreCols.mkString(", ")}
       |  FROM with_rec, r_cuts),
       |seg AS (SELECT *, $rfmSegmentExpr AS segment FROM scored)
       |SELECT segment, COUNT(*) AS n_customers, SUM(recency) / COUNT(*) AS avg_recency_days,
       |  SUM(frequency) / COUNT(*) AS avg_frequency,
       |  ROUND(CAST(SUM(monetary::DECIMAL(18,4)) AS DOUBLE), 6) AS total_monetary
       |FROM seg GROUP BY 1 ORDER BY segment""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------------ active users

  /** DAU / WAU / stickiness per calendar day — the engagement surface every
    * event warehouse serves. WAU(d) counts users active in [d−6, d]; the
    * exact form runs on the DISTINCT (user, day) frame (cardinality-bounded
    * — users×days, not events) and turns the trailing-window distinct into
    * an equi-join: each active (user, day) covers the 7 window-end days
    * d..d+6 (`sequence` + explode — a bounded ×7 fan-out), re-distinct,
    * count per window end. No range join, no per-day re-scan.
    *
    * `approx = true` is the 100 TB path: both counts become
    * `approx_count_distinct` (HLL++) straight off the raw scan — partial
    * sketches merge map-side, so the (user, day) universe is never
    * shuffled at all; the explode fans out raw rows but the exchange
    * carries only day-keyed sketches. */
  def activeUsers(spark: SparkSession, dir: String, approx: Boolean = false): DataFrame = {
    val base = table(spark, dir, "events").select(
      date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"),
      datediff(date_trunc("DAY", col("ts")), lit("1970-01-01").cast("date")).as("day_idx"),
      col("user_id"))
    val (dau, wau) =
      if (approx) {
        val d = base.groupBy("day_idx", "day").agg(approx_count_distinct("user_id").as("dau"))
        val w = base
          .select(explode(sequence(col("day_idx"), col("day_idx") + lit(RollDays - 1))).as("w_idx"),
            col("user_id"))
          .groupBy("w_idx").agg(approx_count_distinct("user_id").as("wau"))
        (d, w)
      } else {
        val ud = base.distinct()
        val d = ud.groupBy("day_idx", "day").agg(count(lit(1)).as("dau"))
        val w = ud
          .select(explode(sequence(col("day_idx"), col("day_idx") + lit(RollDays - 1))).as("w_idx"),
            col("user_id"))
          .distinct()
          .groupBy("w_idx").agg(count(lit(1)).as("wau"))
        (d, w)
      }
    // both sides are O(days) rows; the inner join also drops the phantom
    // window ends past the last calendar day (they have no DAU row)
    dau.join(wau, dau("day_idx") === wau("w_idx"))
      .select(col("day"), col("dau"), col("wau"))
      .withColumn("stickiness", expr("ROUND(dau * 1e0 / wau, 6)"))
      .orderBy("day")
  }

  def activeUsersSql: String =
    s"""WITH ud AS (SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |  datediff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE)) AS day_idx, user_id FROM events),
       |dau AS (SELECT day_idx, day, COUNT(*) AS dau FROM ud GROUP BY 1, 2),
       |cov AS (SELECT DISTINCT u.day_idx + g.g AS w_idx, u.user_id
       |  FROM ud u, generate_series(0, ${RollDays - 1}) g(g)),
       |wau AS (SELECT w_idx, COUNT(*) AS wau FROM cov GROUP BY 1)
       |SELECT d.day, d.dau, w.wau, ROUND(d.dau * 1e0 / w.wau, 6) AS stickiness
       |FROM dau d JOIN wau w ON d.day_idx = w.w_idx ORDER BY day""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------ attribution

  /** Conversion event type for attribution. */
  val ConversionType = "purchase"

  /** Last-touch attribution: every conversion (purchase) credits the LAST
    * non-conversion event the same user emitted strictly before it;
    * conversions with no prior touch are 'direct'. One scan, ONE user
    * exchange: the crediting is a user-partitioned `last(..., ignoreNulls)`
    * window over (ts, event_id) — deterministic under timestamp ties —
    * then a channels-sized rollup; the share denominators come from a
    * window over that tiny frame, not a second scan. Revenue accumulates
    * in DECIMAL(18,4) (exact, order-free) with one final double cast. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val credited = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .withColumn("channel", last(
        when(col("event_type") =!= ConversionType, col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === ConversionType)
      .groupBy(coalesce(col("channel"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("value").cast("decimal(18,4)")).as("revenue_dec"))
    val tot = Window.partitionBy()
    credited
      .withColumn("total_conv", sum("n_conversions").over(tot))
      .withColumn("total_rev_dec", sum("revenue_dec").over(tot))
      .selectExpr("channel", "n_conversions",
        "ROUND(CAST(revenue_dec AS DOUBLE), 6) AS attributed_revenue",
        "ROUND(n_conversions * 1e0 / total_conv, 6) AS conv_share",
        "ROUND(CAST(revenue_dec AS DOUBLE) / CAST(total_rev_dec AS DOUBLE), 6) AS revenue_share")
      .orderBy("channel")
  }

  def attributionSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id, value FROM events),
       |touched AS (SELECT *, LAST_VALUE(CASE WHEN event_type <> '$ConversionType' THEN event_type END IGNORE NULLS)
       |  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel FROM ev),
       |credited AS (SELECT COALESCE(channel, 'direct') AS channel, COUNT(*) AS n_conversions,
       |  SUM(value::DECIMAL(18,4)) AS revenue_dec FROM touched WHERE event_type = '$ConversionType' GROUP BY 1),
       |tot AS (SELECT *, SUM(n_conversions) OVER () AS total_conv, SUM(revenue_dec) OVER () AS total_rev_dec FROM credited)
       |SELECT channel, n_conversions, ROUND(CAST(revenue_dec AS DOUBLE), 6) AS attributed_revenue,
       |  ROUND(n_conversions * 1e0 / total_conv, 6) AS conv_share,
       |  ROUND(CAST(revenue_dec AS DOUBLE) / CAST(total_rev_dec AS DOUBLE), 6) AS revenue_share
       |FROM tot ORDER BY channel""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------ conversion lag

  /** Time-to-convert distribution: per user, the lag from FIRST view to the
    * first conversion strictly after it (the funnel's first-touch
    * semantics), summarized as count / mean / p50 / p90 / min / max hours.
    * One scan, one user exchange (the funnel's stacked-window shape), then
    * a 1-row aggregate over the users-sized lag frame. Lags stay exact
    * integer µs through the percentiles; each output converts to hours in
    * ONE shared division. `approx = true` swaps the exact sort-based
    * `percentile` for the mergeable sketch (the 100 TB path — exact
    * percentile buffers every lag per agg buffer). */
  def conversionLag(spark: SparkSession, dir: String, approx: Boolean = false): DataFrame = {
    val pct = if (approx) "percentile_approx" else "percentile"
    val w = Window.partitionBy("user_id")
    val lags = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("t1", min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("t3", min(when(col("event_type") === ConversionType && col("ts_us") > col("t1"),
        col("ts_us"))).over(w))
      .groupBy("user_id").agg(max("t1").as("t1"), max("t3").as("t3"))
      .filter(col("t3").isNotNull)
      .select((col("t3") - col("t1")).as("lag_us"))
    lags.agg(
        count(lit(1)).as("n_converted"),
        sum(col("lag_us").cast("decimal(20,0)")).as("sum_us"),
        expr(s"$pct(lag_us, 0.5e0) AS p50_us"),
        expr(s"$pct(lag_us, 0.9e0) AS p90_us"),
        min("lag_us").as("min_us"),
        max("lag_us").as("max_us"))
      .selectExpr(convLagFinalCols: _*)
  }

  /** Shared final projection — IDENTICAL text in both engines; 3.6e9 µs/h. */
  private def convLagFinalCols: Seq[String] = Seq(
    "n_converted",
    "ROUND((CAST(sum_us AS DOUBLE) / n_converted) / 3.6e9, 6) AS mean_hours",
    "ROUND(p50_us / 3.6e9, 6) AS p50_hours",
    "ROUND(p90_us / 3.6e9, 6) AS p90_hours",
    "ROUND(min_us / 3.6e9, 6) AS min_hours",
    "ROUND(max_us / 3.6e9, 6) AS max_hours")

  def conversionLagSql: String =
    s"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
       |t1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1),
       |t3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3 FROM ev e JOIN t1 ON e.user_id = t1.user_id AND e.ts_us > t1.t1
       |  WHERE e.event_type = '$ConversionType' GROUP BY 1),
       |lags AS (SELECT t3.t3 - t1.t1 AS lag_us FROM t3 JOIN t1 ON t3.user_id = t1.user_id),
       |s AS (SELECT COUNT(*) AS n_converted, SUM(lag_us::DECIMAL(20,0)) AS sum_us,
       |  quantile_cont(lag_us, 0.5e0) AS p50_us, quantile_cont(lag_us, 0.9e0) AS p90_us,
       |  MIN(lag_us) AS min_us, MAX(lag_us) AS max_us FROM lags)
       |SELECT ${convLagFinalCols.mkString(", ")} FROM s""".stripMargin.replace("\n", " ")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rolling_stats" -> ((s, d) => rollingStats(s, d)),
    "cohort_retention" -> ((s, d) => cohortRetention(s, d)),
    "funnel" -> ((s, d) => funnel(s, d)),
    "rfm_segments" -> ((s, d) => rfmSegments(s, d)),
    "active_users" -> ((s, d) => activeUsers(s, d)),
    "attribution" -> ((s, d) => attribution(s, d)),
    "conversion_lag" -> ((s, d) => conversionLag(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "rolling_stats" -> rollingStatsSql,
    "cohort_retention" -> cohortRetentionSql,
    "funnel" -> funnelSql,
    "rfm_segments" -> rfmSegmentsSql,
    "active_users" -> activeUsersSql,
    "attribution" -> attributionSql,
    "conversion_lag" -> conversionLagSql,
  )
}
