package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.drift.{r6, table}

/** N-gram language-model quality scoring — the CCNet/KenLM curation signal
  * (Wenzek et al. 2020: docs are ranked by the perplexity of a small LM
  * trained on a trusted corpus; low perplexity ≈ fluent text, high ≈ noise).
  * The reference engine has no LM scorer; a training-data pipeline at
  * 100 TB filters on one, so this implements the whole loop in pure
  * DataFrame ops:
  *
  *   1. TRAIN: unigram + bigram counts over the trusted slice (here the
  *      corpus's `lang = 'en'` docs — in production a bounded high-quality
  *      sample, which is what keeps the model broadcastable).
  *   2. SCORE: every doc's bigrams stream once through three BROADCAST
  *      joins (unigram×2, bigram) — the corpus-sized side never shuffles;
  *      the model side is vocabulary-sized by construction. Stupid Backoff
  *      (Brants et al. 2007), the count-ratio scheme built for exactly
  *      this distributed-counts setting:
  *        s(w2 | w1) = cb(w1,w2) / cu(w1)                 if the bigram was seen
  *                   = 0.4 · (cu(w2) + 1) / (N + V)       otherwise
  *      (add-one-smoothed unigram backoff so unseen words score finitely).
  *   3. REDUCE: per-doc mean log10 score and ppl = 10^(−mean); docs too
  *      short to have a bigram surface with NULL metrics, not a row drop
  *      (`inline_outer` keeps them through the explode — no spine re-join).
  *
  * Only shuffles: the two model-count aggregations (vocabulary-sized) and
  * the per-doc mean (doc_id-keyed, same class as every per-doc rollup
  * here). Mean log-probs ship UNROUNDED — both engines fold identical
  * doubles and the gate's uniform rounding agrees (see SURVEY §10 on
  * cross-engine float ties; per-doc sums are ~100 terms, last-ulp safe).
  */
object LmScore {

  /** Trusted-slice language and the Stupid Backoff discount. */
  val TrainLang = "en"
  val BackoffSql = "0.4e0"

  /** Whitespace tokens of the lowercased text, empties dropped — one shared
    * shape per engine (`split` returns `['']` on an empty string in both). */
  private val toksSpark =
    "filter(split(lower(text), '\\\\s+'), t -> t != '') AS toks"
  private val toksDuck =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t != '') AS toks"

  /** Adjacent-token pairs as structs, built inside the array (no
    * positional self-join): `try_element_at` is the ANSI-safe lookahead —
    * the final (word, NULL) pair is filtered off. */
  private val bgsSpark =
    "filter(transform(toks, (t, i) -> named_struct('w1', t, 'w2', " +
      "try_element_at(toks, i + 2))), s -> s.w2 IS NOT NULL) AS bgs"

  /** A trained Stupid-Backoff model: unigram counts (w, cu), bigram counts
    * (w1, w2, cb), and the 1-row (n_train, v_train) totals — all
    * vocabulary-sized, which is what keeps scoring broadcast-only. */
  case class LmModel(uni: DataFrame, bi: DataFrame, totals: DataFrame)

  /** Trains the model from any (lang, text) batch frame's [[TrainLang]]
    * slice. */
  def trainModel(docs: DataFrame): LmModel = {
    val toks = docs.filter(col("lang") === TrainLang).selectExpr(toksSpark)
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cu"))
    val bi = toks.selectExpr(bgsSpark).selectExpr("inline(bgs)")
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val totals = uni.agg(sum("cu").cast("double").as("n_train"),
      count(lit(1)).cast("double").as("v_train"))
    LmModel(uni, bi, totals)
  }

  /** Per-doc LM score over any (doc_id, lang, text) frame, model trained
    * from the frame's own [[TrainLang]] slice. `carry` columns (e.g.
    * `source`) ride along to the output instead of being re-joined —
    * doc_id is unique, so widening the per-doc group key is free and saves
    * a corpus-sized shuffle join downstream. */
  def scoreDocs(docs: DataFrame, carry: Seq[String] = Nil): DataFrame =
    scoreAgainst(docs, trainModel(docs), carry)

  /** Scores any (doc_id, text, carry…) frame against an already-trained
    * model — the reusable half ([[scoreDocs]] for the self-trained batch
    * query, [[graft.streaming.StreamingLm]] and the corpus-prep LM gate
    * for bounded/streamed scoring). */
  def scoreAgainst(docs: DataFrame, model: LmModel,
      carry: Seq[String] = Nil): DataFrame = {
    val keep = Seq("doc_id") ++ carry
    val toks = docs.selectExpr(keep :+ toksSpark: _*)
    val pairs = toks.selectExpr(keep :+ bgsSpark: _*)
      .selectExpr(keep :+ "inline_outer(bgs)": _*)
    val (uni, bi, totals) = (model.uni, model.bi, model.totals)
    val scored = pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("cu1"))), Seq("w1"), "left")
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("cu2"))), Seq("w2"), "left")
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .crossJoin(broadcast(totals))
      .selectExpr(keep ++ Seq(
        "CASE WHEN w1 IS NULL THEN NULL WHEN cb IS NOT NULL THEN 1e0 ELSE 0e0 END AS hit",
        "CASE WHEN w1 IS NULL THEN NULL WHEN cu2 IS NULL THEN 1e0 ELSE 0e0 END AS oov",
        "CASE WHEN w1 IS NULL THEN NULL WHEN cb IS NOT NULL THEN log10(cb * 1e0 / cu1) " +
          s"ELSE log10($BackoffSql * (COALESCE(cu2, 0) + 1) / (n_train + v_train)) END AS lp"): _*)
    scored.groupBy(keep.map(col): _*).agg(
        count(col("hit")).as("n_bigrams"),
        avg("hit").as("bigram_hit_rate"),
        avg("oov").as("oov_rate"),
        avg("lp").as("avg_logprob"))
      .selectExpr(keep ++ Seq("n_bigrams", "bigram_hit_rate", "oov_rate",
        "avg_logprob",
        "CASE WHEN avg_logprob IS NOT NULL THEN pow(10e0, -avg_logprob) END AS ppl"): _*)
  }

  def lmScore(spark: SparkSession, dir: String): DataFrame =
    scoreDocs(table(spark, dir, "documents").select("doc_id", "lang", "text"))
      .orderBy("doc_id")

  /** Shared oracle CTE prefix mirroring [[scoreAgainst]]'s frames: the
    * model always trains on `documents`' [[TrainLang]] slice; scoring runs
    * over `scoreRel` (any relation exposing doc_id + text). DuckDB zips
    * the two shifted slices via parallel unnest (its native bigram idiom —
    * 0-bigram docs come back on the spine LEFT JOIN instead of
    * `inline_outer`). */
  private[pipeline] def scoredCtesFor(scoreRel: String): String =
    s"mtoks AS (SELECT doc_id, lang, $toksDuck FROM documents), " +
      "mpairs AS (SELECT lang, unnest(toks[1:len(toks)-1]) AS w1, " +
      "unnest(toks[2:len(toks)]) AS w2 FROM mtoks), " +
      s"uni AS (SELECT w, COUNT(*) AS cu FROM (SELECT unnest(toks) AS w FROM mtoks " +
      s"WHERE lang = '$TrainLang') u GROUP BY 1), " +
      s"bi AS (SELECT w1, w2, COUNT(*) AS cb FROM mpairs WHERE lang = '$TrainLang' GROUP BY 1, 2), " +
      "tot AS (SELECT SUM(cu)::DOUBLE AS n_train, COUNT(*)::DOUBLE AS v_train FROM uni), " +
      s"stoks AS (SELECT doc_id, $toksDuck FROM $scoreRel), " +
      "spairs AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1, " +
      "unnest(toks[2:len(toks)]) AS w2 FROM stoks), " +
      "scored AS (SELECT p.doc_id, " +
      "CASE WHEN cb IS NOT NULL THEN 1e0 ELSE 0e0 END AS hit, " +
      "CASE WHEN u2.cu IS NULL THEN 1e0 ELSE 0e0 END AS oov, " +
      "CASE WHEN cb IS NOT NULL THEN log10(cb * 1e0 / u1.cu) " +
      s"ELSE log10($BackoffSql * (COALESCE(u2.cu, 0) + 1) / (n_train + v_train)) END AS lp " +
      "FROM spairs p LEFT JOIN uni u1 ON p.w1 = u1.w LEFT JOIN uni u2 ON p.w2 = u2.w " +
      "LEFT JOIN bi ON p.w1 = bi.w1 AND p.w2 = bi.w2 CROSS JOIN tot), " +
      "agg AS (SELECT doc_id, COUNT(*) AS n_bigrams, AVG(hit) AS bigram_hit_rate, " +
      "AVG(oov) AS oov_rate, AVG(lp) AS avg_logprob FROM scored GROUP BY 1)"

  def lmScoreSql: String =
    s"WITH ${scoredCtesFor("documents")} " +
      "SELECT t.doc_id, COALESCE(n_bigrams, 0)::BIGINT AS n_bigrams, " +
      "bigram_hit_rate, oov_rate, avg_logprob, " +
      "CASE WHEN avg_logprob IS NOT NULL THEN pow(10e0, -avg_logprob) END AS ppl " +
      "FROM stoks t LEFT JOIN agg ON t.doc_id = agg.doc_id ORDER BY t.doc_id"

  /** Production-shape family runner: scores the corpus ONCE (cached) and
    * derives all three LM surfaces — per-doc scores, per-source rollup,
    * CCNet ppl buckets — from the shared frame. This is the deployment
    * cost; the bench's per-query cache-cleared runs re-pay the scoring DAG
    * once per query by harness construction. */
  def lmFamilyShared(spark: SparkSession, dir: String,
      approx: Boolean = true): Seq[DataFrame] = {
    val docs = table(spark, dir, "documents")
    val scored = scoreDocs(docs.select("doc_id", "source", "lang", "text"),
      carry = Seq("source")).cache()
    val perDoc = scored.orderBy("doc_id")
    val bySource = scored.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        count(col("avg_logprob")).as("n_scored"),
        avg("oov_rate").as("mean_oov_rate"),
        avg("avg_logprob").as("mean_logprob"))
      .orderBy("source")
    val (t1, t2) = pplTerciles(scored, approx)
    val buckets = scored.withColumn("bucket", bucketExpr(t1, t2))
      .groupBy("source", "bucket").agg(
        count(lit(1)).as("n_docs"), r6(avg("ppl")).as("mean_ppl"))
      .orderBy("source", "bucket")
    Seq(perDoc, bySource, buckets)
  }

  /** Per-source rollup — the artifact a corpus filter actually thresholds
    * on (CCNet buckets sources by LM score the same way). */
  def lmScoreBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    scoreDocs(docs.select("doc_id", "source", "lang", "text"), carry = Seq("source"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        count(col("avg_logprob")).as("n_scored"),
        avg("oov_rate").as("mean_oov_rate"),
        avg("avg_logprob").as("mean_logprob"))
      .orderBy("source")
  }

  def lmScoreBySourceSql: String =
    s"WITH ${scoredCtesFor("documents")} " +
      "SELECT d.source, COUNT(*) AS n_docs, COUNT(agg.avg_logprob) AS n_scored, " +
      "AVG(agg.oov_rate) AS mean_oov_rate, AVG(agg.avg_logprob) AS mean_logprob " +
      "FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id " +
      "GROUP BY 1 ORDER BY 1"

  /** CCNet-style quality bucketing (Wenzek et al. 2020, §4.3 "perplexity
    * buckets"): rank every document by LM perplexity and cut the scored
    * corpus at the terciles — `head` (lowest ppl = most fluent), `middle`,
    * `tail`; docs the model can't score (no bigrams) report as `unscored`.
    * Training pipelines sample from the buckets (keep head+middle, drop or
    * downweight tail), so the artifact is per (source, bucket) counts +
    * mean perplexity.
    *
    * Scale shape: one scoring pass (broadcast model joins, see [[lmScore]])
    * → a 1-row tercile aggregate → one counting pass with the two
    * thresholds as literals (z_outliers' broadcast-stats pattern). The
    * oracle path uses EXACT `percentile` (matches DuckDB `quantile_cont`
    * bit-for-bit); `approx = true` (the bench/100 TB surface) swaps in
    * `approx_percentile`'s fixed-size mergeable sketch, since exact
    * percentile buffers every ppl value per agg buffer. */
  /** Tercile thresholds (t_head, t_middle) over a frame's non-null `ppl`
    * column — the batch-side fit a streaming gate replays as literals
    * ([[graft.streaming.StreamingLm.bucketStream]]). Returns (0, 0) when
    * nothing is scorable (every doc then buckets as `unscored` before the
    * thresholds are ever compared). */
  def pplTerciles(scoredPpl: DataFrame, approx: Boolean = false): (Double, Double) = {
    val pcts = s"array(${1.0 / 3}, ${2.0 / 3})"
    val trow = scoredPpl.filter(col("ppl").isNotNull)
      .agg((if (approx) expr(s"approx_percentile(ppl, $pcts, 10000)")
            else expr(s"percentile(ppl, $pcts)")).as("t")).collect()(0)
    if (trow.isNullAt(0)) (0.0, 0.0)
    else { val t = trow.getSeq[Double](0); (t(0), t(1)) }
  }

  /** Bucket expression shared by the batch query and the streaming gate. */
  private[graft] def bucketExpr(t1: Double, t2: Double) =
    when(col("ppl").isNull, "unscored")
      .when(col("ppl") <= t1, "head")
      .when(col("ppl") <= t2, "middle")
      .otherwise("tail")

  def lmPplBuckets(spark: SparkSession, dir: String, approx: Boolean = false,
      scope: Option[CacheScope] = None): DataFrame = {
    val docs = table(spark, dir, "documents")
    val scoredBare = scoreDocs(docs.select("doc_id", "source", "lang", "text"),
        carry = Seq("source"))
      .select(col("doc_id"), col("source"), col("ppl"))
    val scored = scope.fold(scoredBare.cache())(_.cached(scoredBare))
    val (t1, t2) = pplTerciles(scored, approx)
    scored.withColumn("bucket", bucketExpr(t1, t2))
      .groupBy("source", "bucket").agg(
        count(lit(1)).as("n_docs"),
        r6(avg("ppl")).as("mean_ppl"))
      .orderBy("source", "bucket")
  }

  def lmPplBucketsSql: String =
    s"WITH ${scoredCtesFor("documents")}, " +
      "sc AS (SELECT d.doc_id, d.source, " +
      "CASE WHEN agg.avg_logprob IS NOT NULL THEN pow(10e0, -agg.avg_logprob) END AS ppl " +
      "FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id), " +
      "thr AS (SELECT quantile_cont(ppl, 1e0/3) AS t1, quantile_cont(ppl, 2e0/3) AS t2 " +
      "FROM sc WHERE ppl IS NOT NULL), " +
      "b AS (SELECT source, ppl, CASE WHEN ppl IS NULL THEN 'unscored' " +
      "WHEN ppl <= t1 THEN 'head' WHEN ppl <= t2 THEN 'middle' ELSE 'tail' END AS bucket " +
      "FROM sc, thr) " +
      "SELECT source, bucket, COUNT(*)::BIGINT AS n_docs, ROUND(AVG(ppl), 6) AS mean_ppl " +
      "FROM b GROUP BY 1, 2 ORDER BY 1, 2"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lm_score" -> ((s, d) => lmScore(s, d)),
    "lm_score_by_source" -> ((s, d) => lmScoreBySource(s, d)),
    "lm_ppl_buckets" -> ((s, d) => lmPplBuckets(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "lm_score" -> lmScoreSql,
    "lm_score_by_source" -> lmScoreBySourceSql,
    "lm_ppl_buckets" -> lmPplBucketsSql,
  )
}
