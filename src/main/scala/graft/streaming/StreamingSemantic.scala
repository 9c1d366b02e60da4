package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** Streaming twin of [[graft.pipeline.Similarity.semanticDedup]]: an
  * unbounded feed of new embedding rows gated against a STATIC corpus's
  * cell structure — the semantic analogue of
  * [[StreamingIncrement.incrementGate]]'s exact/fuzzy text gates.
  *
  * Per incoming vector: (1) assign to a corpus cell with a STATELESS
  * in-row TWO-LEVEL argmax fold over the 1-row broadcast centroid
  * arrays — route to the TOP-2 super-centroids first (multi-probe),
  * then argmax those groups' children, the exact
  * [[graft.pipeline.Similarity.hierAssign]] arithmetic the corpus side
  * used, so a near-duplicate of a corpus vector routes to the SAME cell
  * (a window/groupBy argmax would need per-batch aggregation state; each
  * fold replays the batch tie-break — highest rounded cosine, then
  * lowest id — because the arrays are id-sorted and only a strictly
  * greater similarity displaces the accumulator); (2) stream-
  * static LEFT ANTI join against that cell's corpus vectors on
  * `same cell ∧ cosine ≥ threshold` — any semantic duplicate of the
  * corpus is dropped, everything else is admitted unchanged.
  *
  * The whole gate carries ZERO streaming state: no watermark, no
  * aggregation buffer — one broadcast row + one stream-static join.
  * Deviations from the batch operator (documented): the gate judges the
  * feed against the CORPUS only — within-batch duplicates are the batch
  * pass's job (the [[StreamingIncrement]] discipline) — and a feed
  * vector with no assignable centroid (empty corpus) is admitted
  * (keep-everything fallback, mirroring the batch self-cell rule).
  *
  * At scale the static side is built once per corpus snapshot via
  * [[Similarity.cellStructure]] and persisted like
  * [[graft.pipeline.Dedup.writeClusters]]; per micro-batch cost is
  * increment × (~4√K-fold + one cell-keyed equi-join), never corpus².
  */
object StreamingSemantic {

  /** In-row cosine between the feed vector and another array column. */
  private def cosExpr(other: String, otherNorm: String): String =
    s"round(aggregate(zip_with(__v, $other, (x, y) -> x * y), 0D, " +
      s"(a, x) -> a + x) / NULLIF(__n * $otherNorm, 0), 6)"

  /** Gate an unbounded (vec_id, embedding, …) stream against a static
    * embeddings-shaped corpus. Emits admitted rows with the input
    * schema.
    *
    * Cache lifecycle (the [[Similarity.ivfTopKFromIndex]] discipline): the
    * static cellVecs frame is cached so every micro-batch's anti-join
    * reuses the n×K assignment. A service that rebuilds the gate per
    * corpus refresh must pass a [[graft.drift.CacheScope]] and `release()`
    * it when the previous gate's last batch has flushed, or each rebuild
    * strands another cached corpus-sized frame for the session; the
    * unscoped default matches Verify/Bench, which clear the whole cache
    * between queries. */
  def semanticGate(newVecs: DataFrame, corpus: DataFrame,
      threshold: Double = Similarity.SemDedupThreshold,
      scope: Option[graft.drift.CacheScope] = None): DataFrame = {
    // cached: every micro-batch's anti-join reuses the corpus assignment
    // (uncached, each batch re-ran the corpus scan — r13 review)
    val (cents, cellVecs0) = Similarity.cellStructure(corpus)
    val cellVecs = scope.fold(cellVecs0.cache())(_.cached(cellVecs0))
    // one row holding BOTH fold inputs: the centroid array (sorted by
    // cent_id, tagged with its cent_id DIV cps group) and the super array
    // (min-cent_id child per group, sorted by group id) — the broadcast
    // the two-level fold routes through. cps mirrors cellStructure's
    // hierAssign exactly (cells from the same corpus count).
    val cps = Similarity.childrenPerSuper(
      Similarity.cellsForCorpus(corpus.count()))
    val centsG = cents.withColumn("__g", expr(s"cent_id DIV $cps"))
    val centsRow = centsG
      .agg(expr("array_sort(collect_list(struct(cent_id, t_v, t_n, __g))) AS __cents"))
      .crossJoin(centsG.groupBy("__g")
        .agg(expr("min_by(struct(t_v, t_n), cent_id)").as("__s"))
        .agg(expr("array_sort(collect_list(named_struct(" +
          "'sid', __g, 'sv', __s.t_v, 'sn', __s.t_n))) AS __supers")))
    // the static side carries the per-cell candidate cap (the ANN search
    // guard): an increment row's anti-join probe pays at most
    // MaxSearchBucket cosines per cell instead of the whole hot cell —
    // for the near-identical hot cell the cap exists for, the lowest-id
    // representatives ARE the duplicates a real dup would match. The
    // guard's arming count() runs against the CACHED frame deliberately
    // (no sizeBound): it materializes the static side at gate-build time,
    // before the first micro-batch arrives

    gateWith(newVecs, centsRow,
      Similarity.capCandidates(cellVecs, "cell", "c_id",
          Similarity.MaxSearchBucket,
          sizeBound = Similarity.SizeBoundByCounting)
        .select(col("cell"), col("c_v"), col("c_n")), threshold)
  }

  /** The same gate against PRECOMPUTED static artifacts — the production
    * form (build [[Similarity.cellStructure]] once per corpus snapshot,
    * persist, and feed every increment). */
  def gateWith(newVecs: DataFrame, centsRow: DataFrame,
      cellVecs: DataFrame, threshold: Double): DataFrame = {
    val inCols = newVecs.columns.toSeq
    val assigned = newVecs
      .withColumn("__v", col("embedding").cast("array<double>"))
      .withColumn("__n", sqrt(expr(
        "aggregate(zip_with(__v, __v, (x, y) -> x * y), 0D, (a, x) -> a + x)")))
      .crossJoin(broadcast(centsRow))
      // stage 1: route to the TOP-2 super-centroids (cosines computed
      // once via transform, then a pure top-2 fold: the arrays are
      // id-sorted and only a strictly greater similarity displaces a
      // slot, so s1/s2 land on rank-1/rank-2 of (sim DESC, sid ASC) —
      // hierAssign's demoted second max_by)
      .withColumn("__sids", expr(
        s"aggregate(transform(__supers, st -> named_struct(" +
          s"'sid', st.sid, 'sim', ${cosExpr("st.sv", "st.sn")})), " +
          "named_struct('s1', named_struct('sid', CAST(NULL AS BIGINT), 'sim', CAST(NULL AS DOUBLE)), " +
          "'s2', named_struct('sid', CAST(NULL AS BIGINT), 'sim', CAST(NULL AS DOUBLE))), " +
          "(acc, x) -> CASE " +
          "WHEN acc.s1.sim IS NULL OR x.sim > acc.s1.sim " +
          "THEN named_struct('s1', x, 's2', acc.s1) " +
          "WHEN acc.s2.sim IS NULL OR x.sim > acc.s2.sim " +
          "THEN named_struct('s1', acc.s1, 's2', x) " +
          "ELSE acc END)"))
      // stage 2: argmax over ONLY the two routed groups' children — the
      // filter bounds the fold to ≤ 2·cps cosines per row
      .withColumn("__cell", expr(
        s"aggregate(transform(filter(__cents, " +
          "ct -> ct.__g = __sids.s1.sid OR ct.__g = __sids.s2.sid), " +
          s"ct -> named_struct(" +
          s"'cid', ct.cent_id, 'sim', ${cosExpr("ct.t_v", "ct.t_n")})), " +
          "named_struct('cid', CAST(NULL AS BIGINT), 'sim', CAST(NULL AS DOUBLE)), " +
          "(acc, x) -> CASE WHEN acc.sim IS NULL OR x.sim > acc.sim " +
          "THEN x ELSE acc END).cid"))
    assigned.join(cellVecs,
        assigned("__cell") === cellVecs("cell") &&
          expr(cosExpr("c_v", "c_n")) >= lit(threshold),
        "left_anti")
      .select(inCols.map(col): _*)
  }
}
