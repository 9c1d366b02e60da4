package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.drift.table
import graft.functions.VecFunctions.vecDot

/** Approximate-nearest-neighbor search and embedding-space monitoring
  * over the `embeddings` table (`embedding: array<float>`, 64-dim); all
  * dot products run through the native codegen'd
  * [[graft.functions.VecDot]] expression.
  *
  * Brute-force cosine top-k is the correctness baseline: one fused
  * codegen loop per candidate pair (no UDF, no per-pair allocation),
  * query side broadcast so the scan of the candidate side is
  * embarrassingly parallel. Two scale paths: LSH buckets (random-
  * hyperplane sign bits, so candidate generation is an equi-join on
  * (band, signature)) and IVF cells (nearest-of-K coarse centroids, search
  * within one cell) — neither forms an all-pairs product or a driver-side
  * collect. The hyperplanes are seeded Scala constants embedded
  * as plan literals, and the SAME literals are embedded in the DuckDB
  * oracle SQL (doubles round-trip through toString; both engines fold the
  * dot product left-to-right), so the bucketed queries are hash-checkable.
  * Cosines are rounded to 6 decimals BEFORE ranking so Spark and DuckDB
  * rank identically.
  */
object Similarity {

  val TopK = 5
  val NumQueries = 10 // query set: vec_id < 10
  val Dim = 64

  private def withNorm(df: DataFrame, prefix: String): DataFrame =
    df.select(col("vec_id").as(s"${prefix}_id"),
      col("embedding").cast("array<double>").as(s"${prefix}_v"))
      .withColumn(s"${prefix}_n",
        sqrt(vecDot(col(s"${prefix}_v"), col(s"${prefix}_v"))))

  /** Candidate-side membership ceiling per search bucket/cell — the ANN
    * twin of [[Dedup.MaxBandBucket]] (same round-12 hygiene class): LSH
    * bit width and IVF cell count bound the EXPECTED bucket size, but
    * nothing bounds a pathological one — a duplicate-heavy embedding
    * shard at 100 TB puts B near-identical vectors in one bucket/cell and
    * the search self-join emits B² pairs. Above the cap a bucket keeps
    * only its [[MaxSearchBucket]] lowest vec_ids on the CANDIDATE side
    * (queries are never dropped — every vector still gets results; an
    * evicted vector just stops being findable in that bucket, the
    * standard recall-for-boundedness trade). 16384 = 64×[[IvfTargetCell]]
    * ≈ 2.7e8 pairs/cell worst case (a literal: forward-referencing the
    * val would read 0 during object init); a no-op on the gate corpora
    * (max cell ≈ hundreds at sf0.1 — PipelineSpec pins it). */
  val MaxSearchBucket: Long = 16384L

  /** Bound the candidate side of an in-bucket self-join at `cap` members
    * per `key` group, keeping the lowest `id`s — the same two-level
    * cheapness ladder as [[Dedup.bandsFromTri]]: a frame of ≤ cap rows
    * cannot host an over-cap group (one count(), and the guard is absent
    * from the plan); an armed frame windows only the actually-hot groups
    * found by one partial-aggregated count into a broadcast frame. */
  private[graft] def capCandidates(df: DataFrame, key: String, id: String,
      cap: Long, sizeBound: Long,
      materializeCached: Boolean = true): DataFrame =
    capCandidatesBy(df, Seq(key), id, cap, sizeBound, materializeCached)

  /** Explicit opt-in sentinel for [[capCandidatesBy]]'s `sizeBound`:
    * COUNT THE FRAME ITSELF to decide arming. Counting an uncached frame
    * re-executes its whole pipeline — the hazard `sizeBound` exists to
    * avoid — so this is for ad-hoc frames with no cheaper bound only; the
    * one production caller ([[graft.streaming.StreamingSemantic]]) passes
    * a CACHED frame and uses the count deliberately as its gate-build
    * materialization barrier. (Round-15 verdict item 7: the silent `-1`
    * default is retired — [[Dedup.bandReps]] made its bound required a
    * round earlier; this is the same contract here.) */
  private[graft] val SizeBoundByCounting = -1L

  /** [[capCandidates]] over a composite group key (band, sig).
    * `sizeBound` (REQUIRED): an upper bound on any group's membership
    * known by the caller (e.g. the vector count when `df` has several
    * rows per vector) — usually a parquet-footer count the caller already
    * paid; [[SizeBoundByCounting]] opts into counting `df` itself. */
  private[graft] def capCandidatesBy(df: DataFrame, keys: Seq[String],
      id: String, cap: Long, sizeBound: Long,
      materializeCached: Boolean = true): DataFrame = {
    // A CACHED input is eagerly materialized before this guard returns it
    // into a self-join: the join's child stages first-touch the cache
    // concurrently and a cold cache gets STAMPEDED — each stage computes
    // the block, all but one are discarded (see [[pqEncodedFrame]]; the
    // round-14 sizeBound change silently removed the materialization the
    // old count() fallback provided implicitly, and the capped-join
    // family's CPU regressed until this restored it). An UNCACHED frame
    // is the caller's business — counting it is the re-execution hazard
    // sizeBound exists to avoid.
    //
    // NOTE this makes the cached-caller QUERY BUILDERS (lshTopK, ivfTopK,
    // semanticDedup, embedNeardup) EAGER: constructing their DataFrame
    // runs a materialization job, even on the inert under-cap path —
    // deliberate, because the inert path returns the cached frame
    // straight into the same concurrent self-join (round-14 ADVICE asked
    // for the laziness loss to be explicit). A caller composing plans
    // without executing them (explain/plan audits) MAY pass
    // materializeCached = false — no production caller does today, since
    // every cached caller self-joins the result; semantic equivalence of
    // the two settings is spec-pinned (PipelineSpec).
    if (materializeCached && sizeBound >= 0L &&
        df.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
      df.count(): Unit
    // a group can only exceed the cap if the frame does: the caller's
    // bound (or one count() of the caller-cached frame — materialized a
    // moment early, reused by the query) makes the guard structurally
    // free on any corpus of ≤ cap members, the same ladder as
    // [[Dedup.bandReps]]
    if ((if (sizeBound >= 0L) sizeBound else df.count()) <= cap) df
    else {
      // armed path: window only the actually-hot groups (broadcast hot
      // set, empty on healthy corpora), mirroring Dedup.bandsFromTri
      val hot = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > cap).select(keys.map(col): _*)
      val kept = df.join(broadcast(hot), keys, "left_semi")
        .withColumn("__ck", row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(id)))
        .filter(col("__ck") <= cap).drop("__ck")
      df.join(broadcast(hot), keys, "left_anti").unionByName(kept)
    }
  }

  /** Brute-force cosine top-k for the first [[NumQueries]] vectors. */
  def annCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val q = withNorm(emb.filter(col("vec_id") < NumQueries), "q")
    val c = withNorm(emb, "c")
    c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        round(vecDot(col("q_v"), col("c_v")) / expr("NULLIF(q_n * c_n, 0)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)))
      .filter(col("rk") <= TopK)
      .select(col("q_id").as("query_id"), col("rk"), col("c_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  def annCosineSql: String =
    s"WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS q_n " +
      s"FROM embeddings WHERE vec_id < $NumQueries), " +
      "c AS (SELECT vec_id AS c_id, embedding::DOUBLE[] AS c_v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS c_n FROM embeddings), " +
      "scored AS (SELECT q_id, c_id, ROUND(list_dot_product(q_v, c_v) / NULLIF(q_n * c_n, 0), 6) AS cosine " +
      "FROM q JOIN c ON q_id <> c_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rk FROM scored) " +
      s"SELECT q_id AS query_id, rk, c_id AS neighbor_id, cosine FROM ranked WHERE rk <= $TopK " +
      "ORDER BY query_id, rk"

  // --------------------------------------- seeded hyperplanes (plan literals)

  /** Seeded gaussian hyperplanes. Rendered into BOTH the Spark plan and the
    * DuckDB oracle as decimal literals — Double.toString round-trips, so the
    * two engines evaluate identical IEEE arithmetic. */
  private def hyperplanes(n: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n, Dim)(rnd.nextGaussian())
  }

  /** DuckDB rendering of the band signatures: `bits` sign-bits of
    * dot(v, plane) per band, planes as decimal literals (list_dot_product
    * folds products left-to-right like the Spark side). */
  private def bandSigExprsDuck(planes: Array[Array[Double]], bands: Int, bits: Int,
                               vecCol: String): Seq[String] =
    (0 until bands).map { b =>
      (0 until bits).map { k =>
        val w = planes(b * bits + k).mkString(", ")
        s"(CASE WHEN list_dot_product($vecCol, [$w]) > 0 THEN ${1 << k} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }

  /** Spark side of the same signatures. The planes are ONE nested-array
    * `typedLit` and the dots one `transform` fold (same left-to-right
    * product sum as `list_dot_product`): rendering them as inline SQL
    * literals instead costs seconds of parse/analysis per query on a
    * ~2000-literal expression tree. Returns (dotsColumn, perBandSig(dots)).
    * Materialize dots with withColumn before deriving sigs so the 32-dot
    * transform is evaluated once per row, not once per sign bit. */
  private def bandDots(planes: Array[Array[Double]], vec: Column): Column = {
    val planesLit = typedLit(planes.map(_.toSeq).toSeq)
    transform(planesLit, p => vecDot(vec, p))
  }

  private def bandSigCols(dots: Column, bands: Int, bits: Int): Seq[Column] =
    (0 until bands).map { b =>
      (0 until bits).map { k =>
        when(dots.getItem(b * bits + k) > 0, lit(1 << k)).otherwise(lit(0))
      }.reduce(_ + _)
    }

  // ------------------------------------- embedding near-dup pass (bucketed)

  /** 4 bands of 8 sign-bits each: a pair of near-identical vectors agrees on
    * all 8 bits of at least one band with probability ~1, while random pairs
    * collide on a 256-bucket band rarely — candidate generation is an
    * equi-join on (band, sig) with no driver collect and no O(n²) stream. */
  val NeardupBands = 4
  val NeardupBandBits = 8
  private lazy val neardupPlanes = hyperplanes(NeardupBands * NeardupBandBits, 7L)

  /** Top-20 most-similar candidate pairs (embedding near-dup pass).
    * Candidates come from the band equi-join; exact cosine is computed only
    * for candidates; `orderBy.limit` plans a distributed
    * TakeOrderedAndProject. The oracle SQL replays the identical banding, so
    * the result is engine-exact, not recall-approximate. */
  def embedNeardup(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val normed = emb.withColumn("n", sqrt(vecDot(col("v"), col("v"))))
    val sigCols = bandSigCols(col("dots"), NeardupBands, NeardupBandBits)
    // cached: the band equi-join reads this on both sides, and uncached each
    // side would re-scan the corpus and redo the 32 hyperplane dots
    val bands = emb.withColumn("dots", bandDots(neardupPlanes, col("v")))
      .select(col("vec_id"), posexplode(array(sigCols: _*)))
      .toDF("vec_id", "band", "sig")
      .cache()
    // the LOWER-id side carries the per-(band, sig) cap: every vector
    // still appears as the b side, so a hot bucket's members all pair
    // with the lowest-id representatives (B×cap, never B²) and the
    // strongest pair is never silently lost to eviction — capping the b
    // side instead would cut evicted vectors out of EVERY pair
    // (round-13 review finding). sizeBound = one row per vector in
    // `emb`, so bands (4 rows/vector) can't mislead the arming count.
    val cands = capCandidatesBy(bands, Seq("band", "sig"), "vec_id",
        MaxSearchBucket, sizeBound = emb.count()).as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
      .distinct()
    cands
      .join(normed.select(col("vec_id").as("doc_a"), col("v").as("va"), col("n").as("na")), "doc_a")
      .join(normed.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("n").as("nb")), "doc_b")
      .withColumn("cosine",
        round(vecDot(col("va"), col("vb")) / expr("NULLIF(na * nb, 0)"), 6))
      .orderBy(col("cosine").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(20)
      // rank attaches to the ≤20 surviving rows; the constant partition key
      // keeps WindowExec off its no-partition single-partition path
      .withColumn("one", lit(1))
      .withColumn("rk", row_number().over(Window.partitionBy("one")
        .orderBy(col("cosine").desc, col("doc_a").asc, col("doc_b").asc)))
      .select("rk", "doc_a", "doc_b", "cosine")
      .orderBy("rk")
  }

  def embedNeardupSql: String = {
    val sigs = bandSigExprsDuck(neardupPlanes, NeardupBands, NeardupBandBits, "v")
    val bandSelects = sigs.zipWithIndex.map { case (s, b) =>
      s"SELECT vec_id, $b AS band, CAST($s AS INT) AS sig FROM v"
    }.mkString(" UNION ALL ")
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS n FROM embeddings), " +
      s"bands AS ($bandSelects), " +
      "cands AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b FROM bands a " +
      "JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.vec_id < b.vec_id), " +
      "scored AS (SELECT doc_a, doc_b, ROUND(list_dot_product(va.v, vb.v) / NULLIF(va.n * vb.n, 0), 6) AS cosine " +
      "FROM cands JOIN v va ON va.vec_id = doc_a JOIN v vb ON vb.vec_id = doc_b) " +
      "SELECT rk, doc_a, doc_b, cosine FROM (SELECT *, ROW_NUMBER() OVER " +
      "(ORDER BY cosine DESC, doc_a ASC, doc_b ASC) AS rk FROM scored) r WHERE rk <= 20 ORDER BY rk"
  }

  // ------------------------------------------- LSH-bucketed ANN (scale path)

  /** Random-hyperplane signature: `bits` sign-bits of dot(v, h_b). Vectors
    * sharing a signature land in one bucket; queries only score their
    * bucket. Oracle-checked via [[lshTopKSql]]: the planes for any `bits`
    * are a PREFIX of the seed's gaussian stream (Array.fill is row-major),
    * so the SQL inlines the max-width plane set and masks by the bit width
    * it derives from COUNT(*) with the same formula. */
  def lshBuckets(df: DataFrame, bits: Int = 8, seed: Long = 42L): DataFrame =
    df.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("dots", bandDots(hyperplanes(bits, seed), col("v")))
      .withColumn("bucket", bandSigCols(col("dots"), 1, bits).head.cast("bigint"))
      .drop("dots")

  /** Signature width for n vectors targeting ~`targetBucket` vectors per
    * bucket: in-bucket work stays bounded as the corpus grows (10⁹ vectors →
    * 24 bits → ~60/bucket), instead of buckets growing linearly with n. */
  def bitsForCorpus(n: Long, targetBucket: Int = 64): Int = {
    val b = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(28, math.max(8, b))
  }

  /** Bucketed top-k: exact cosine within each bucket only. Bit width scales
    * with the corpus size (one cheap count against the parquet footer). */
  def lshTopK(spark: SparkSession, dir: String, k: Int = TopK,
      maxBucket: Long = MaxSearchBucket): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val nVecs = emb.count()
    val bits = bitsForCorpus(nVecs)
    // cached: both sides of the in-bucket self-join consume it; uncached
    // each side re-scans the corpus and recomputes the bucket dots
    // (MEMORY_AND_DISK, so a corpus-sized frame spills instead of evicting)
    val b = lshBuckets(emb, bits)
      .withColumn("n", sqrt(vecDot(col("v"), col("v"))))
      .cache()
    // sizeBound: the already-paid corpus count (1 row/vector in b), so the
    // guard never count()s the cached bucket frame itself — an uncached
    // caller of a refactored variant can't silently re-run the bucket scan
    b.as("q").join(capCandidates(b, "bucket", "vec_id", maxBucket,
        sizeBound = nVecs).as("c"),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cosine",
        round(vecDot(col("q.v"), col("c.v")) / expr("NULLIF(q.n * c.n, 0)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q.vec_id").orderBy(col("cosine").desc, col("c.vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q.vec_id").as("query_id"), col("rk"), col("c.vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  /** Clamp bounds of [[bitsForCorpus]], shared with the oracle SQL. */
  val MinBits = 8
  val MaxBits = 28

  /** DuckDB mirror of [[lshTopK]]. The bit width is data-adaptive, so the
    * SQL recomputes it from COUNT(*) with the same ln-ratio/ceil/clamp
    * arithmetic, inlines the plane literals for the maximum width (the
    * seeded stream is prefix-stable: `hyperplanes(b, seed)` equals the
    * first b rows of `hyperplanes(MaxBits, seed)`), and masks each sign
    * bit by `k < bits`. */
  def lshTopKSql(k: Int = TopK): String = {
    val planes = hyperplanes(MaxBits, 42L)
    val dots = planes.zipWithIndex.map { case (p, i) =>
      s"list_dot_product(v, [${p.mkString(", ")}]) AS d$i"
    }.mkString(", ")
    val sig = (0 until MaxBits).map { i =>
      s"(CASE WHEN $i < bits AND d$i > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"WITH bits_t AS (SELECT LEAST($MaxBits, GREATEST($MinBits, " +
      "CAST(CEIL(LN(GREATEST(1.0, COUNT(*) / 64.0)) / LN(2.0)) AS INT))) AS bits FROM embeddings), " +
      "v AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
      s"d AS (SELECT vec_id, v, nrm, $dots FROM v), " +
      s"b AS (SELECT vec_id, v, nrm, CAST($sig AS BIGINT) AS bucket FROM d, bits_t), " +
      "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "ROUND(list_dot_product(q.v, c.v) / NULLIF(q.nrm * c.nrm, 0), 6) AS cosine " +
      "FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM scored) " +
      s"SELECT query_id, rk, neighbor_id, cosine FROM ranked WHERE rk <= $k ORDER BY query_id, rk"
  }

  // -------------------------------------------------- IVF ANN (scale path)

  /** Target vectors per IVF cell: the cell count GROWS with the corpus so
    * in-cell work stays bounded. */
  val IvfTargetCell = 256

  /** Upper clamp on the cell count (the centroid set is broadcast; 2²⁰
    * 64-dim doubles ≈ 0.5 GB is the practical broadcast ceiling). */
  val MaxIvfCells: Int = 1 << 20

  /** Cell count for n vectors targeting ~[[IvfTargetCell]] per cell — the
    * IVF analogue of [[bitsForCorpus]]. A FIXED cell count K makes the
    * in-cell exact self-join O(n²/K): quadratic in the corpus, the exact
    * failure mode bucketed LSH avoids. With K = ⌈n / target⌉ each cell holds
    * ~target vectors and the search costs O(n · target) — linear. */
  def cellsForCorpus(n: Long, targetCell: Int = IvfTargetCell): Int =
    math.min(MaxIvfCells.toLong,
      math.max(1L, math.ceil(n.toDouble / targetCell).toLong)).toInt

  /** Cell counts at or below this take the FLAT single-level argmax: with
    * K ≤ 256 the flat path pays ≤ 256 dots/vector — within ~4× of the
    * two-level route's 2⌈√K⌉ + 2cps and far below the point where
    * assignment dots matter next to the in-cell search — while the
    * two-level plan's extra stages (two routing aggregations, three
    * broadcast builds per pass) are pure overhead. K ≤ 256 ⇔ n ≤ 65k
    * ([[cellsForCorpus]]): every gate SF and the 25k probe take the flat
    * plan (round-16 A/B: ann_kmeans 5.7 → 2.0 s at sf0.1); the 200k
    * decade probe (K = 782) and every at-scale corpus take the
    * hierarchy. The ladder is ONE arithmetic, not two semantics: at
    * K ≤ 256 [[childrenPerSuper]] = K, so the two-level route
    * DEGENERATES to the flat argmax (one group holds every centroid and
    * top-2-of-1 probes it) — the oracle CTEs replay the same CASE and
    * the flat plan is just the degenerate route with its no-op stages
    * removed. */
  val FlatAssignMaxCells: Int = 256

  /** Super-cell count for a K-cell coarse quantizer: 1 (the flat ladder
    * rung) for K ≤ [[FlatAssignMaxCells]], else ⌈√K⌉. K itself grows
    * with the corpus ([[cellsForCorpus]]), so a FLAT nearest-of-K
    * assignment pays n×K ≈ n²/256 dot products mid-range — the round-15
    * decade probe measured it at 41× CPU for 10× vectors, the one
    * super-linearity left in the engine. Two-level routing
    * ([[hierAssign]], top-2 multi-probe) costs n×(2⌈√K⌉ + 2⌈K/⌈√K⌉⌉) ≈
    * 4n√K instead: ~7× fewer assignment dots at the probe's 200k
    * vectors, 256× fewer at the [[MaxIvfCells]] clamp. */
  def superCellsFor(cells: Int): Int =
    if (cells <= FlatAssignMaxCells) 1
    else math.max(1, math.ceil(math.sqrt(cells.toDouble)).toInt)

  /** Children per super-cell: ⌈K / [[superCellsFor]]⌉. Groups are
    * CONTIGUOUS cent_id ranges (group = cent_id DIV cps), so both engines
    * replay the partition with integer arithmetic alone. */
  def childrenPerSuper(cells: Int): Int =
    math.max(1, math.ceil(cells.toDouble / superCellsFor(cells)).toInt)

  /** Two-level (hierarchical) nearest-centroid assignment — the scale fix
    * for the flat n×K argmax (see [[superCellsFor]]) — with a FLAT fast
    * path for K ≤ `flatMax` (default [[FlatAssignMaxCells]]): there the
    * grouping arithmetic puts every centroid in one group, the route is a
    * no-op, and the fast path evaluates the identical degenerate argmax
    * as one broadcast × one aggregation (round-16; gate SFs and any
    * corpus ≤ 65k vectors take it). The K centroids are
    * partitioned into contiguous cent_id groups of [[childrenPerSuper]]
    * children; each group's SUPER-centroid is its min-cent_id child
    * (robust to id gaps — a missing prefix id cannot orphan a group). A
    * vector first ranks the ⌈√K⌉ supers (rounded cosine 6 dp, smaller
    * group id on ties — the exact argmax arithmetic every IVF oracle
    * already replays), keeps the TOP-2 groups (multi-probe routing: the
    * nearest-centroid-in-another-group miss that costs a single-probe
    * hierarchy its recall is overwhelmingly a boundary effect between
    * the two best supers), then argmaxes over those groups'
    * ≤2⌈K/⌈√K⌉⌉ children. Deterministic and SQL-replayable
    * ([[hierAssignCtes]]), so the IVF family stays hash-checked. The
    * residual hierarchical-quantizer recall trade applies only when the
    * globally-nearest centroid lives outside BOTH routed groups —
    * near-identical vectors still route IDENTICALLY (same arithmetic,
    * same ties), which is the property the semantic-dedup / gate
    * semantics actually require.
    *
    * Plan shape: three chained broadcast joins (supers twice — the
    * second routing pass demotes the chosen group inside the max_by
    * ordering rather than filtering rows, so a 1-group corpus cannot
    * lose vectors — then the full centroid frame equi-keyed on the
    * exploded routed groups) with max_by argmaxes keyed on c_id — ONE
    * exchange total (every later groupBy reuses the first agg's hash
    * partitioning); vector payloads cross it once inside any_value
    * partial buffers. No window over the scored frame, no corpus-side
    * shuffle join, no cartesian product. The stage-2 broadcast is still
    * the full K-row centroid frame (same [[MaxIvfCells]] ≈ 0.5 GB
    * ceiling as the flat path) — the equi-join on the group id is what
    * bounds the per-vector DOT count to the two routed groups' children.
    * Total ≈ n×(2⌈√K⌉ + 2cps) ≈ 4n√K dots, vs n×K flat.
    *
    * `vecs` must carry exactly (c_id, c_v, c_n) ++ carry; `cents` exactly
    * (cent_id, t_v, t_n). Output: one row per input vector —
    * (c_id [, c_v, c_n when keepVec] [, carry…], cell [, sim when
    * withSim]); empty when `cents` is empty ([[cellStructure]] layers the
    * self-cell fallback on top). */
  private[graft] def hierAssign(vecs: DataFrame, cents: DataFrame,
      cells: Int, withSim: Boolean = false, keepVec: Boolean = true,
      carry: Seq[String] = Nil,
      flatMax: Int = FlatAssignMaxCells): DataFrame = {
    val held = Seq("c_v", "c_n") ++ carry
    val keep = (if (keepVec) Seq("c_v", "c_n") else Nil) ++ carry
    def anyVals(cols: Seq[String]) =
      cols.map(c => expr(s"any_value(`$c`)").as(c))
    // flat ladder rung (K ≤ flatMax ⇒ one super-group holds every
    // centroid): the degenerate route probes that single group, so the
    // two routing aggregations and their broadcast builds are no-op
    // stages — this branch IS the degenerate arithmetic with those
    // stages removed, one broadcast × one aggregation. The final filter
    // mirrors the hierarchy's inner group join: a vector with no
    // scorable centroid (null norm — impossible on real embeddings) is
    // dropped, not emitted with a null cell.
    if (cells <= flatMax) {
      val scored = vecs.crossJoin(broadcast(cents))
        .withColumn("__sim",
          round(vecDot(col("c_v"), col("t_v")) / expr("NULLIF(c_n * t_n, 0)"), 6))
      val aggs = anyVals(keep) ++
        Seq(expr("max_by(cent_id, struct(__sim, -cent_id))").as("cell")) ++
        (if (withSim) Seq(max(col("__sim")).as("sim")) else Nil)
      return scored.groupBy(col("c_id")).agg(aggs.head, aggs.tail: _*)
        .filter(col("cell").isNotNull)
    }
    val supersN = math.max(1, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val cps = math.max(1, math.ceil(cells.toDouble / supersN).toInt)
    val cs = cents.withColumn("__g", expr(s"cent_id DIV $cps"))
    val supers = cs.groupBy("__g")
      .agg(expr("min_by(struct(t_v, t_n), cent_id)").as("__s"))
      .select(col("__g").as("__sid"), col("__s.t_v").as("__sv"),
        col("__s.t_n").as("__sn"))
    def superSim = round(
      vecDot(col("c_v"), col("__sv")) / expr("NULLIF(c_n * __sn, 0)"), 6)
    val routed1 = vecs.crossJoin(broadcast(supers))
      .withColumn("__ssim", superSim)
      .groupBy(col("c_id"))
      .agg(expr("max_by(__sid, struct(__ssim, -__sid))").as("__g1"),
        anyVals(held): _*)
    // second routing pass: the winner's rows are DEMOTED (null sim sorts
    // below every real one in struct order) instead of filtered out, so
    // max_by yields the rank-2 group — or __g1 again when it is the only
    // group, which array_distinct collapses back to a single probe. A
    // vector with no scorable super (null c_n) keeps __g1 = null and is
    // dropped at the inner group join exactly as before.
    val routed = routed1.crossJoin(broadcast(supers))
      .withColumn("__ssim2",
        when(col("__sid") <=> col("__g1"), lit(null).cast("double"))
          .otherwise(superSim))
      .groupBy(col("c_id"))
      .agg(expr("max_by(__sid, struct(__ssim2, -__sid))").as("__g2"),
        (anyVals(held :+ "__g1")): _*)
      .withColumn("__gs", when(col("__g1").isNull, array(col("__g1")))
        .otherwise(array_distinct(array(col("__g1"), col("__g2")))))
    val probed = routed.select(
      col("c_id") +: explode(col("__gs")).as("__g") +: held.map(col): _*)
    val scored = probed.join(broadcast(cs), "__g")
      .withColumn("__sim",
        round(vecDot(col("c_v"), col("t_v")) / expr("NULLIF(c_n * t_n, 0)"), 6))
    val aggs = anyVals(keep) ++
      Seq(expr("max_by(cent_id, struct(__sim, -cent_id))").as("cell")) ++
      (if (withSim) Seq(max(col("__sim")).as("sim")) else Nil)
    scored.groupBy(col("c_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** DuckDB CTE chain replaying [[hierAssign]] over a prior CTE
    * `v(vec_id, v, nrm, …)` — ONE string shared by every IVF-family
    * oracle so the two-level arithmetic cannot drift between twins.
    * Emits `cells_t`, `hier_t` (cps = cells on the flat ladder rung
    * K ≤ [[FlatAssignMaxCells]] — one group, so the route degenerates to
    * the flat argmax exactly as the Spark fast path — else
    * ⌈cells / ⌈√cells⌉⌉), `cents`
    * (prefix-stable, + group id), `supers` (min-cent_id child per
    * group), `route` (stage-1 TOP-2 ranking — rank 2 by (sim DESC, sid
    * ASC) is exactly the demoted second max_by; one group → one row,
    * matching array_distinct) and `assign(vec_id, cell, sim)` (stage-2
    * argmax over both routed groups' children — groups are disjoint, so
    * the candidate union is duplicate-free). */
  private[graft] def hierAssignCtes: String =
    s"cells_t AS (SELECT LEAST($MaxIvfCells, GREATEST(1, " +
      s"CAST(CEIL(COUNT(*) * 1e0 / $IvfTargetCell) AS BIGINT))) AS cells FROM embeddings), " +
      s"hier_t AS (SELECT cells, CAST(CASE WHEN cells <= $FlatAssignMaxCells THEN cells " +
      "ELSE CEIL(cells * 1e0 / CEIL(SQRT(cells))) END AS BIGINT) AS cps FROM cells_t), " +
      "cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn, vec_id // cps AS g " +
      "FROM v, hier_t WHERE vec_id < cells), " +
      "supers AS (SELECT g AS sid, cv AS sv, cn AS sn FROM " +
      "(SELECT g, cv, cn, ROW_NUMBER() OVER (PARTITION BY g ORDER BY cent_id) AS srn FROM cents) s0 WHERE srn = 1), " +
      "route AS (SELECT vec_id, sid FROM (SELECT v.vec_id, s.sid, " +
      "ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY " +
      "ROUND(list_dot_product(v.v, s.sv) / NULLIF(v.nrm * s.sn, 0), 6) DESC, s.sid ASC) AS rrk " +
      "FROM v, supers s) r0 WHERE rrk <= 2), " +
      "assign AS (SELECT vec_id, cell, sim FROM (SELECT v.vec_id, c.cent_id AS cell, " +
      "ROUND(list_dot_product(v.v, c.cv) / NULLIF(v.nrm * c.cn, 0), 6) AS sim, " +
      "ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY " +
      "ROUND(list_dot_product(v.v, c.cv) / NULLIF(v.nrm * c.cn, 0), 6) DESC, c.cent_id ASC) AS ark " +
      "FROM v JOIN route r ON r.vec_id = v.vec_id JOIN cents c ON c.g = r.sid) a WHERE ark = 1)"

  /** IVF-style ANN: assign every vector to its nearest coarse centroid
    * via the TWO-LEVEL quantizer ([[hierAssign]]: route to one of ⌈√K⌉
    * super-cells, then argmax the top-2 groups' children — n×4√K dots, one
    * broadcast × one scan, at 100 TB still embarrassingly parallel), then
    * exact cosine top-k within the cell (nprobe = 1). The cell count is
    * data-adaptive ([[cellsForCorpus]] over one cheap parquet-footer count),
    * so the in-cell join stays linear as the corpus grows.
    *
    * Deviation from textbook IVF (documented): centroids are the vectors
    * with the K smallest vec_ids rather than k-means-trained — a
    * deterministic, PREFIX-STABLE choice both engines can replay (the
    * DuckDB oracle recomputes K from COUNT(*) with the same ceil/clamp
    * arithmetic, exactly as `ann_lsh`'s SQL recomputes its bit width), so
    * the query is hash-checked rather than recall-tested. For k-means-
    * trained centroids behind the same assignment/search plan see
    * [[kmeansIvfTopK]] (recall-tested, not oracle-checked). */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = TopK,
      maxCell: Long = MaxSearchBucket): DataFrame = {
    val nVecs = table(spark, dir, "embeddings").count()
    inCellTopK(cellAssignedVecs(spark, dir, nVecs), k, maxCell, sizeBound = nVecs)
  }

  /** The IVF index content: every vector tagged with its nearest-reachable
    * cell under the TWO-LEVEL quantizer ([[hierAssign]] — n×4√K dots, not
    * the flat n×K the round-15 decade probe measured at 41× CPU per 10×
    * vectors). Cached because the in-cell self-join consumes it on BOTH
    * sides and Spark plans no exchange reuse across them (plan-verified:
    * 6 scans, 0 ReusedExchange uncached); 1 row/vector (id, vector, norm,
    * cell), tiny next to the corpus. Similarities are rounded BEFORE each
    * argmax so Spark and DuckDB break ties identically (then by id). */
  private def cellAssignedVecs(spark: SparkSession, dir: String,
      nVecs: Long): DataFrame = {
    val emb = withNorm(table(spark, dir, "embeddings"), "c")
    val cells = cellsForCorpus(nVecs)
    val cents = withNorm(
      table(spark, dir, "embeddings").filter(col("vec_id") < cells), "t")
      .select(col("t_id").as("cent_id"), col("t_v"), col("t_n"))
    hierAssign(emb, cents, cells).cache()
  }

  /** Exact cosine top-k within each cell (nprobe = 1) over a
    * cell-assigned vector frame — the query-side stage, shared by
    * [[ivfTopK]], [[ivfTopKFromIndex]] and [[lloydIvfTopK]]. The
    * candidate side is bounded by [[MaxSearchBucket]] per cell (inert on
    * gate corpora); the query side keeps every vector. `sizeBound` is the
    * caller's vector count (one parquet-footer read it has already paid
    * for the cell-count arithmetic) so the guard's arming decision never
    * falls back to count()ing `cellVecs` — which would re-execute the
    * n×K assignment pipeline if a caller ever passed it uncached. */
  private def inCellTopK(cellVecs: DataFrame, k: Int,
      maxCell: Long = MaxSearchBucket, sizeBound: Long = -1L): DataFrame =
    cellVecs.as("q").join(capCandidates(cellVecs, "cell", "c_id", maxCell,
        sizeBound = sizeBound).as("c"),
        col("q.cell") === col("c.cell") && col("q.c_id") =!= col("c.c_id"))
      .withColumn("cosine",
        round(vecDot(col("q.c_v"), col("c.c_v")) / expr("NULLIF(q.c_n * c.c_n, 0)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q.c_id")).orderBy(col("cosine").desc, col("c.c_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q.c_id").as("query_id"), col("rk"), col("c.c_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")

  // ------------------------------------------ persisted IVF index artifact

  /** Build-once/query-many deployment shape (the neardup-cluster-artifact
    * pattern applied to ANN): the index — (vec_id, cell) assignments — is
    * written on ingest and every search joins the artifact instead of
    * re-paying the n×K assignment scan per query. At 100 TB the
    * assignment is the dominant cost and rebuilding it per search is the
    * anti-pattern; the artifact is one slim row per vector. Vectors and
    * norms are NOT duplicated into the artifact — the query side re-reads
    * them from the source table (columnar scan) and joins on vec_id, so
    * the index stays small and never goes stale on vector payloads. */
  def writeIvfIndex(spark: SparkSession, dir: String, path: String): Unit =
    cellAssignedVecs(spark, dir, table(spark, dir, "embeddings").count())
      .select(col("c_id").as("vec_id"), col("cell"))
      .write.mode("overwrite").parquet(path)

  /** [[ivfTopK]] served from the persisted index: identical output frame
    * (spec-pinned equality) — only the assignment stage is replaced by an
    * artifact read + join.
    *
    * Cache lifecycle (r12 ADVICE): the in-cell search consumes the joined
    * frame on both sides, so it is cached per call — a build-once/
    * query-many SERVICE issuing repeated searches must pass a
    * [[graft.drift.CacheScope]] and `release()` it once each search's
    * results are materialized, or the per-call caches accumulate for the
    * session. The unscoped default matches Verify/Bench, which clear the
    * whole cache between queries. */
  def ivfTopKFromIndex(spark: SparkSession, dir: String, path: String,
      k: Int = TopK, scope: Option[graft.drift.CacheScope] = None): DataFrame = {
    val emb = withNorm(table(spark, dir, "embeddings"), "c")
    val joined = emb.join(spark.read.parquet(path),
      col("c_id") === col("vec_id")).drop("vec_id")
    val cellVecs = scope.fold(joined.cache())(_.cached(joined))
    // sizeBound = one parquet-footer count of the source table (1 row per
    // vector in cellVecs) — the guard must never count() the joined frame
    inCellTopK(cellVecs, k,
      sizeBound = table(spark, dir, "embeddings").count())
  }

  /** DuckDB mirror of [[ivfTopK]]: K is data-adaptive, so the SQL recomputes
    * it from COUNT(*) with the same ceil/clamp arithmetic, takes the
    * prefix-stable vec_id < K centroid set, and replays the TWO-LEVEL
    * assignment via the shared [[hierAssignCtes]] chain. */
  def ivfTopKSql(k: Int = TopK): String =
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
      hierAssignCtes + ", " +
      "cv AS (SELECT v.*, a.cell FROM v JOIN assign a ON a.vec_id = v.vec_id), " +
      "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "ROUND(list_dot_product(q.v, c.v) / NULLIF(q.nrm * c.nrm, 0), 6) AS cosine " +
      "FROM cv q JOIN cv c ON q.cell = c.cell AND q.vec_id <> c.vec_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM scored) " +
      s"SELECT query_id, rk, neighbor_id, cosine FROM ranked WHERE rk <= $k ORDER BY query_id, rk"

  // ------------------------------------- trained-centroid IVF (quality path)

  /** Rows to sample for the k-means fit: the coarse quantizer trains on a
    * bounded sample (standard IVF practice — FAISS trains on ~256 vectors
    * per centroid), so the fit never scans a 100 TB corpus. */
  val KmeansTrainRows = 100000

  /** [[ivfTopK]] with k-means-TRAINED centroids behind the exact same
    * assignment + in-cell-search plan — the production-quality quantizer
    * (balanced cells instead of whatever the first K vectors happen to
    * partition). Differences from the oracle-checked variant, by design:
    * trained centroids aren't replayable as DuckDB SQL, so this query is
    * recall-tested in PipelineSpec instead of hash-checked; assignment uses
    * the model's euclidean `prediction` (textbook IVF) rather than the
    * cosine argmax. Cell count stays data-adaptive via [[cellsForCorpus]]
    * (clamped ≥ 2 — the ml KMeans param requires k > 1), and the fit reads
    * a ≤[[KmeansTrainRows]]-row sample, so at scale training is O(sample)
    * and assignment is one model broadcast × one scan. */
  def kmeansIvfTopK(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = table(spark, dir, "embeddings")
    val n = emb.count()
    val cells = math.max(2, cellsForCorpus(n))
    val vecs = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val trainFrac = math.min(1.0, KmeansTrainRows.toDouble / math.max(1L, n))
    val model = new KMeans().setK(cells).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(if (trainFrac < 1.0) vecs.sample(trainFrac, 42L) else vecs)
    // cached for the same both-sides-of-the-self-join reason as ivfTopK
    val assigned = model.transform(vecs)
      .select(col("vec_id"), col("v"), col("cell"))
      .withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
      .cache()
    assigned.as("q").join(
        capCandidates(assigned, "cell", "vec_id", MaxSearchBucket,
          sizeBound = n).as("c"),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cosine",
        round(vecDot(col("q.v"), col("c.v")) / expr("NULLIF(q.nrm * c.nrm, 0)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q.vec_id")).orderBy(col("cosine").desc, col("c.vec_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q.vec_id").as("query_id"), col("rk"), col("c.vec_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  // ------------------------------- deterministic Lloyd IVF (gated quantizer)

  /** Lloyd iterations for [[lloydIvfTopK]]. Two refinement passes capture
    * most of the balance win over the prefix init (classic k-means
    * converges fastest in its first steps); each extra pass is one more
    * corpus scan, and the DuckDB twin unrolls the same count. */
  val LloydIters = 2

  /** [[ivfTopK]] with centroids refined by [[LloydIters]] deterministic
    * Lloyd passes — the trained-quantizer quality of [[kmeansIvfTopK]]
    * with the bit-for-bit replayability of [[ivfTopK]], closing the gap
    * between them: reproducible clustering is a real feature for a
    * training-data pipeline (an index rebuilt from the same corpus must
    * assign identically or incremental artifacts churn).
    *
    * Determinism recipe — every arithmetic step is exact or identically
    * rounded in both engines:
    *   - vectors are snapped to integer MICRO-UNITS (`ROUND(x·1e6, 0)`,
    *     half-away-from-zero in both engines) held as doubles: components
    *     ≤1e6, so 64-dim dots ≤6.4e13 < 2⁵³ — ALL sums/products stay
    *     exactly representable and order-independent across Spark's
    *     partial aggregation;
    *   - assignment is the rounded-cosine argmax (6 dp, then cent_id
    *     tie-break) both engines already replay in `ann_ivf`;
    *   - the centroid update is `FLOOR(SUM(x)/COUNT(x))` per dimension —
    *     exact while a cell holds <~1e10 members (sum <2⁵³), far beyond
    *     the ~[[IvfTargetCell]] design load — so refined centroids remain
    *     integer micro-vectors; a cell that loses all members keeps its
    *     previous centroid (LEFT JOIN + COALESCE, both engines).
    * Final in-cell search is the exact rounded-cosine top-k on the RAW
    * double vectors, same as `ann_ivf`.
    *
    * Scale shape per iteration: one n×K broadcast assignment scan (same
    * as [[ivfTopK]]) + one posexplode reduced map-side to cells×[[Dim]]
    * rows — no vector ever meets another vector until the final bounded
    * in-cell join. The centroid frame (≤[[MaxIvfCells]]×[[Dim]]) never
    * collects to the driver. */
  def lloydIvfTopK(spark: SparkSession, dir: String, k: Int = TopK,
      iters: Int = LloydIters,
      scope: Option[graft.drift.CacheScope] = None): DataFrame = {
    // cache lifecycle (the ivfTopKFromIndex discipline): a build-once/
    // query-many service must pass a CacheScope and release() it, or the
    // per-call caches (v2 + per-iteration centroids + cellVecs)
    // accumulate; the unscoped default matches Verify/Bench, which clear
    // the whole cache between queries
    def cachedF(df: DataFrame): DataFrame = scope.fold(df.cache())(_.cached(df))
    val nVecs = table(spark, dir, "embeddings").count()
    val cells = cellsForCorpus(nVecs)
    // micro-unit frame: scanned by every assignment pass and the mean
    // update, so cached once
    val v2 = cachedF(table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("vm", expr("transform(v, x -> ROUND(x * 1e6, 0))"))
      .withColumn("nrm", sqrt(vecDot(col("v"), col("v"))))
      .withColumn("nm", sqrt(vecDot(col("vm"), col("vm")))))
    // two-level assignment per pass (hierAssign): groups are cent_id
    // ranges fixed by `cells`, supers are each group's min-id REFINED
    // centroid — so the routing tracks the refinement while both engines
    // replay the same integer-group arithmetic.
    //
    // r16: the payload rides THROUGH the assignment (hierAssign's
    // keepVec/carry any_value buffers) instead of a join-back on vec_id —
    // the old `v2.join(argmaxCell(...), "vec_id")` re-attached vm (and v,
    // nrm for the final pass) through a stats-blind sort-merge join per
    // pass (3 SMJs: 2 exchanges + sorts each, on a unique-key join that
    // is semantically a pass-through). Same rows, same values — only the
    // attachment plan changed (gate A/B: ann_kmeans 5.7 → see
    // OPTIMIZATION_r16.md).
    def assigned(cents: DataFrame, carry: Seq[String]): DataFrame =
      hierAssign(
        v2.select((Seq(col("vec_id").as("c_id"), col("vm").as("c_v"),
          col("nm").as("c_n")) ++ carry.map(col)): _*),
        cents.select(col("cent_id"), col("cm").as("t_v"), col("cn").as("t_n")),
        cells, keepVec = carry.isEmpty, carry = carry)
    var cents = v2.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cent_id"), col("vm").as("cm"), col("nm").as("cn"))
    for (_ <- 1 to iters) {
      // the mean update consumes the assignment's carried micro-vector
      // directly: (cell, c_v) IS (cell, vm)
      val means = lloydMeanUpdate(
        assigned(cents, Nil).select(col("cell"), col("c_v").as("vm")))
      // cached: iteration i+1's broadcast (and the final assignment) embed
      // this frame as a subtree — uncached, each level would re-run every
      // earlier pass, turning t iterations into O(t²) corpus scans. Forced
      // eagerly (K-row count) so the next pass's broadcast-build jobs and
      // main stages read a warm cache instead of stampeding a cold one.
      cents = cachedF(cents.join(means, cents("cent_id") === means("cell"), "left")
        .select(col("cent_id"), coalesce(col("cm1"), col("cm")).as("cm"))
        .withColumn("cn", sqrt(vecDot(col("cm"), col("cm")))))
      cents.count(): Unit
    }
    // final pass: raw v + nrm ride through the assignment as carry
    // columns — the in-cell search scores RAW doubles, same as ann_ivf
    val cellVecs = cachedF(assigned(cents, Seq("v", "nrm"))
      .select(col("c_id"), col("v").as("c_v"), col("nrm").as("c_n"), col("cell")))
    inCellTopK(cellVecs, k, sizeBound = nVecs)
  }

  /** One Lloyd centroid mean update over a (cell, vm)-assigned micro-unit
    * frame: posexplode → per-(cell, pos) FLOOR(SUM/COUNT) → re-listify.
    * The SUM/COUNT partial-aggregates before the exchange (plan-pinned in
    * PlanAuditSpec), so the shuffle carries cells×[[Dim]] partials, never
    * the n×[[Dim]] exploded rows. */
  private[graft] def lloydMeanUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("vm")).as(Seq("pos", "x")))
      .groupBy("cell", "pos")
      .agg(expr("CAST(FLOOR(SUM(x) / COUNT(x)) AS DOUBLE)").as("m"))
      .groupBy("cell")
      .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("cm1"))

  /** DuckDB twin of [[lloydIvfTopK]]: the [[LloydIters]] passes unrolled
    * as chained CTEs over the same micro-unit arithmetic. */
  def lloydIvfTopKSql(k: Int = TopK): String = {
    // two-level assignment per pass (the hierAssignCtes shape over the
    // PER-ITERATION refined centroid CTE): supers = min-cent_id child of
    // each cent_id DIV cps group, route to the TOP-2 supers, argmax over
    // both routed groups' children
    def assign(name: String, cents: String): String =
      s"${name}_s AS (SELECT g AS sid, cm AS sv, cn AS sn FROM " +
        s"(SELECT cent_id // cps AS g, cm, cn, " +
        "ROW_NUMBER() OVER (PARTITION BY cent_id // cps ORDER BY cent_id) AS srn " +
        s"FROM $cents, hier_t) s0 WHERE srn = 1), " +
        s"${name}_r AS (SELECT vec_id, sid FROM (SELECT v2.vec_id, s.sid, " +
        "ROW_NUMBER() OVER (PARTITION BY v2.vec_id ORDER BY " +
        "ROUND(list_dot_product(v2.vm, s.sv) / NULLIF(v2.nm * s.sn, 0), 6) DESC, " +
        s"s.sid ASC) AS rrk FROM v2, ${name}_s s) r0 WHERE rrk <= 2), " +
        s"$name AS (SELECT vec_id, cell FROM (SELECT v2.vec_id, c.cent_id AS cell, " +
        "ROW_NUMBER() OVER (PARTITION BY v2.vec_id ORDER BY " +
        "ROUND(list_dot_product(v2.vm, c.cm) / NULLIF(v2.nm * c.cn, 0), 6) DESC, " +
        s"c.cent_id ASC) AS ark FROM v2 JOIN ${name}_r r ON r.vec_id = v2.vec_id " +
        s"JOIN (SELECT $cents.*, cent_id // cps AS g FROM $cents, hier_t) c " +
        "ON c.g = r.sid) t WHERE ark = 1)"
    def refine(i: Int, prevAssign: String, prevCents: String): String =
      s"m$i AS (SELECT cell, FLOOR(SUM(x) / COUNT(x)) AS m, pos FROM " +
        s"(SELECT cell, unnest(vm) AS x, unnest(range(1, len(vm) + 1)) AS pos " +
        s"FROM v2 JOIN $prevAssign USING (vec_id)) lf GROUP BY cell, pos), " +
        s"c$i AS (SELECT $prevCents.cent_id, COALESCE(g.cmn, $prevCents.cm) AS cm, " +
        s"sqrt(list_dot_product(COALESCE(g.cmn, $prevCents.cm), COALESCE(g.cmn, $prevCents.cm))) AS cn " +
        s"FROM $prevCents LEFT JOIN (SELECT cell, list(m ORDER BY pos) AS cmn " +
        s"FROM m$i GROUP BY cell) g ON g.cell = $prevCents.cent_id)"
    val passes = (1 to LloydIters).map(i =>
      assign(s"a$i", s"c${i - 1}") + ", " + refine(i, s"a$i", s"c${i - 1}"))
      .mkString(", ")
    "WITH v2 AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm, " +
      "list_transform(embedding::DOUBLE[], x -> ROUND(x * 1e6, 0)) AS vm, " +
      "sqrt(list_dot_product(list_transform(embedding::DOUBLE[], x -> ROUND(x * 1e6, 0)), " +
      "list_transform(embedding::DOUBLE[], x -> ROUND(x * 1e6, 0)))) AS nm FROM embeddings), " +
      s"cells_t AS (SELECT LEAST($MaxIvfCells, GREATEST(1, " +
      s"CAST(CEIL(COUNT(*) * 1e0 / $IvfTargetCell) AS BIGINT))) AS cells FROM embeddings), " +
      s"hier_t AS (SELECT cells, CAST(CASE WHEN cells <= $FlatAssignMaxCells THEN cells " +
      "ELSE CEIL(cells * 1e0 / CEIL(SQRT(cells))) END AS BIGINT) AS cps FROM cells_t), " +
      "c0 AS (SELECT vec_id AS cent_id, vm AS cm, nm AS cn FROM v2, cells_t WHERE vec_id < cells), " +
      passes + ", " +
      // the SEARCH partition is the assignment under the FINAL refined
      // centroids (one more pass than the last refine consumed — a$i only
      // feeds c$i's mean update)
      assign(s"a${LloydIters + 1}", s"c$LloydIters") + ", " +
      s"cv AS (SELECT v2.vec_id, v2.v, v2.nrm, a${LloydIters + 1}.cell FROM v2 JOIN a${LloydIters + 1} USING (vec_id)), " +
      "scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, " +
      "ROUND(list_dot_product(q.v, c.v) / NULLIF(q.nrm * c.nrm, 0), 6) AS cosine " +
      "FROM cv q JOIN cv c ON q.cell = c.cell AND q.vec_id <> c.vec_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id " +
      "ORDER BY cosine DESC, neighbor_id ASC) AS rk FROM scored) " +
      s"SELECT query_id, rk, neighbor_id, cosine FROM ranked WHERE rk <= $k ORDER BY query_id, rk"
  }

  // ----------------------------------------------------------------- API

  // --------------------------------------------- embedding-space monitor

  /** Per-label embedding-space health — the monitoring view an
    * embedding-producing pipeline tracks release-over-release: each
    * label's centroid norm, COHESION (mean cosine of members to their own
    * centroid — collapse shows up as cohesion → 1, noise as → 0) and
    * SEPARATION (cosine of the label centroid to the global centroid —
    * labels drifting into the global mean lose separation, i.e. → 1).
    *
    * Scale shape: centroids come from ONE posexplode + (label, pos)
    * aggregation — map-side combined, output = labels × dim rows. Member
    * cosines re-explode the corpus but join ONLY the broadcast
    * (labels × dim) centroid frame and reduce straight back to one row
    * per vector — no vector ever meets another vector. */
  def embeddingCohesion(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    val long = emb.select(col("vec_id"), col("label"), posexplode(col("v")).as(Seq("pos", "x")))
    val cent = long.groupBy("label", "pos").agg(avg("x").as("c")).cache()
    val centNorm = cent.groupBy("label").agg(expr("sqrt(SUM(c * c))").as("cnorm"))
    val global = cent.groupBy("pos").agg(avg("c").as("g"))
    val sep = cent.join(broadcast(global), "pos")
      .groupBy("label").agg(expr("SUM(c * g)").as("cg"),
        expr("sqrt(SUM(c * c))").as("cn"))
      .crossJoin(broadcast(global.agg(expr("sqrt(SUM(g * g))").as("gn"))))
      .selectExpr("label", "ROUND(cg / NULLIF(cn * gn, 0), 6) AS separation")
    val member = long.join(broadcast(cent), Seq("label", "pos"))
      .groupBy("vec_id", "label").agg(
        expr("SUM(x * c)").as("vc"),
        expr("sqrt(SUM(x * x))").as("vn"))
      .join(broadcast(centNorm), "label")
      .selectExpr("label", "vc / NULLIF(vn * cnorm, 0) AS cos_c")
      .groupBy("label").agg(count(lit(1)).as("n_vecs"),
        expr("ROUND(AVG(cos_c), 6)").as("cohesion"))
    member.join(centNorm, "label").join(sep, "label")
      .selectExpr("label", "n_vecs", "ROUND(cnorm, 6) AS centroid_norm",
        "cohesion", "separation")
      .orderBy("label")
  }

  /** DuckDB twin: the longform explode is two PARALLEL unnests (values +
    * 1-based positions), which DuckDB zips. */
  def embeddingCohesionSql: String =
    "WITH lf AS (SELECT vec_id, label, unnest(range(1, len(embedding) + 1)) AS pos, " +
      "unnest(embedding::DOUBLE[]) AS x FROM embeddings), " +
      "cent AS (SELECT label, pos, AVG(x) AS c FROM lf GROUP BY 1, 2), " +
      "cn AS (SELECT label, sqrt(SUM(c * c)) AS cnorm FROM cent GROUP BY 1), " +
      "g AS (SELECT pos, AVG(c) AS g FROM cent GROUP BY 1), " +
      "gn AS (SELECT sqrt(SUM(g * g)) AS gn FROM g), " +
      "sep AS (SELECT label, ROUND(SUM(c * g.g) / NULLIF(sqrt(SUM(c * c)) * ANY_VALUE(gn.gn), 0), 6) AS separation " +
      "FROM cent JOIN g ON cent.pos = g.pos CROSS JOIN gn GROUP BY label), " +
      "mem AS (SELECT vec_id, lf.label, SUM(x * c) AS vc, sqrt(SUM(x * x)) AS vn " +
      "FROM lf JOIN cent ON lf.label = cent.label AND lf.pos = cent.pos GROUP BY 1, 2), " +
      "coh AS (SELECT mem.label, COUNT(*) AS n_vecs, " +
      "ROUND(AVG(vc / NULLIF(vn * cnorm, 0)), 6) AS cohesion " +
      "FROM mem JOIN cn ON mem.label = cn.label GROUP BY 1) " +
      "SELECT coh.label, n_vecs, ROUND(cnorm, 6) AS centroid_norm, cohesion, separation " +
      "FROM coh JOIN cn ON coh.label = cn.label JOIN sep ON coh.label = sep.label " +
      "ORDER BY coh.label"

  // ------------------------------------------------ corpus topic clustering

  /** Per-cell corpus profile over the IVF coarse quantizer — the
    * topic-clustering view of the corpus (reference has no clustering
    * surface at all; this is the monitoring artifact a training-data
    * curator reads to see what the corpus is MADE of): every vector is
    * assigned to its nearest coarse centroid exactly as [[ivfTopK]]
    * assigns it, then each cell reports its size, COHESION (mean cosine
    * of members to the cell centroid — a diffuse junk cell scores low, a
    * near-duplicate clump scores ≈1) and the dominant ground-truth label
    * with its PURITY share (how well unsupervised cells recover labels).
    *
    * Scale shape: one broadcast of K centroids × one corpus scan for the
    * assignment (embarrassingly parallel, no shuffle on raw vectors), then
    * every downstream frame is cell- or (cell,label)-cardinality — at
    * 100 TB the only corpus-sized pass is the scan. Centroids are the
    * prefix-stable `vec_id < K` set ([[ivfTopK]]'s documented deviation)
    * so the DuckDB twin replays the identical assignment; for k-means-
    * trained centroids swap in [[kmeansIvfTopK]]'s model upstream of the
    * same profile aggregation. */
  def clusterProfile(spark: SparkSession, dir: String): DataFrame = {
    // label rides along from the scan so no corpus-sized join is ever
    // needed to recover it (the assignment projection is the one
    // corpus-sized pass)
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id").as("c_id"), col("label"),
        col("embedding").cast("array<double>").as("c_v"))
      .withColumn("c_n", sqrt(vecDot(col("c_v"), col("c_v"))))
    val cells = cellsForCorpus(table(spark, dir, "embeddings").count())
    val cents = withNorm(
      table(spark, dir, "embeddings").filter(col("vec_id") < cells), "t")
      .select(col("t_id").as("cent_id"), col("t_v"), col("t_n"))
    // two-level assignment (hierAssign) — sims rounded BEFORE each argmax
    // so both engines break ties identically; label rides the carry so no
    // corpus-sized join recovers it
    val labeled = hierAssign(emb, cents, cells,
        withSim = true, keepVec = false, carry = Seq("label"))
      .select(col("c_id").as("vec_id"), col("cell"), col("sim"), col("label"))
    val cellAgg = labeled.groupBy("cell").agg(
      count(lit(1)).as("n_vecs"),
      round(avg("sim"), 6).as("cohesion"))
    val topLabel = labeled.groupBy("cell", "label").agg(count(lit(1)).as("n"))
      .withColumn("lrk", row_number().over(
        Window.partitionBy("cell").orderBy(col("n").desc, col("label").asc)))
      .filter(col("lrk") === 1)
      .select(col("cell"), col("label").as("top_label"), col("n").as("top_n"))
    // both sides are cell-cardinality (≤ MaxIvfCells rows); broadcasting
    // one keeps the post-agg stage free of shuffle joins
    cellAgg.join(broadcast(topLabel), "cell")
      .select(col("cell"), col("n_vecs"), col("cohesion"), col("top_label"),
        round(col("top_n") * lit(1.0) / col("n_vecs"), 6).as("purity"))
      .orderBy("cell")
  }

  /** DuckDB mirror of [[clusterProfile]] — same data-adaptive K arithmetic
    * and prefix-stable centroid set as [[ivfTopKSql]]. */
  def clusterProfileSql: String =
    "WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
      hierAssignCtes + ", " +
      "lassign AS (SELECT a.vec_id, v.label, a.cell, a.sim FROM assign a JOIN v ON v.vec_id = a.vec_id), " +
      "ca AS (SELECT cell, COUNT(*) AS n_vecs, ROUND(AVG(sim), 6) AS cohesion FROM lassign GROUP BY 1), " +
      "lc AS (SELECT cell, label AS top_label, n AS top_n FROM (SELECT cell, label, COUNT(*) AS n, " +
      "ROW_NUMBER() OVER (PARTITION BY cell ORDER BY COUNT(*) DESC, label ASC) AS lrk " +
      "FROM lassign GROUP BY cell, label) x WHERE lrk = 1) " +
      "SELECT ca.cell, ca.n_vecs, ca.cohesion, lc.top_label, " +
      "ROUND(lc.top_n * 1e0 / ca.n_vecs, 6) AS purity " +
      "FROM ca JOIN lc ON ca.cell = lc.cell ORDER BY ca.cell"

  // ------------------------------------------- product quantization (PQ)

  /** PQ geometry: 64 dims → [[PqSubspaces]] subvectors of [[PqSubDim]],
    * [[PqCodes]] codes per subspace → an 8-byte code per vector (32×
    * compression of a float32 embedding). */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCodes = 16

  /** Product-quantization profile — the artifact that says whether a
    * PQ-compressed index can stand in for raw vectors at 100 TB (a
    * trillion float32 embeddings are ~0.25 PB; their PQ codes are ~8 TB
    * and fit an index tier): per subspace, the code-usage census and the
    * mean squared reconstruction error of assigning every vector to its
    * nearest codebook entry.
    *
    * Codebooks are the subvectors of the prefix-stable `vec_id <
    * [[PqCodes]]` set ([[ivfTopK]]'s documented deviation — k-means-
    * trained codebooks drop into the same assignment expression), so the
    * DuckDB twin replays the identical quantization. Scale shape: ONE
    * scan → n×[[PqSubspaces]] stacked subvector rows; the argmin runs as
    * an array higher-order fold against an 8-row broadcast codebook —
    * projection-only, no per-candidate explode, no shuffle before the
    * subspace-sized final agg. Distances are rounded before the argmin
    * so both engines break code ties identically (first = lowest code). */
  def pqProfile(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val stackArgs = (0 until PqSubspaces)
      .map(m => s"${m}L, slice(v, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val subs = emb.selectExpr("vec_id", s"stack($PqSubspaces, $stackArgs) AS (m, sv)")
    val cb = subs.filter(col("vec_id") < PqCodes)
      .groupBy("m").agg(expr(
        "transform(array_sort(collect_list(struct(vec_id, sv))), p -> p.sv)").as("cbs"))
    subs.join(broadcast(cb), "m")
      .withColumn("dists", expr(
        "transform(cbs, c -> round(aggregate(zip_with(sv, c, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x), 6))"))
      .withColumn("best", expr("array_min(dists)"))
      .withColumn("code", expr("array_position(dists, best) - 1"))
      .groupBy("m").agg(
        count(lit(1)).as("n_vecs"),
        countDistinct("code").as("codes_used"),
        round(avg("best"), 6).as("mse"))
      .orderBy("m")
  }

  def pqProfileSql: String =
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"subs AS (SELECT vec_id, m, v[(m * $PqSubDim + 1):(m * $PqSubDim + $PqSubDim)] AS sv " +
      s"FROM v CROSS JOIN (SELECT unnest(range(0, $PqSubspaces)) AS m) ms), " +
      s"cb AS (SELECT m, list(sv ORDER BY vec_id) AS cbs FROM subs WHERE vec_id < $PqCodes GROUP BY 1), " +
      "a AS (SELECT s.vec_id, s.m, list_transform(cbs, c -> " +
      s"ROUND(list_sum(list_transform(range(1, ${PqSubDim + 1}), i -> " +
      "(s.sv[i] - c[i]) * (s.sv[i] - c[i]))), 6)) AS dists FROM subs s JOIN cb USING (m)), " +
      "b AS (SELECT vec_id, m, list_min(dists) AS best, " +
      "list_position(dists, list_min(dists)) - 1 AS code FROM a) " +
      "SELECT m, COUNT(*)::BIGINT AS n_vecs, COUNT(DISTINCT code)::BIGINT AS codes_used, " +
      "ROUND(AVG(best), 6) AS mse FROM b GROUP BY 1 ORDER BY 1"

  /** Raw vectors + PQ-reconstructed corpus for the ADC searches:
    * `(emb, encoded)` with emb = (vec_id, v) and encoded = (c_id,
    * recon). Shared by [[pqAnnTopK]] and [[pqAnnRerank]].
    *
    * `eager` materializes the cached distance table BEFORE returning —
    * required when SEVERAL consumers of the frame execute inside one
    * action ([[annQuality]]'s union of tiers): Spark submits their
    * independent stages concurrently, and concurrent first-touch of an
    * unmaterialized cache stampedes it (each stage computes the block,
    * all but the first land on "already exists, not re-adding" discards
    * — measured +5 s CPU on the ann_quality row when the r14 sharing
    * refactor first landed without this). A single-consumer caller
    * (pq_ann, pq_ann_rerank, ann_ivfpq standalone) skips the eager pass. */
  private def pqEncodedFrame(spark: SparkSession, dir: String,
      eager: Boolean = false): (DataFrame, DataFrame) = {
    val M = PqSubspaces
    val emb = table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val stackArgs = (0 until M)
      .map(m => s"${m}L, slice(v, ${m * PqSubDim + 1}, $PqSubDim)").mkString(", ")
    val subs = emb.selectExpr("vec_id", s"stack($M, $stackArgs) AS (m, sv)")
    // one row: cb[m][k] = k-th codebook subvector of subspace m (1-based)
    val cbAll = subs.filter(col("vec_id") < PqCodes)
      .groupBy("m").agg(expr(
        "transform(array_sort(collect_list(struct(vec_id, sv))), p -> p.sv)").as("cbs"))
      .groupBy().agg(expr(
        "transform(array_sort(collect_list(struct(m, cbs))), p -> p.cbs)").as("cb"))
    // per-subspace rounded distances to the 16 codes; argmin is 1-based.
    // The 8×16 distance table is materialized through a cache barrier:
    // without it CollapseProject inlines this expression into codes and
    // codes again into recon, re-evaluating the table up to 4× per row
    // (measured 10 s → ~1 s at sf0.1; the argmin/lookup pass downstream
    // touches only the materialized array)
    val distsAll = emb.crossJoin(broadcast(cbAll))
      .withColumn("dists", expr(
        s"transform(sequence(0, ${M - 1}), m -> " +
          s"transform(element_at(cb, m + 1), c -> round(aggregate(" +
          s"zip_with(slice(v, m * $PqSubDim + 1, $PqSubDim), c, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x), 6)))"))
      .select(col("vec_id"), col("dists")).cache()
    if (eager) distsAll.count(): Unit
    val encoded = distsAll.crossJoin(broadcast(cbAll))
      .withColumn("codes", expr(
        s"transform(sequence(0, ${M - 1}), m -> " +
          "CAST(array_position(element_at(dists, m + 1), " +
          "array_min(element_at(dists, m + 1))) AS INT))"))
      .withColumn("recon", expr(
        s"flatten(transform(sequence(0, ${M - 1}), m -> " +
          "element_at(element_at(cb, m + 1), element_at(codes, m + 1))))"))
      .select(col("vec_id").as("c_id"), col("recon"))
    (emb, encoded)
  }

  /** ADC (asymmetric distance computation) top-k over the PQ codes — the
    * search path that makes [[pqProfile]]'s compressed index tier
    * actually queryable: the corpus lives as 8-byte codes, queries stay
    * full-precision, and each candidate's distance is computed against
    * its RECONSTRUCTION (the concatenation of its code centroids). The
    * textbook memory/recall trade: ~32× less state than raw vectors at
    * the price of quantization error (the approximate distances are
    * oracle-replayed exactly since the codebooks are prefix-stable).
    * Recall is spec-pinned on planted cluster structure; on UNSTRUCTURED
    * gaussian data (the synthetic testdata) ADC recall is honestly weak
    * (~0.16@5 here) because all neighbors are near-equidistant and the
    * quantization noise swamps the gaps — the regime where a real
    * deployment raises PqCodes / trains k-means codebooks or re-ranks
    * an ADC shortlist against raw vectors.
    *
    * Scale shape: encode = one scan × one 1-row codebook broadcast,
    * all in-row array folds (codes, reconstruction); search = the
    * query set broadcast against the encoded corpus, distance in-row,
    * then one top-k window per query — identical plan skeleton to
    * [[annCosine]], with the corpus side carrying 64 reconstructed
    * doubles instead of raw vectors (a production index materializes
    * the codes once and reconstructs lazily per probe). Distances are
    * rounded before the argmin/rank so both engines tie-break
    * identically. */
  def pqAnnTopK(spark: SparkSession, dir: String, k: Int = TopK): DataFrame = {
    val (emb, encoded) = pqEncodedFrame(spark, dir)
    pqAnnTopKFrom(emb, encoded, k)
  }

  /** [[pqAnnTopK]] over a precomputed [[pqEncodedFrame]] — lets
    * [[annQuality]] encode the corpus ONCE for its three PQ-family tiers
    * instead of three times (round-13 verdict item 6: the eval harness was
    * the bench's most expensive row largely on re-derived index frames). */
  private def pqAnnTopKFrom(emb: DataFrame, encoded: DataFrame,
      k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    encoded.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("approx_dist", expr(
        "round(aggregate(zip_with(q_v, recon, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x), 6)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("approx_dist").asc, col("c_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q_id").as("query_id"), col("rk"), col("c_id").as("neighbor_id"),
        col("approx_dist"))
      .orderBy("query_id", "rk")
  }

  /** ADC shortlist size for [[pqAnnRerank]] — raw vectors are touched
    * for only this many candidates per query. */
  val PqShortlist = 50

  /** Two-stage PQ retrieval — the production escalation [[pqAnnTopK]]'s
    * scaladoc prescribes for its weak-recall regime: stage 1 ranks the
    * WHOLE corpus by approximate (ADC) distance over the 8-byte codes
    * and keeps a [[PqShortlist]]-deep shortlist; stage 2 re-ranks ONLY
    * the shortlist by exact cosine against raw vectors. The index tier
    * (codes, ~32× smaller) absorbs the corpus scan; the expensive raw
    * vectors are fetched for shortlist × queries rows — the standard
    * memory/recall trade of FAISS-style deployments.
    *
    * Fully oracle-checkable (unlike most re-rank stacks): the shortlist
    * is deterministic — rounded ADC distances, c_id tiebreak — and
    * stage 2 is exact arithmetic, so DuckDB replays both stages from
    * the same prefix-stable codebooks. When the shortlist covers the
    * whole corpus the result equals [[annCosine]] exactly (spec-pinned
    * on the fixture). */
  def pqAnnRerank(spark: SparkSession, dir: String, k: Int = TopK,
      shortlist: Int = PqShortlist): DataFrame = {
    val (emb, encoded) = pqEncodedFrame(spark, dir)
    pqAnnRerankFrom(emb, encoded, k, shortlist)
  }

  /** [[pqAnnRerank]] over a precomputed [[pqEncodedFrame]] (see
    * [[pqAnnTopKFrom]]). */
  private def pqAnnRerankFrom(emb: DataFrame, encoded: DataFrame,
      k: Int, shortlist: Int): DataFrame = {
    val q = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("q_v"))
    val short = encoded.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("approx_dist", expr(
        "round(aggregate(zip_with(q_v, recon, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x), 6)"))
      .withColumn("srk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("approx_dist").asc, col("c_id").asc)))
      .filter(col("srk") <= shortlist)
      .select("q_id", "c_id")
    short
      .join(emb.select(col("vec_id").as("c_id"), col("v").as("c_v")), "c_id")
      .join(broadcast(q), "q_id")
      .withColumn("cosine", round(
        vecDot(col("q_v"), col("c_v")) /
          expr("NULLIF(sqrt(aggregate(zip_with(q_v, q_v, (x, y) -> x * y), 0D, (a, x) -> a + x)) * " +
            "sqrt(aggregate(zip_with(c_v, c_v, (x, y) -> x * y), 0D, (a, x) -> a + x)), 0)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q_id").as("query_id"), col("rk"), col("c_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  /** Shared ADC CTE chain (raw vectors → codebooks → reconstructions →
    * approx-distance ranking) for [[pqAnnTopKSql]] / [[pqAnnRerankSql]]. */
  private def pqAdcCtes: String = {
    val M = PqSubspaces
    def distsExpr(vec: String, m: String) =
      s"list_transform(cb[$m + 1], c -> ROUND(list_sum(list_transform(" +
        s"range(1, ${PqSubDim + 1}), i -> ($vec[$m * $PqSubDim + i] - c[i]) * " +
        s"($vec[$m * $PqSubDim + i] - c[i]))), 6))"
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"subs AS (SELECT vec_id, m, v[(m * $PqSubDim + 1):(m * $PqSubDim + $PqSubDim)] AS sv " +
      s"FROM v CROSS JOIN (SELECT unnest(range(0, $M)) AS m) ms), " +
      s"cbm AS (SELECT m, list(sv ORDER BY vec_id) AS cbs FROM subs WHERE vec_id < $PqCodes GROUP BY 1), " +
      "cball AS (SELECT list(cbs ORDER BY m) AS cb FROM cbm), " +
      s"enc AS (SELECT vec_id AS c_id, flatten(list_transform(range(0, $M), m -> " +
      s"cb[m + 1][list_position(${distsExpr("v", "m")}, list_min(${distsExpr("v", "m")}))])) AS recon " +
      "FROM v CROSS JOIN cball), " +
      s"q AS (SELECT vec_id AS q_id, v AS q_v FROM v WHERE vec_id < $NumQueries), " +
      "scored AS (SELECT q_id, c_id, ROUND(list_sum(list_transform(" +
      s"range(1, ${Dim + 1}), i -> (q_v[i] - recon[i]) * (q_v[i] - recon[i]))), 6) AS approx_dist " +
      "FROM enc JOIN q ON q_id <> c_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY approx_dist ASC, c_id ASC) AS rk FROM scored)"
  }

  def pqAnnTopKSql(k: Int = TopK): String =
    s"$pqAdcCtes " +
      s"SELECT q_id AS query_id, rk, c_id AS neighbor_id, approx_dist FROM ranked WHERE rk <= $k " +
      "ORDER BY query_id, rk"

  def pqAnnRerankSql(k: Int = TopK, shortlist: Int = PqShortlist): String =
    s"$pqAdcCtes, " +
      s"sl AS (SELECT q_id, c_id FROM ranked WHERE rk <= $shortlist), " +
      "rr AS (SELECT sl.q_id, sl.c_id, ROUND(list_dot_product(q.q_v, c.v) / " +
      "NULLIF(sqrt(list_dot_product(q.q_v, q.q_v)) * sqrt(list_dot_product(c.v, c.v)), 0), 6) AS cosine " +
      "FROM sl JOIN q ON q.q_id = sl.q_id JOIN v c ON c.vec_id = sl.c_id), " +
      "rranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY cosine DESC, c_id ASC) AS rk FROM rr) " +
      s"SELECT q_id AS query_id, rk, c_id AS neighbor_id, cosine FROM rranked WHERE rk <= $k " +
      "ORDER BY query_id, rk"

  /** IVF+PQ+re-rank — the composed production index (FAISS IVFADC with
    * refinement): the coarse quantizer restricts each query to ITS OWN
    * cell (nprobe = 1, ~[[IvfTargetCell]] candidates instead of the
    * corpus), ADC over the 8-byte PQ codes ranks the cell and keeps a
    * [[PqShortlist]]-deep shortlist, and exact cosine re-ranks only the
    * shortlist against raw vectors. Composes [[cellStructure]] (the IVF
    * artifact) with [[pqEncodedFrame]] (the PQ artifact) — at scale both
    * are persisted index tiers and a probe touches one cell's codes plus
    * shortlist-many raw vectors. All three stages are deterministic
    * (prefix-stable centroids AND codebooks, rounded distances, id
    * tiebreaks), so the full stack is oracle-replayed in DuckDB. */
  def ivfPqTopK(spark: SparkSession, dir: String, k: Int = TopK,
      shortlist: Int = PqShortlist): DataFrame = {
    val (emb, encoded) = pqEncodedFrame(spark, dir)
    ivfPqTopKFrom(spark, dir, emb, encoded, k, shortlist)
  }

  /** [[ivfPqTopK]] over a precomputed [[pqEncodedFrame]] (see
    * [[pqAnnTopKFrom]]); the IVF cell assignment stays per-call — it is
    * this tier's own coarse quantizer. */
  private def ivfPqTopKFrom(spark: SparkSession, dir: String,
      emb: DataFrame, encoded: DataFrame, k: Int, shortlist: Int): DataFrame = {
    // consumed by both the query frame and the candidate join — cache so
    // the n×K assignment (window over the corpus) runs once
    val cellOf = cellStructure(table(spark, dir, "embeddings"))._2
      .select(col("c_id").as("vec_id"), col("cell")).cache()
    val q = emb.filter(col("vec_id") < NumQueries)
      .join(cellOf, "vec_id")
      .select(col("vec_id").as("q_id"), col("v").as("q_v"), col("cell").as("q_cell"))
    val short = encoded.join(cellOf, encoded("c_id") === cellOf("vec_id"))
      .join(broadcast(q), col("q_cell") === col("cell") && col("q_id") =!= col("c_id"))
      .withColumn("approx_dist", expr(
        "round(aggregate(zip_with(q_v, recon, (x, y) -> (x - y) * (x - y)), " +
          "0D, (acc, x) -> acc + x), 6)"))
      .withColumn("srk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("approx_dist").asc, col("c_id").asc)))
      .filter(col("srk") <= shortlist)
      .select("q_id", "c_id")
    short
      .join(emb.select(col("vec_id").as("c_id"), col("v").as("c_v")), "c_id")
      .join(broadcast(q.drop("q_cell")), "q_id")
      .withColumn("cosine", round(
        vecDot(col("q_v"), col("c_v")) /
          expr("NULLIF(sqrt(aggregate(zip_with(q_v, q_v, (x, y) -> x * y), 0D, (a, x) -> a + x)) * " +
            "sqrt(aggregate(zip_with(c_v, c_v, (x, y) -> x * y), 0D, (a, x) -> a + x)), 0)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("q_id").orderBy(col("cosine").desc, col("c_id").asc)))
      .filter(col("rk") <= k)
      .select(col("q_id").as("query_id"), col("rk"), col("c_id").as("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rk")
  }

  /** DuckDB mirror of [[ivfPqTopK]] — replays the IVF assignment, the PQ
    * encode, the in-cell ADC shortlist and the exact re-rank from the
    * same prefix-stable literals. */
  def ivfPqTopKSql(k: Int = TopK, shortlist: Int = PqShortlist): String = {
    val M = PqSubspaces
    def distsExpr(vec: String, m: String) =
      s"list_transform(cb[$m + 1], c -> ROUND(list_sum(list_transform(" +
        s"range(1, ${PqSubDim + 1}), i -> ($vec[$m * $PqSubDim + i] - c[i]) * " +
        s"($vec[$m * $PqSubDim + i] - c[i]))), 6))"
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
      hierAssignCtes + ", " +
      "cva AS (SELECT v.*, COALESCE(a.cell, v.vec_id) AS cell " +
      "FROM v LEFT JOIN assign a ON a.vec_id = v.vec_id), " +
      s"subs AS (SELECT vec_id, m, v[(m * $PqSubDim + 1):(m * $PqSubDim + $PqSubDim)] AS sv " +
      s"FROM v CROSS JOIN (SELECT unnest(range(0, $M)) AS m) ms), " +
      s"cbm AS (SELECT m, list(sv ORDER BY vec_id) AS cbs FROM subs WHERE vec_id < $PqCodes GROUP BY 1), " +
      "cball AS (SELECT list(cbs ORDER BY m) AS cb FROM cbm), " +
      s"enc AS (SELECT vec_id AS c_id, flatten(list_transform(range(0, $M), m -> " +
      s"cb[m + 1][list_position(${distsExpr("v", "m")}, list_min(${distsExpr("v", "m")}))])) AS recon " +
      "FROM v CROSS JOIN cball), " +
      s"q AS (SELECT vec_id AS q_id, v AS q_v, cell AS q_cell FROM cva WHERE vec_id < $NumQueries), " +
      "scored AS (SELECT q_id, c.vec_id AS c_id, ROUND(list_sum(list_transform(" +
      s"range(1, ${Dim + 1}), i -> (q_v[i] - recon[i]) * (q_v[i] - recon[i]))), 6) AS approx_dist " +
      "FROM enc JOIN cva c ON c.vec_id = enc.c_id JOIN q ON q.q_cell = c.cell AND q.q_id <> c.vec_id), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY approx_dist ASC, c_id ASC) AS srk FROM scored), " +
      s"sl AS (SELECT q_id, c_id FROM ranked WHERE srk <= $shortlist), " +
      "rr AS (SELECT sl.q_id, sl.c_id, ROUND(list_dot_product(q.q_v, c.v) / " +
      "NULLIF(sqrt(list_dot_product(q.q_v, q.q_v)) * sqrt(list_dot_product(c.v, c.v)), 0), 6) AS cosine " +
      "FROM sl JOIN q ON q.q_id = sl.q_id JOIN v c ON c.vec_id = sl.c_id), " +
      "rranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id " +
      "ORDER BY cosine DESC, c_id ASC) AS rk FROM rr) " +
      s"SELECT q_id AS query_id, rk, c_id AS neighbor_id, cosine FROM rranked WHERE rk <= $k " +
      "ORDER BY query_id, rk"
  }

  // ---------------------------------------- semantic dedup (SemDeDup)

  /** Cosine above which two same-cell vectors count as semantic
    * duplicates. SemDeDup (Abbas et al. 2023, arXiv:2303.09540) runs
    * ~0.95+ on trained encoders; the synthetic testdata embeddings are
    * near-orthogonal gaussians (max pairwise cosine ≈ 0.51), so the
    * default is set where the testdata actually exercises both the drop
    * and keep branches. The operator takes the threshold as a parameter;
    * a real deployment passes its encoder-calibrated value. */
  val SemDedupThreshold = 0.4

  /** SemDeDup-style semantic deduplication: cluster the corpus into IVF
    * cells, call two same-cell vectors duplicates when their cosine ≥
    * `threshold`, and keep the minimum vec_id of each duplicate chain
    * (drop v iff some same-cell u < v has cosine(u,v) ≥ threshold — the
    * same deterministic min-id keep rule as the exact text dedup).
    * Output is the per-cell dedup ledger: vectors, drops, and the kept
    * set pinned by id checksum.
    *
    * Why cells and not the near-dup LSH: semantic duplicates are NOT
    * bit-similar (different tokenizations of the same meaning), so
    * shingle LSH misses them; embedding-space clustering is the public
    * SemDeDup recipe (cluster with k-means, compare only within a
    * cluster). Scale shape is [[ivfTopK]]'s: assignment is one broadcast
    * of K centroids × one scan, the pairwise pass is within-cell only —
    * O(n · [[IvfTargetCell]]) with the data-adaptive cell count, never
    * corpus² — and the ledger is one groupBy(cell) over n rows.
    * Centroids are the prefix-stable `vec_id < K` set so the DuckDB twin
    * replays the identical assignment (k-means centroids drop into the
    * same plan; see [[kmeansIvfTopK]]). */
  /** The cell structure of an embeddings-shaped frame (vec_id,
    * embedding): `(cents, cellVecs)` where cents = the prefix-stable
    * centroid frame (cent_id, t_v, t_n) and cellVecs = every vector with
    * its norm and cell label (cell, c_id, c_v, c_n). This is the static
    * artifact [[graft.streaming.StreamingSemantic]] replays per
    * micro-batch; [[semanticDedup]] builds it per call.
    *
    * Assignment is a LEFT join with a self-cell fallback: if the
    * prefix-stable centroid set is empty (an id space not starting at
    * 0), every vector becomes its own singleton cell — conservative
    * keep-everything instead of silently losing the corpus (a dedup may
    * under-drop, never under-keep). */
  def cellStructure(emb0: DataFrame): (DataFrame, DataFrame) =
    cellStructure(emb0, FlatAssignMaxCells)

  /** [[cellStructure]] with an explicit flat-ladder threshold — specs
    * pass 0 to force the two-level route on small fixtures. */
  private[graft] def cellStructure(emb0: DataFrame,
      flatMax: Int): (DataFrame, DataFrame) = {
    val emb = withNorm(emb0, "c")
    val cells = cellsForCorpus(emb0.count())
    val cents = withNorm(emb0.filter(col("vec_id") < cells), "t")
      .select(col("t_id").as("cent_id"), col("t_v"), col("t_n"))
    // two-level argmax (hierAssign): max_by over struct(sim, -id) at each
    // level — identical selection to a row_number window (max sim, then
    // min id; null sims sort below any value in struct order, matching
    // NULLS LAST) but runs as partial aggregations, no per-vector sort
    val assign = hierAssign(emb, cents, cells, keepVec = false,
        flatMax = flatMax)
      .select(col("c_id").as("vec_id"), col("cell"))
    val cellVecs = emb.join(assign, col("c_id") === col("vec_id"), "left")
      .withColumn("cell", coalesce(col("cell"), col("c_id")))
      .drop("vec_id")
    (cents, cellVecs)
  }

  def semanticDedup(spark: SparkSession, dir: String,
      threshold: Double = SemDedupThreshold): DataFrame = {
    // both sides of the within-cell join read cellVecs — cache so the
    // n×K assignment runs once (the ivfTopK no-ReusedExchange discipline)
    val cellVecs = cellStructure(table(spark, dir, "embeddings"))._2.cache()
    // the LOWER-id side carries the candidate cap: b still drops when any
    // of the cap lowest ids in its cell qualifies — for the hot-cell case
    // the cap exists for (B near-identical vectors) the min-id keeper IS
    // a representative, so the drop set is unchanged while the join emits
    // B×cap rows instead of B². sizeBound = one parquet-footer count
    // (1 row/vector in cellVecs), so the guard never executes the cached
    // n×K assignment just to decide it is inert
    val dropped = capCandidates(cellVecs, "cell", "c_id", MaxSearchBucket,
        sizeBound = table(spark, dir, "embeddings").count())
      .as("a").join(cellVecs.as("b"),
        col("a.cell") === col("b.cell") && col("a.c_id") < col("b.c_id"))
      .withColumn("cosine",
        round(vecDot(col("a.c_v"), col("b.c_v")) / expr("NULLIF(a.c_n * b.c_n, 0)"), 6))
      .filter(col("cosine") >= threshold)
      .select(col("b.c_id").as("d_id")).distinct()
    cellVecs.select(col("c_id"), col("cell"))
      .join(dropped, col("c_id") === col("d_id"), "left")
      .groupBy("cell").agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("d_id").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        coalesce(sum(when(col("d_id").isNull, col("c_id"))), lit(0L)).as("kept_id_sum"))
      .orderBy("cell")
  }

  /** DuckDB mirror of [[semanticDedup]] — same prefix-stable centroids,
    * same rounded-before-compare cosine, same min-id keep rule. */
  def semanticDedupSql(threshold: Double = SemDedupThreshold): String =
    "WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v, " +
      "sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm FROM embeddings), " +
      hierAssignCtes + ", " +
      "cv AS (SELECT v.*, COALESCE(a.cell, v.vec_id) AS cell " +
      "FROM v LEFT JOIN assign a ON a.vec_id = v.vec_id), " +
      "dropped AS (SELECT DISTINCT b.vec_id FROM cv a JOIN cv b " +
      "ON a.cell = b.cell AND a.vec_id < b.vec_id " +
      s"WHERE ROUND(list_dot_product(a.v, b.v) / NULLIF(a.nrm * b.nrm, 0), 6) >= $threshold) " +
      "SELECT cell, COUNT(*)::BIGINT AS n_vectors, " +
      "SUM(CASE WHEN d.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dropped, " +
      "COALESCE(SUM(CASE WHEN d.vec_id IS NULL THEN cv.vec_id END), 0)::BIGINT AS kept_id_sum " +
      "FROM cv LEFT JOIN dropped d ON d.vec_id = cv.vec_id GROUP BY 1 ORDER BY 1"

  // ---------------------------------------------------- ANN eval harness

  /** "Measure your index": recall@k of every approximate index against the
    * exact brute-force top-k — the [[graft.pipeline.Dedup.dedupQuality]]
    * twin for the ANN family, and the number a deployment checks before
    * trading exactness for an index tier (the per-method recalls quoted in
    * the scaladocs become a first-class, oracle-checked query). All five
    * searches run over the same query set; the comparison is a
    * (query, neighbor)-keyed join of k·|queries|-sized frames — tiny next
    * to any one search. Run per index-tuning change, not per ingest.
    *
    * Reading the output: `n_returned` spans each method's own query
    * universe (ann_ivf/ann_lsh search corpus-wide; the pq searches share
    * ann_cosine's fixed query set), while recall@k is always against the
    * exact top-k on the SHARED queries. Observed at sf0.1 (K = 8 ≤
    * [[FlatAssignMaxCells]], so the quantizer takes the flat ladder
    * rung): ann_ivf 0.82 / ann_kmeans 0.80 / ann_ivfpq 0.70 /
    * pq_ann_rerank 0.60 / pq_ann 0.16 / ann_lsh ≈0 — the last being the
    * honest hyperplane-bucket regime on unstructured gaussian embeddings
    * (candidates must share EVERY plane side with the query), which is
    * exactly why the IVF and re-rank paths, not ann_lsh, are the routed
    * search defaults. Above the rung the two-level TOP-2 multi-probe
    * quantizer trades some recall for n×4√K assignment cost (measured
    * 0.66/0.52 for ivf/kmeans when it was forced at sf0.1; the residual
    * gap is the rank-3+-super boundary effect, at its worst on
    * near-orthogonal gaussians where the super ranking is noisiest). */
  def annQuality(spark: SparkSession, dir: String): DataFrame = {
    // cached AND eagerly counted: the count is the recall denominator
    // anyway, and running it up front both materializes the brute-force
    // frame once (the hit join would otherwise race a cold cache with
    // the n_exact subtree — the stampede class pqEncodedFrame documents)
    // and lets the denominator fold into the plan as a literal
    val exact = annCosine(spark, dir).select("query_id", "neighbor_id").cache()
    val nExact = exact.count()
    // ONE corpus encode for the three PQ-family tiers (its cached 8×16
    // distance table is the harness's dominant re-derived frame); the
    // per-tier quantizers (LSH buckets, prefix/Lloyd centroids) stay
    // per-tier — they ARE what each tier measures. Eager: the tiers'
    // stages run concurrently inside the one union action and would
    // stampede a cold shared cache (see pqEncodedFrame)
    val (embQ, encodedQ) = pqEncodedFrame(spark, dir, eager = true)
    val preds = Seq(
      "ann_lsh" -> lshTopK(spark, dir),
      "ann_ivf" -> ivfTopK(spark, dir),
      "ann_kmeans" -> lloydIvfTopK(spark, dir),
      "ann_ivfpq" -> ivfPqTopKFrom(spark, dir, embQ, encodedQ, TopK, PqShortlist),
      "pq_ann" -> pqAnnTopKFrom(embQ, encodedQ, TopK),
      "pq_ann_rerank" -> pqAnnRerankFrom(embQ, encodedQ, TopK, PqShortlist))
      .map { case (n, df) =>
        df.select(col("query_id"), col("neighbor_id")).withColumn("method", lit(n))
      }.reduce(_ unionByName _)
    preds.join(exact.withColumn("__hit", lit(1)), Seq("query_id", "neighbor_id"), "left")
      .groupBy("method")
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("__hit"), lit(0))).as("n_hits"))
      .selectExpr("method", "n_returned", "n_hits",
        s"ROUND(n_hits * 1e0 / ${nExact}L, 6) AS recall_at_k")
      .orderBy("method")
  }

  /** The operator oracles composed as nested subqueries (each brings its
    * own WITH chain; flat splicing would collide CTE names). */
  def annQualitySql: String = {
    val unions = Seq(
      "ann_lsh" -> lshTopKSql(), "ann_ivf" -> ivfTopKSql(),
      "ann_kmeans" -> lloydIvfTopKSql(),
      "ann_ivfpq" -> ivfPqTopKSql(), "pq_ann" -> pqAnnTopKSql(),
      "pq_ann_rerank" -> pqAnnRerankSql())
      .map { case (n, sql) => s"SELECT '$n' AS method, query_id, neighbor_id FROM ($sql) q_$n" }
      .mkString(" UNION ALL ")
    s"WITH exact AS (SELECT query_id, neighbor_id FROM ($annCosineSql) e0), " +
      s"u AS ($unions), " +
      "j AS (SELECT u.method, COUNT(*) AS n_returned, " +
      "SUM(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hits " +
      "FROM u LEFT JOIN exact e ON u.query_id = e.query_id AND u.neighbor_id = e.neighbor_id GROUP BY 1), " +
      "n AS (SELECT COUNT(*) AS n_exact FROM exact) " +
      "SELECT method, n_returned, n_hits, ROUND(n_hits * 1e0 / n_exact, 6) AS recall_at_k " +
      "FROM j, n ORDER BY method"
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_quality" -> ((s, d) => annQuality(s, d)),
    "embedding_cohesion" -> ((s, d) => embeddingCohesion(s, d)),
    "ann_cosine" -> ((s, d) => annCosine(s, d)),
    "embed_neardup" -> ((s, d) => embedNeardup(s, d)),
    "ann_lsh" -> ((s, d) => lshTopK(s, d)),
    "ann_ivf" -> ((s, d) => ivfTopK(s, d)),
    "ann_kmeans" -> ((s, d) => lloydIvfTopK(s, d)),
    "cluster_profile" -> ((s, d) => clusterProfile(s, d)),
    "pq_profile" -> ((s, d) => pqProfile(s, d)),
    "pq_ann" -> ((s, d) => pqAnnTopK(s, d)),
    "pq_ann_rerank" -> ((s, d) => pqAnnRerank(s, d)),
    "ann_ivfpq" -> ((s, d) => ivfPqTopK(s, d)),
    "semantic_dedup" -> ((s, d) => semanticDedup(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "ann_quality" -> annQualitySql,
    "embedding_cohesion" -> embeddingCohesionSql,
    "ann_cosine" -> annCosineSql,
    "embed_neardup" -> embedNeardupSql,
    "ann_lsh" -> lshTopKSql(),
    "ann_ivf" -> ivfTopKSql(),
    "ann_kmeans" -> lloydIvfTopKSql(),
    "cluster_profile" -> clusterProfileSql,
    "pq_profile" -> pqProfileSql,
    "pq_ann" -> pqAnnTopKSql(),
    "pq_ann_rerank" -> pqAnnRerankSql(),
    "ann_ivfpq" -> ivfPqTopKSql(),
    "semantic_dedup" -> semanticDedupSql(),
  )
}
