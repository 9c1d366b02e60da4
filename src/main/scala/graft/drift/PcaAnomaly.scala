package graft.drift

import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.ml.linalg.{DenseMatrix, Vector, Vectors}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA multivariate anomaly drift — reference O37
  * (/root/reference/rare_event_analyzer.py:187-345): assemble ≥3 numeric
  * columns, scale + PCA fitted on the REFERENCE frame, per-row
  * reconstruction error, anomaly = error > µ_ref + 3σ_ref, compare anomaly
  * ratios between snapshots.
  *
  * The reconstruction error is the one place a UDF is genuinely needed
  * (Vector algebra per row); it is a Scala UDF over ml Vectors — no Python
  * worker round-trips. The models are fitted once on the reference and the
  * error pass is a single scan per frame.
  */
object PcaAnomaly {

  case class Result(columns: Seq[String], k: Int,
      refAnomalyCount: Long, currAnomalyCount: Long,
      refAnomalyRatio: Double, currAnomalyRatio: Double,
      refMeanError: Double, currMeanError: Double,
      anomalyRatioChange: Double, meanErrorChange: Double, significant: Boolean)

  def detect(spark: SparkSession, ref: DataFrame, curr: DataFrame, cols: Seq[String],
      zThreshold: Double = 3.0, maxComponents: Int = 10): Option[Result] = {
    if (cols.size < 3) return None
    val assembler = new VectorAssembler().setInputCols(cols.toArray)
      .setOutputCol("features").setHandleInvalid("skip")
    val refFeat = assembler.transform(ref.select(cols.map(col): _*))
    val currFeat = assembler.transform(curr.select(cols.map(col): _*))

    val scaler = new StandardScaler().setWithMean(true).setWithStd(true)
      .setInputCol("features").setOutputCol("scaled").fit(refFeat)
    val k = math.min(maxComponents, cols.size)
    val pca = new PCA().setK(k).setInputCol("scaled").setOutputCol("pca").fit(scaler.transform(refFeat))
    val pc: DenseMatrix = pca.pc // (dim x k)

    val reconError = udf { v: Vector =>
      val x = v.toArray
      val dim = x.length
      // proj = pc^T x (k), recon = pc * proj (dim)
      val proj = Array.tabulate(k)(j => (0 until dim).map(i => pc(i, j) * x(i)).sum)
      val recon = Array.tabulate(dim)(i => (0 until k).map(j => pc(i, j) * proj(j)).sum)
      math.sqrt((0 until dim).map(i => { val d = x(i) - recon(i); d * d }).sum)
    }
    def errors(df: DataFrame) = scaler.transform(df)
      .withColumn("err", reconError(col("scaled"))).select("err")

    val refErr = errors(refFeat).cache()
    val Array(refMean, refStd, refN) = refErr
      .agg(avg("err"), coalesce(stddev(col("err")), lit(0.0)), count(lit(1)).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val thr = refMean + zThreshold * refStd
    val refAnom = refErr.filter(col("err") > thr).count()
    val currErr = errors(currFeat).cache()
    val Array(currMean, currN) = currErr.agg(avg("err"), count(lit(1)).cast("double"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    val currAnom = currErr.filter(col("err") > thr).count()

    val refRatio = if (refN > 0) refAnom / refN else 0.0
    val currRatio = if (currN > 0) currAnom / currN else 0.0
    val ratioChange =
      if (refRatio > 0) (currRatio - refRatio) / refRatio
      else if (currRatio > 0) 1.0 else 0.0
    val errChange =
      if (refMean != 0) (currMean - refMean) / math.abs(refMean)
      else if (currMean != 0) 1.0 else 0.0
    Some(Result(cols, k, refAnom, currAnom, refRatio, currRatio, refMean, currMean,
      ratioChange, errChange,
      significant = math.abs(errChange) >= 0.3 || math.abs(ratioChange) >= 0.5))
  }
}
