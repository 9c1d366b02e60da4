package graft.drift

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Golden synthetic-drift fixture generator — port of the reference's only
  * runnable correctness artifact (/root/reference/example.py:12-87), with
  * the unseeded `random` replaced by a fixed seed (FIXTURES.md §A).
  *
  * v1 baseline; v2 mild drift (mean 100→105, std 15→16, cats 70/20/10→
  * 65/25/10, nulls 10%→12%); v3 significant drift (mean→120, std→25,
  * uniform range→150, category D→E, 40/40/20, nulls→25%, +new_feature).
  */
object SyntheticDrift {

  private val schemaBase = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("numeric_normal", DoubleType, nullable = false),
    StructField("numeric_uniform", DoubleType, nullable = false),
    StructField("category_balanced", StringType, nullable = false),
    StructField("category_imbalanced", StringType, nullable = false),
    StructField("binary_feature", LongType, nullable = false),
    StructField("date_col", StringType, nullable = false),
    StructField("null_col", DoubleType, nullable = true)))

  private def pickWeighted(r: scala.util.Random, cats: Seq[(String, Double)]): String = {
    val x = r.nextDouble()
    var acc = 0.0
    cats.find { case (_, w) => acc += w; x < acc }.map(_._1).getOrElse(cats.last._1)
  }

  def version(spark: SparkSession, v: Int, n: Int = 10000, seed: Long = 42L): DataFrame = {
    val r = new scala.util.Random(seed + v)
    val baseDay = java.time.LocalDate.of(2024, 1, 1)
    val rows = (0 until n).map { i =>
      val id = v match { case 1 => i.toLong; case 2 => 5000L + i; case _ => 10000L + i }
      val normal = v match {
        case 1 => 100.0 + 15.0 * r.nextGaussian()
        case 2 => 105.0 + 16.0 * r.nextGaussian()
        case _ => 120.0 + 25.0 * r.nextGaussian()
      }
      val uniform = if (v == 3) 150.0 * r.nextDouble() else 100.0 * r.nextDouble()
      val balanced = if (v == 3) Seq("A", "B", "C", "E")(r.nextInt(4)) else Seq("A", "B", "C", "D")(r.nextInt(4))
      val imbalanced = v match {
        case 1 => pickWeighted(r, Seq("X" -> 0.7, "Y" -> 0.2, "Z" -> 0.1))
        case 2 => pickWeighted(r, Seq("X" -> 0.65, "Y" -> 0.25, "Z" -> 0.1))
        case _ => pickWeighted(r, Seq("X" -> 0.4, "Y" -> 0.4, "Z" -> 0.2))
      }
      val binary = if (v == 3) (if (r.nextDouble() < 0.75) 0L else 1L) else r.nextInt(2).toLong
      val dateCol = baseDay.minusDays(r.nextInt(if (v == 3) 180 else 365).toLong).toString
      val nullRate = v match { case 1 => 0.10; case 2 => 0.12; case _ => 0.25 }
      val nullCol: java.lang.Double = if (r.nextDouble() < nullRate) null else 100.0 * r.nextDouble()
      val base = Seq[Any](id, normal, uniform, balanced, imbalanced, binary, dateCol, nullCol)
      org.apache.spark.sql.Row.fromSeq(if (v == 3) base :+ (50.0 + 10.0 * r.nextGaussian()) else base)
    }
    val schema = if (v == 3)
      StructType(schemaBase.fields :+ StructField("new_feature", DoubleType, nullable = false))
    else schemaBase
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 4), schema)
  }
}
