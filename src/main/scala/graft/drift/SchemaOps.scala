package graft.drift

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema comparison machinery — reference O5–O10 (SURVEY.md §2.b; semantics
  * from /root/reference/schema_analyzer.py). All driver-side recursion over
  * `StructType`s — no cluster work, exactly as the reference — plus the
  * nested-type content drift (O8/O9) which IS distributed (one agg per
  * frame).
  */
object SchemaOps {

  /** One schema change record (flat, path-addressed for nested types). */
  case class SchemaChange(changeType: String, path: String,
      refType: Option[String], currType: Option[String], compatible: Option[Boolean])

  /** Numeric widening compatibility (schema_analyzer.py:739-787). */
  def isCompatible(ref: DataType, curr: DataType): Boolean = {
    if (ref == curr) return true
    val widening: Set[(String, String)] = Set(
      ("ByteType", "ShortType"), ("ByteType", "IntegerType"), ("ByteType", "LongType"),
      ("ByteType", "FloatType"), ("ByteType", "DoubleType"),
      ("ShortType", "IntegerType"), ("ShortType", "LongType"),
      ("ShortType", "FloatType"), ("ShortType", "DoubleType"),
      ("IntegerType", "LongType"), ("IntegerType", "FloatType"), ("IntegerType", "DoubleType"),
      ("LongType", "FloatType"), ("LongType", "DoubleType"),
      ("FloatType", "DoubleType"))
    widening.contains((ref.toString.takeWhile(_ != '('), curr.toString.takeWhile(_ != '(')))
  }

  /** O6 + O7: full recursive diff of two schemas — added/removed columns,
    * type changes (with compatibility), nullable flips, metadata changes,
    * recursing through struct fields, array elements and map keys/values
    * (schema_analyzer.py:427-550, 649-737). */
  def diff(ref: StructType, curr: StructType, path: String = ""): Seq[SchemaChange] = {
    val refMap = ref.fields.map(f => f.name -> f).toMap
    val currMap = curr.fields.map(f => f.name -> f).toMap
    val added = curr.fields.filterNot(f => refMap.contains(f.name)).map { f =>
      SchemaChange("added", s"$path${f.name}", None, Some(f.dataType.simpleString), None)
    }
    val removed = ref.fields.filterNot(f => currMap.contains(f.name)).map { f =>
      SchemaChange("removed", s"$path${f.name}", Some(f.dataType.simpleString), None, None)
    }
    val common = ref.fields.filter(f => currMap.contains(f.name)).flatMap { rf =>
      val cf = currMap(rf.name)
      val p = s"$path${rf.name}"
      val typeChanges = diffType(rf.dataType, cf.dataType, p)
      val nullableChange =
        if (rf.nullable != cf.nullable)
          Seq(SchemaChange(if (cf.nullable) "nullable_added" else "nullable_removed",
            p, Some(rf.nullable.toString), Some(cf.nullable.toString), None))
        else Seq.empty
      val metadataChange =
        if (rf.metadata != cf.metadata)
          Seq(SchemaChange("metadata_changed", p,
            Some(rf.metadata.json), Some(cf.metadata.json), None))
        else Seq.empty
      typeChanges ++ nullableChange ++ metadataChange
    }
    (added ++ removed ++ common).sortBy(c => (c.path, c.changeType))
  }

  private def diffType(ref: DataType, curr: DataType, path: String): Seq[SchemaChange] =
    (ref, curr) match {
      case (r, c) if r == c => Seq.empty
      case (r: StructType, c: StructType) => diff(r, c, s"$path.")
      case (r: ArrayType, c: ArrayType) =>
        val containsNull =
          if (r.containsNull != c.containsNull)
            Seq(SchemaChange("array_contains_null_changed", path,
              Some(r.containsNull.toString), Some(c.containsNull.toString), None))
          else Seq.empty
        containsNull ++ diffType(r.elementType, c.elementType, s"$path.element")
      case (r: MapType, c: MapType) =>
        val valueNull =
          if (r.valueContainsNull != c.valueContainsNull)
            Seq(SchemaChange("map_value_contains_null_changed", path,
              Some(r.valueContainsNull.toString), Some(c.valueContainsNull.toString), None))
          else Seq.empty
        valueNull ++ diffType(r.keyType, c.keyType, s"$path.key") ++
          diffType(r.valueType, c.valueType, s"$path.value")
      case (r, c) =>
        Seq(SchemaChange("type_changed", path, Some(r.simpleString),
          Some(c.simpleString), Some(isCompatible(r, c))))
    }

  /** O10 schema profile: physical-type histogram + complex/non-nullable
    * census (schema_analyzer.py:552-599). */
  def profile(schema: StructType): Map[String, Any] = Map(
    "column_count" -> schema.fields.length,
    "type_histogram" -> schema.fields.groupBy(_.dataType.simpleString).view.mapValues(_.length).toMap,
    "complex_columns" -> schema.fields.filter(f => f.dataType match {
      case _: StructType | _: ArrayType | _: MapType => true; case _ => false
    }).map(_.name).toSeq.sorted,
    "non_nullable_columns" -> schema.fields.filterNot(_.nullable).map(_.name).toSeq.sorted)

  /** O10 profile diff (schema_analyzer.py:601-647). */
  def compareProfiles(p1: Map[String, Any], p2: Map[String, Any]): Map[String, Any] = {
    val h1 = p1("type_histogram").asInstanceOf[Map[String, Int]]
    val h2 = p2("type_histogram").asInstanceOf[Map[String, Int]]
    Map(
      "column_count_change" -> (p2("column_count").asInstanceOf[Int] - p1("column_count").asInstanceOf[Int]),
      "type_histogram_changes" -> (h1.keySet ++ h2.keySet).toSeq.sorted
        .map(t => t -> (h2.getOrElse(t, 0) - h1.getOrElse(t, 0))).filter(_._2 != 0).toMap,
      "complex_columns_added" -> (p2("complex_columns").asInstanceOf[Seq[String]]
        .diff(p1("complex_columns").asInstanceOf[Seq[String]])),
      "non_nullable_changes" -> (p2("non_nullable_columns").asInstanceOf[Seq[String]]
        .diff(p1("non_nullable_columns").asInstanceOf[Seq[String]])))
  }

  // --------------------------------------------------- schema_diff query

  /** Schema-diff as a driver-checkable query: diff a projected "v1" of
    * lineitem against a tweaked "v2" (column dropped / added / widened).
    * Deterministic, so the oracle is a VALUES literal. */
  def schemaDiffQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = table(spark, dir, "lineitem")
    val v1 = li.select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
      col("l_quantity"), col("l_returnflag"))
    val v2 = li.select(col("l_orderkey"), col("l_partkey").cast("double"),
      col("l_linenumber").cast("long"), col("l_quantity"), col("l_linestatus"))
    diff(v1.schema, v2.schema)
      .map(c => (c.changeType, c.path, c.refType.orNull, c.currType.orNull,
        c.compatible.map(_.toString).orNull))
      .toDF("change_type", "path", "ref_type", "curr_type", "compatible")
      .orderBy("path", "change_type")
  }

  val schemaDiffSql: String =
    "SELECT * FROM (VALUES " +
      "('added', 'l_linestatus', CAST(NULL AS VARCHAR), 'string', CAST(NULL AS VARCHAR)), " +
      "('type_changed', 'l_linenumber', 'int', 'bigint', 'true'), " +
      "('type_changed', 'l_partkey', 'bigint', 'double', 'true'), " +
      "('removed', 'l_returnflag', 'string', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))" +
      ") t(change_type, path, ref_type, curr_type, compatible) ORDER BY path, change_type"

  // ----------------------------------- O8/O9 nested-content drift query

  /** Array-content drift (O9) over arrays BUILT from the testdata (the
    * driver tables have no nested columns): per order, the array of its
    * lineitem quantities. Computes null-ratio, empty-ratio and avg size per
    * snapshot side + threshold flags
    * (/root/reference/schema_analyzer.py:225-284; thresholds 0.1/0.1/0.2). */
  def arrayDriftQuery(spark: SparkSession, dir: String): DataFrame = {
    val li = withSide(table(spark, dir, "lineitem"), splits.lineitemRef)
    val arrays = li.groupBy("side", "l_orderkey")
      .agg(collect_list("l_quantity").as("qties"))
    val stats = arrays.groupBy("side").agg(
      count(lit(1)).as("n"),
      avg(when(col("qties").isNull, 1.0).otherwise(0.0)).as("null_ratio"),
      avg(when(size(col("qties")) === 0, 1.0).otherwise(0.0)).as("empty_ratio"),
      avg(size(col("qties")).cast("double")).as("avg_size"))
    def side(s: String) = stats.filter(col("side") === s)
      .select(col("n").as(s"${s}_n"), col("null_ratio").as(s"${s}_null_ratio"),
        col("empty_ratio").as(s"${s}_empty_ratio"), col("avg_size").as(s"${s}_avg_size"))
    side("ref").crossJoin(side("curr"))
      .selectExpr(
        "'lineitem_quantities_by_order' AS array_column",
        "ref_n", "curr_n",
        "ROUND(ref_null_ratio, 6) AS ref_null_ratio", "ROUND(curr_null_ratio, 6) AS curr_null_ratio",
        "ROUND(ref_empty_ratio, 6) AS ref_empty_ratio", "ROUND(curr_empty_ratio, 6) AS curr_empty_ratio",
        "ROUND(ref_avg_size, 6) AS ref_avg_size", "ROUND(curr_avg_size, 6) AS curr_avg_size",
        "(ABS(curr_null_ratio - ref_null_ratio) > 0.1) AS null_drift",
        "(ABS(curr_empty_ratio - ref_empty_ratio) > 0.1) AS empty_drift",
        s"(ABS(${relDiffSql("ref_avg_size", "curr_avg_size")}) > 0.2) AS size_drift")
  }

  val arrayDriftSql: String = {
    def sideAgg(pred: String) =
      "SELECT COUNT(*) AS n, AVG(CASE WHEN qties IS NULL THEN 1e0 ELSE 0e0 END) AS null_ratio, " +
        "AVG(CASE WHEN LEN(qties) = 0 THEN 1e0 ELSE 0e0 END) AS empty_ratio, " +
        "AVG(LEN(qties) * 1e0) AS avg_size FROM " +
        s"(SELECT l_orderkey, LIST(l_quantity) AS qties FROM lineitem WHERE $pred GROUP BY 1) a"
    s"SELECT 'lineitem_quantities_by_order' AS array_column, r.n AS ref_n, c.n AS curr_n, " +
      "ROUND(r.null_ratio, 6) AS ref_null_ratio, ROUND(c.null_ratio, 6) AS curr_null_ratio, " +
      "ROUND(r.empty_ratio, 6) AS ref_empty_ratio, ROUND(c.empty_ratio, 6) AS curr_empty_ratio, " +
      "ROUND(r.avg_size, 6) AS ref_avg_size, ROUND(c.avg_size, 6) AS curr_avg_size, " +
      "(ABS(c.null_ratio - r.null_ratio) > 0.1) AS null_drift, " +
      "(ABS(c.empty_ratio - r.empty_ratio) > 0.1) AS empty_drift, " +
      s"(ABS(${relDiffSql("r.avg_size", "c.avg_size")}) > 0.2) AS size_drift " +
      s"FROM (${sideAgg(splits.lineitemRefSql)}) r, (${sideAgg(s"NOT (${splits.lineitemRefSql})")}) c"
  }

  // ----------------------------------------------------------------- API

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "schema_diff" -> ((s, d) => schemaDiffQuery(s, d)),
    "array_drift" -> ((s, d) => arrayDriftQuery(s, d)),
    "type_inference" -> ((s, d) => TypeInference.typeInferenceQuery(s, d)),
  )

  def oracles: Map[String, String] = Map(
    "schema_diff" -> schemaDiffSql,
    "array_drift" -> arrayDriftSql,
    "type_inference" -> TypeInference.typeInferenceSql,
  )
}
