package graft

import org.apache.spark.sql.types._
import graft.drift._

class ConfigAndScreenSpec extends SparkSpec {
  import spark.implicits._

  test("sample config JSON carries the three profile threshold tables (O42)") {
    val json = ConfigGen.sampleConfigJson("/data/tbl", 3, 7)
    assert(json.contains("\"reference_version\": 3"))
    for (p <- Seq("summary", "standard", "deep_dive")) assert(json.contains("\"" + p + "\""))
    assert(json.contains("\"mean_threshold\": 0.05")) // standard
    assert(json.contains("\"chi_square_pvalue\": 0.01")) // summary
    // parseable by any JSON reader: minimal structural sanity
    assert(json.count(_ == '{') == json.count(_ == '}'))
  }

  test("inferred config embeds semantic types as custom_column_types (O42)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "cat")
    val json = ConfigGen.inferConfigJson(spark, df, "/data/tbl")
    assert(json.contains("\"id\": \"numerical\""))
    assert(json.contains("\"cat\": \"categorical\""))
  }

  test("valid-column screen drops high-null columns (O29)") {
    val ref = Seq.tabulate(100)(i => (i.toDouble, if (i < 20) Some(i.toDouble) else None))
      .toDF("good", "mostly_null")
    val curr = ref
    assert(CorrelationDrift.validColumns(ref, curr, Seq("good", "mostly_null")) == Seq("good"))
  }

  test("profile compare reports histogram and column-count changes (O10)") {
    val s1 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType)))
    val s2 = StructType(Seq(StructField("a", IntegerType), StructField("b", StringType),
      StructField("c", ArrayType(IntegerType))))
    val d = SchemaOps.compareProfiles(SchemaOps.profile(s1), SchemaOps.profile(s2))
    assert(d("column_count_change") == 1)
    assert(d("complex_columns_added") == Seq("c"))
  }

  test("DriftConfig profiles select the right thresholds") {
    assert(DriftConfig("summary").meanThreshold == 0.1)
    assert(DriftConfig("standard").meanThreshold == 0.05)
    assert(DriftConfig("deep_dive").stdThreshold == 0.05)
    assert(DriftConfig("deep_dive").correlationThreshold == 0.6)
  }
}
