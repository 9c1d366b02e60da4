package graft

import org.apache.spark.sql.functions._
import graft.functions.{VecFunctions, VecDot}

/** The native `vec_dot` expression: value parity with the HOF fold it
  * replaced (bit-exact, both codegen and interpreted paths), float
  * widening, null propagation, SQL registration, and type checking. */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pairs = spark.range(1000).select(col("id"),
    expr("transform(sequence(1, 64), i -> cast(id % 97 + i AS DOUBLE) / 97d)").as("a"),
    expr("transform(sequence(1, 64), i -> cast(id % 89 + i AS DOUBLE) / 89d)").as("b"))

  test("vec_dot is bit-identical to the aggregate/zip_with fold") {
    val both = pairs.select(
      VecFunctions.vecDot(col("a"), col("b")).as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)").as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // and through an aggregate (whole-stage codegen path)
    val sums = both.agg(sum("native"), sum("hof")).collect()(0)
    assert(sums.getDouble(0) == sums.getDouble(1))
  }

  test("vec_dot on float arrays equals cast-to-double-then-dot, bit for bit") {
    val f = pairs.select(
      col("a").cast("array<float>").as("af"), col("b").cast("array<float>").as("bf"))
    val both = f.select(
      VecFunctions.vecDot(col("af"), col("bf")).as("native"),
      VecFunctions.vecDot(col("af").cast("array<double>"), col("bf").cast("array<double>")).as("casted"))
    assert(both.filter(col("native") =!= col("casted")).count() == 0)
  }

  test("vec_dot interpreted eval matches codegen") {
    // force the interpreted path via a literal-only eval on the driver
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = VecDot(
      Literal.create(Seq(1.5, -2.0, 3.0), ArrayType(DoubleType)),
      Literal.create(Seq(2.0, 0.5, 4.0), ArrayType(DoubleType)))
    assert(e.eval(null) == (1.5 * 2.0 + -2.0 * 0.5 + 3.0 * 4.0))
  }

  test("vec_dot propagates null inputs and rejects bad types") {
    val row = spark.sql("SELECT CAST(NULL AS ARRAY<DOUBLE>) AS a, array(1d, 2d) AS b")
      .select(VecFunctions.vecDot(col("a"), col("b")).as("d")).collect()(0)
    assert(row.isNullAt(0))
    val err = intercept[Exception] {
      spark.range(1).select(VecFunctions.vecDot(lit("oops"), lit(1))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("the rewrite rule turns both HOF idioms into vec_dot, and only those") {
    import graft.functions.{VecDotRewrite, VecFunctions}
    val before = spark.experimental.extraOptimizations
    try {
      VecFunctions.installRewrite(spark)
      VecFunctions.installRewrite(spark) // idempotent
      assert(spark.experimental.extraOptimizations.count(_ == VecDotRewrite) == 1)
      val dot = pairs.select(
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)").as("d"))
      val norm = pairs.select(
        expr("aggregate(a, 0d, (acc, x) -> acc + x * x)").as("n2"))
      assert(dot.queryExecution.executedPlan.toString.contains("vec_dot"))
      assert(norm.queryExecution.executedPlan.toString.contains("vec_dot"))
      // rewritten results == native results, bit for bit
      val viaRule = dot.agg(sum("d")).collect()(0).getDouble(0)
      val native = pairs.select(VecFunctions.vecDot(col("a"), col("b")).as("d"))
        .agg(sum("d")).collect()(0).getDouble(0)
      assert(viaRule == native)
      // a different zero or a non-product lambda must NOT match
      val other = pairs.select(
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 1d, (acc, v) -> acc + v)").as("d"),
        expr("aggregate(zip_with(a, b, (x, y) -> x + y), 0d, (acc, v) -> acc + v)").as("e"))
      assert(!other.queryExecution.executedPlan.toString.contains("vec_dot"))
    } finally spark.experimental.extraOptimizations = before
  }

  test("the rewrite refuses -0.0 seeds and nondeterministic self-dot children") {
    import graft.functions.VecFunctions
    val before = spark.experimental.extraOptimizations
    try {
      VecFunctions.installRewrite(spark)
      // -0d seed: fold over an empty array returns -0.0; VecDot returns
      // +0.0 — bit-divergent, so the rule must not fire
      val negZero = pairs.select(
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), -0d, (acc, v) -> acc + v)").as("d"))
      assert(!negZero.queryExecution.executedPlan.toString.contains("vec_dot"))
      // nondeterministic child: VecDot(arr, arr) would evaluate shuffle(a)
      // twice with different draws — the rule must leave it alone
      val nondet = pairs.select(
        expr("aggregate(shuffle(a), 0d, (acc, x) -> acc + x * x)").as("n2"))
      assert(!nondet.queryExecution.executedPlan.toString.contains("vec_dot"))
      // while the deterministic self-dot still rewrites
      val det = pairs.select(
        expr("aggregate(a, 0d, (acc, x) -> acc + x * x)").as("n2"))
      assert(det.queryExecution.executedPlan.toString.contains("vec_dot"))
    } finally spark.experimental.extraOptimizations = before
  }

  test("the rewrite preserves HOF null semantics on ragged and null arrays") {
    import graft.functions.VecFunctions
    val before = spark.experimental.extraOptimizations
    try {
      VecFunctions.installRewrite(spark)
      // built over range() so ConvertToLocalRelation can't pre-evaluate the
      // whole projection at optimize time
      val df = spark.range(3).selectExpr("id",
          "CASE id WHEN 0 THEN array(1d, 2d) WHEN 1 THEN array(1d, CAST(NULL AS DOUBLE)) ELSE array(1d, 2d) END AS a",
          "CASE id WHEN 0 THEN array(1d, 2d, 3d) WHEN 1 THEN array(1d, 2d) ELSE array(3d, 4d) END AS b")
        .selectExpr("id", "aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) AS d")
        .orderBy("id")
      assert(df.queryExecution.executedPlan.toString.contains("vec_dot"))
      val rows = df.collect()
      val d = rows(0).fieldIndex("d")
      assert(rows(0).isNullAt(d)) // ragged -> NULL, like zip_with padding
      assert(rows(1).isNullAt(d)) // null element -> NULL
      assert(rows(2).getDouble(d) == 11.0)
    } finally spark.experimental.extraOptimizations = before
  }

  test("vec_dot registers as a SQL function") {
    VecFunctions.register(spark)
    val v = spark.sql("SELECT vec_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 32.0)
  }
}
