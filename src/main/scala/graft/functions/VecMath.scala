package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, BinaryExpression, Expression, ExpressionInfo, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `vec_dot(a, b)` — native Catalyst dot product over `array<float>` /
  * `array<double>` columns, the one hot scalar in the ANN/embedding family
  * ([[graft.pipeline.Similarity]] evaluates it once per candidate pair).
  *
  * The composed form `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, +)` is
  * already codegen'd, but it materializes a second length-d array per pair
  * (the `zip_with` product) and walks both arrays twice. At 100 TB the
  * candidate stream is billions of pairs × d elements, and that transient
  * allocation is the dominant GC pressure of the scoring stage. This
  * expression is the brief's escalation path (b): a whole-stage-codegen'd
  * `BinaryExpression` whose generated code is ONE allocation-free fused
  * loop over the two `ArrayData` buffers.
  *
  * Semantics contract — EXACTLY the composed form's, so [[VecDotRewrite]]
  * may substitute it into arbitrary user plans: accumulate in double,
  * strictly left-to-right (bit-identical to the `aggregate` fold and to
  * DuckDB's `list_dot_product`; floats widen exactly); NULL when either
  * array is NULL, when lengths differ (`zip_with` pads the shorter side
  * with NULL and the fold absorbs it), or when any element is NULL. When
  * both schemas say `containsNull = false` the generated loop skips the
  * per-element null test entirely.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
        if (a == DoubleType || a == FloatType) && a == b =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two arrays of matching float/double element type, got $l, $r")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val double = elemType == DoubleType
    val checkNulls = mayHaveNullElems
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += (if (double) x.getDouble(i) * y.getDouble(i)
            else x.getFloat(i).toDouble * y.getFloat(i).toDouble)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemType == DoubleType) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val nullCheck =
        if (mayHaveNullElems)
          s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += (double) $x.$get($i) * (double) $y.$get($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Column + SQL surfaces for the native vector math. */
object VecFunctions {

  /** Dot product as a `Column` — usable without any session registration. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  private[functions] val vecDotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => VecDot(a, b)
    case exprs => throw new IllegalArgumentException(
      s"vec_dot takes exactly 2 arguments, got ${exprs.size}")
  }

  /** Makes `vec_dot` callable from SQL text in an existing session
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "vec_dot", vecDotBuilder)

  /** Installs [[VecDotRewrite]] on an existing session through the PUBLIC
    * `experimental.extraOptimizations` hook (idempotent) — user SQL written
    * in the composed HOF form gets the native loop without edits. */
  def installRewrite(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(VecDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecDotRewrite
}

/** Optimizer rule: rewrites the composed dot-product idioms to [[VecDot]] —
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v)
  *   aggregate(v, 0d, (acc, x) -> acc + x * x)            (self-dot / norm²)
  *
  * — for double-element arrays. Semantics-preserving by [[VecDot]]'s
  * contract (same left-to-right accumulation, same NULL behavior for
  * ragged lengths and null elements), so it may run on arbitrary user
  * plans. Float-element arrays never match: the analyzer has already
  * inserted casts inside the lambdas, which breaks the bare-variable
  * pattern — exactly the cases where a blind rewrite could change results.
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    // bit-match so a -0.0 seed (which `v == 0.0` accepts) never triggers the
    // rewrite: VecDot accumulates from +0.0, and a -0d-seeded fold over an
    // empty array returns -0.0 — a bit-level divergence from the contract
    case Literal(v: Double, DoubleType) => java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  /** x*y over exactly the two lambda variables, either order (IEEE
    * multiplication commutes bit-exactly). */
  private def isPairProduct(body: Expression,
      vx: NamedLambdaVariable, vy: NamedLambdaVariable): Boolean = body match {
    case Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
      (a.exprId == vx.exprId && b.exprId == vy.exprId) ||
        (a.exprId == vy.exprId && b.exprId == vx.exprId)
    case _ => false
  }

  private def isAccPlus(body: Expression,
      acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean = body match {
    case Add(a: NamedLambdaVariable, b: NamedLambdaVariable, _) =>
      (a.exprId == acc.exprId && b.exprId == v.exprId) ||
        (a.exprId == v.exprId && b.exprId == acc.exprId)
    case _ => false
  }

  private def isAccPlusSquare(body: Expression,
      acc: NamedLambdaVariable, x: NamedLambdaVariable): Boolean = body match {
    case Add(a: NamedLambdaVariable, Multiply(m1: NamedLambdaVariable, m2: NamedLambdaVariable, _), _) =>
      a.exprId == acc.exprId && m1.exprId == x.exprId && m2.exprId == x.exprId
    case Add(Multiply(m1: NamedLambdaVariable, m2: NamedLambdaVariable, _), a: NamedLambdaVariable, _) =>
      a.exprId == acc.exprId && m1.exprId == x.exprId && m2.exprId == x.exprId
    case _ => false
  }

  private def isIdentity(finish: Expression): Boolean = finish match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(mul,
          Seq(vx: NamedLambdaVariable, vy: NamedLambdaVariable), _)),
        zero, LambdaFunction(merge,
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _), finish)
      if isDoubleArray(a) && isDoubleArray(b) && isZero(zero) &&
        isPairProduct(mul, vx, vy) && isAccPlus(merge, acc, v) && isIdentity(finish) =>
      VecDot(a, b)
    // self-dot duplicates `arr` into both VecDot slots; require a
    // deterministic child (the guard Spark's own rules use when cloning an
    // expression) so e.g. aggregate(shuffle(v), 0d, (acc,x) -> acc + x*x)
    // keeps its single evaluation — two draws of a nondeterministic child
    // would differ and silently change the result
    case ArrayAggregate(arr, zero, LambdaFunction(merge,
          Seq(acc: NamedLambdaVariable, x: NamedLambdaVariable), _), finish)
      if isDoubleArray(arr) && arr.deterministic && isZero(zero) &&
        isAccPlusSquare(merge, acc, x) && isIdentity(finish) =>
      VecDot(arr, arr)
  }
}

/** `SparkSessionExtensions` injector — the library-level registration path:
  * `spark.sql.extensions=graft.functions.GraftExtensions` makes `vec_dot`
  * a session-native SQL function on every session of the cluster. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      VecFunctions.vecDotBuilder))
    ext.injectOptimizerRule(_ => VecDotRewrite)
    // OFF unless spark.graft.sketchMode=true — see plans.SketchModeRewrite
    ext.injectOptimizerRule(_ => graft.plans.SketchModeRewrite)
  }
}
