package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector kernels of the similarity
  * operators. Spark's higher-order array functions (`aggregate`,
  * `zip_with`) evaluate their lambdas INTERPRETED — one
  * `InterpretedEvaluator` round-trip per element — which measured ~40×
  * slower than a fused loop on the similarity hot path. These
  * expressions participate in whole-stage codegen (`doGenCode` emits the
  * tight Java loop directly into the generated stage), so the dot
  * product compiles into the same pipeline as the surrounding
  * filter/project.
  *
  * Summation order is left-to-right, identical to both the
  * `aggregate`-based formulation and DuckDB's `list_reduce` — results
  * are bit-identical to the oracle.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Mismatched lengths → NULL (a corrupt vector must not yield a
  // plausible-looking partial dot; matches the zip_with+aggregate HOF
  // formulation, which null-pads and propagates NULL). NULL ELEMENTS are
  // read as 0.0 — embeddings are non-null-element arrays by contract.
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) null
    else {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      if (x.numElements() != y.numElements()) null
      else {
        val n = x.numElements()
        var s = 0.0
        var i = 0
        while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
        s
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $a.numElements(); $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** sqrt(Σ x_i²) with the same left-to-right accumulation as the
  * `aggregate` formulation and the DuckDB oracle.
  */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** Native text-fingerprint expressions: thin codegen wrappers over the
  * static [[TextKernels]] methods, so the kernel call is emitted
  * directly into the whole-stage-generated Java (no UDF closure
  * dispatch, no UTF-8 → String decode, no reflective output
  * re-encoding). NEVER null on output: a null document hashes like the
  * empty document, exactly as the UDF reference implementations in
  * `graft.ops.Llm` behave (asserted by TextExpressionsSpec parity).
  */
abstract class TextKernelExpression extends UnaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  /** Fully-qualified static kernel method name spliced into codegen. */
  protected def kernelMethod: String
  protected def kernel(u: org.apache.spark.unsafe.types.UTF8String): ArrayData

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    kernel(child.eval(input).asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val value = ev.value
    ev.copy(
      code = c.code + code"""
        org.apache.spark.sql.catalyst.util.ArrayData $value =
          $kernelMethod(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }
}

case class MinHashSig(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "graft_minhash"
  override protected def kernelMethod: String = "graft.functions.TextKernels.minhashSig"
  override protected def kernel(u: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    TextKernels.minhashSig(u)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class WinnowFingerprints(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "graft_winnow"
  override protected def kernelMethod: String = "graft.functions.TextKernels.winnow"
  override protected def kernel(u: org.apache.spark.unsafe.types.UTF8String): ArrayData =
    TextKernels.winnow(u)
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Column-API surface for the native vector expressions. Routed through
  * the session FunctionRegistry + `call_function` (the public
  * Expression→Column path in Spark 4; `Column(expr)` construction is
  * sql-private). Registration happens lazily per session at
  * plan-construction time — driver-side, once per query, negligible.
  */
object Vec {
  private def ensureRegistered(): SparkSession = {
    val spark = SparkSession.active
    if (!spark.catalog.functionExists("graft_dot")) register(spark)
    spark
  }
  def dot(a: Column, b: Column): Column = {
    ensureRegistered()
    call_function("graft_dot", a, b)
  }
  def l2norm(a: Column): Column = {
    ensureRegistered()
    call_function("graft_l2norm", a)
  }
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
  def minhash(text: Column): Column = {
    ensureRegistered()
    call_function("graft_minhash", text)
  }
  def winnow(text: Column): Column = {
    ensureRegistered()
    call_function("graft_winnow", text)
  }

  private val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("graft_l2norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_l2norm"),
      (es: Seq[Expression]) => L2Norm(es(0))),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (es: Seq[Expression]) => MinHashSig(es(0))),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (es: Seq[Expression]) => WinnowFingerprints(es(0))),
  )

  /** Register `graft_dot` / `graft_l2norm` for SQL use on a live session. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** `SparkSessionExtensions` hook: set
    * `spark.sql.extensions=graft.functions.GraftExtensions` to get the
    * SQL functions in every new session.
    */
  private[functions] def inject(extensions: SparkSessionExtensions): Unit =
    registrations.foreach(extensions.injectFunction)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    Vec.inject(extensions)
    extensions.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.BloomJoinRule)
  }
}
