package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, ByteType, DataType, DateType, DoubleType, FloatType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}

/** Whole-operator Catalyst extension showcase: AS-OF JOIN as a native
  * logical+physical operator (the (c) tier of the custom-operator
  * preference order — SURVEY.md §4). Spark has no as-of join node; the
  * engine's default formulation is the union+window rewrite
  * (`Scale.asofJoin`, one shuffle). This node is the alternative the
  * planner tier enables: a co-partitioned streaming MERGE — each side
  * shuffles once on the key, sorts by (key, ts), and one forward pass
  * zips the partitions. No union row-blowup, no window state: O(1)
  * memory per partition, and the physical node declares
  * `requiredChildDistribution`/`requiredChildOrdering` so
  * EnsureRequirements plans exactly the two shuffles — pre-bucketed
  * children plan ZERO shuffles, which the union rewrite can never do.
  *
  * Semantics (identical to `Scale.asofJoin`, asserted in
  * AsofJoinPlanSpec): for every left row, the payload of the LAST right
  * row with the same key and `rightTs <= leftTs`; ties on (key, ts)
  * resolve to the greatest payload; null keys/timestamps never match.
  *
  * `forward = true` flips the direction: the FIRST right row with
  * `rightTs >= leftTs` (the event-study "what happened next" join);
  * ties resolve to the SMALLEST payload (the first row in the required
  * (key, ts, payload) ordering). Still one forward pass with O(1)
  * state: rows skipped for an earlier left row (`rightTs < leftTs`)
  * can never match a later one because left timestamps ascend, and the
  * candidate row itself is NOT consumed — it may match the next left
  * row too.
  *
  * `payloadOut` attributes are produced BY the node (not aliases — the
  * analyzer's CleanupAliases strips Alias from non-Project nodes), the
  * same pattern as Spark's `Generate.generatorOutput`.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payloadIn: Seq[Attribute],
                        payloadOut: Seq[Attribute],
                        forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, pIn, pOut, fwd) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, pIn, pOut, fwd) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        payloadIn: Seq[Attribute],
                        payloadOut: Seq[Attribute],
                        forward: Boolean = false)
  extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  // both sides hash-cluster on the key: EnsureRequirements inserts (at
  // most) one shuffle per side and guarantees co-partitioning — the
  // zipped partitions hold the same key space
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // sorted (key, ts) within partitions; the right side additionally
  // tie-breaks on the payload columns so equal-(key,ts) rows resolve to
  // the greatest payload deterministically under any partitioning
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payloadIn.map(p => SortOrder(p, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    val payloadExprs: Seq[Expression] = payloadIn
    val outAttrs = output
    val pOut = payloadOut
    val lKeyA = leftKey; val lTsA = leftTs
    val rKeyA = rightKey; val rTsA = rightTs
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0,
      "as-of key/ts attributes must come from the respective child")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // the SortMergeJoin recipe, minus the boxing: both sides project
      // (key, ts) into an UnsafeRow once per row, and all merge decisions
      // are GENERATED-ordering compares over those two-column rows — no
      // per-row `row.get(idx, type)` boxing, no interpreted Ordering
      val keyTsOrder = Seq(
        SortOrder(BoundReference(0, keyType, nullable = true), Ascending),
        SortOrder(BoundReference(1, tsType, nullable = true), Ascending))
      val keyTsOrd = RowOrdering.create(keyTsOrder, Seq.empty)
      // same two-column rows, compared on the key column only
      val keyOnlyOrd = RowOrdering.create(keyTsOrder.take(1), Seq.empty)
      val lKeyTsProj = UnsafeProjection.create(Seq[Expression](lKeyA, lTsA), lOut)
      val rKeyTsProj = UnsafeProjection.create(Seq[Expression](rKeyA, rTsA), rOut)
      val payloadProj = UnsafeProjection.create(payloadExprs, rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ pOut)
      val nullPayload = new GenericInternalRow(pOut.length)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rHead: InternalRow = _                 // un-consumed right row
        private var rKeyTs: InternalRow = _                // its (key, ts) projection
        private var lastKeyTs: InternalRow = _             // (key, ts) of lastPayload
        private var lastPayload: InternalRow = _           // greatest payload ≤ current ts
        // null key/ts right rows never match anything: drop them here so
        // the merge loops see only comparable rows
        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTsIdx)) {
              rHead = r
              rKeyTs = rKeyTsProj(r)
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext
        override def next(): InternalRow = {
          val lRow = lIter.next()
          if (lRow.isNullAt(lKeyIdx) || lRow.isNullAt(lTsIdx))
            return outProj(joined(lRow, nullPayload))
          val lKeyTs = lKeyTsProj(lRow)
          if (forward) {
            // skip right rows strictly BEFORE (lk, lt) in key-major
            // order; the first remaining row is the candidate and is
            // NOT consumed — it may also match the next left row
            while (rHead != null && keyTsOrd.compare(rKeyTs, lKeyTs) < 0) advanceRight()
            val m = rHead != null && keyOnlyOrd.compare(rKeyTs, lKeyTs) == 0
            outProj(joined(lRow, if (m) payloadProj(rHead) else nullPayload))
          } else {
            // consume right rows while (rk, rt) <= (lk, lt) — lexicographic
            // compare ≡ rk < lk (discard, key can never match again) OR
            // rk == lk && rt <= lt (payload update)
            while (rHead != null && keyTsOrd.compare(rKeyTs, lKeyTs) <= 0) {
              if (keyOnlyOrd.compare(rKeyTs, lKeyTs) == 0) {
                lastPayload = payloadProj(rHead).copy()
                lastKeyTs = rKeyTs.copy()
              }
              advanceRight()
            }
            val matches = lastPayload != null &&
              keyOnlyOrd.compare(lastKeyTs, lKeyTs) == 0
            outProj(joined(lRow, if (matches) lastPayload else nullPayload))
          }
        }
      }
    }
  }

  // ---- whole-stage codegen -------------------------------------------
  //
  // The SortMergeJoin recipe: the node is the PRODUCER of its stage
  // (children stay behind their sorts, consumed as row iterators via
  // inputRDDs), and the merge loop is generated so its output columns
  // flow straight into the parent's consume() — no JoinedRow, no output
  // UnsafeProjection, no iterator boundary between the join and the
  // aggregation above it. Exactly one output row per left row and O(1)
  // right-side state, so the generated loop is a plain while over the
  // left input with primitive comparisons — far simpler than SMJ's
  // buffered-matches machinery.

  /** Codegen covers the types the gate data and typical time-series
    * carry (primitives, date/time, strings). Anything else falls back
    * to the interpreted merge (identical semantics, AsofJoinPlanSpec).
    */
  override def supportCodegen: Boolean = {
    def ok(dt: DataType): Boolean = dt match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | DateType |
           TimestampType | TimestampNTZType => true
      case _ => false
    }
    ok(leftKey.dataType) && ok(leftTs.dataType) && payloadIn.forall(a => ok(a.dataType))
  }

  // output values reference the current left/right input rows' buffers;
  // copy when a downstream operator buffers whole rows
  override def needCopyResult: Boolean = true

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override protected def doProduce(ctx: CodegenContext): String = {
    val lOut = left.output
    val rOut = right.output
    val lKeyIdx = lOut.indexWhere(_.exprId == leftKey.exprId)
    val lTsIdx = lOut.indexWhere(_.exprId == leftTs.exprId)
    val rKeyIdx = rOut.indexWhere(_.exprId == rightKey.exprId)
    val rTsIdx = rOut.indexWhere(_.exprId == rightTs.exprId)
    val pIdx = payloadIn.map(a => rOut.indexWhere(_.exprId == a.exprId))
    require(lKeyIdx >= 0 && lTsIdx >= 0 && rKeyIdx >= 0 && rTsIdx >= 0 &&
      pIdx.forall(_ >= 0),
      "as-of key/ts/payload attributes must come from the respective child")

    val keyDt = leftKey.dataType
    val tsDt = leftTs.dataType
    val keyJt = CodeGenerator.javaType(keyDt)
    val tsJt = CodeGenerator.javaType(tsDt)
    // values HELD ACROSS right-iterator advances must not alias the
    // iterator's reused row buffer — strings get defensive clones
    def saved(jt: String, v: String): String =
      if (jt == "UTF8String") s"$v.clone()" else v

    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];", forceInline = true)
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];", forceInline = true)
    val rHead = ctx.addMutableState("InternalRow", "asofRHead")
    val rKey = ctx.addMutableState(keyJt, "asofRKey")
    val rTs = ctx.addMutableState(tsJt, "asofRTs")
    val initialized = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofInit")

    // null-key/ts right rows never match: skip them while advancing, so
    // the merge loop only ever sees comparable (key, ts) pairs
    val advance = ctx.addNewFunction("asofAdvanceRight",
      s"""
         |private void asofAdvanceRight() {
         |  $rHead = null;
         |  while ($rightInput.hasNext()) {
         |    InternalRow r = (InternalRow) $rightInput.next();
         |    if (!r.isNullAt($rKeyIdx) && !r.isNullAt($rTsIdx)) {
         |      $rHead = r;
         |      $rKey = ${CodeGenerator.getValue("r", keyDt, rKeyIdx.toString)};
         |      $rTs = ${CodeGenerator.getValue("r", tsDt, rTsIdx.toString)};
         |      return;
         |    }
         |  }
         |}""".stripMargin)

    val lRow = ctx.freshName("asofLeftRow")
    val lKey = ctx.freshName("asofLKey")
    val lTs = ctx.freshName("asofLTs")
    val matched = ctx.freshName("asofMatched")

    // per-output-row payload locals (isNull flag + value), fed to consume()
    val pNull = pIdx.map(_ => ctx.freshName("asofPNull"))
    val pVal = pIdx.map(_ => ctx.freshName("asofPVal"))
    val pJt = payloadIn.map(a => CodeGenerator.javaType(a.dataType))

    val mergeAndPayload = if (forward) {
      // skip right rows strictly BEFORE (lKey, lTs); the survivor is the
      // candidate and is NOT consumed — it may match the next left row.
      // Payload reads straight from the live rHead (no saved state).
      val reads = pIdx.indices.map { i =>
        s"""
           |boolean ${pNull(i)} = true;
           |${pJt(i)} ${pVal(i)} = ${CodeGenerator.defaultValue(payloadIn(i).dataType)};
           |if ($matched && !$rHead.isNullAt(${pIdx(i)})) {
           |  ${pNull(i)} = false;
           |  ${pVal(i)} = ${CodeGenerator.getValue(rHead, payloadIn(i).dataType, pIdx(i).toString)};
           |}""".stripMargin
      }.mkString("\n")
      s"""
         |boolean $matched = false;
         |if (!$lRow.isNullAt($lKeyIdx) && !$lRow.isNullAt($lTsIdx)) {
         |  $keyJt $lKey = ${CodeGenerator.getValue(lRow, keyDt, lKeyIdx.toString)};
         |  $tsJt $lTs = ${CodeGenerator.getValue(lRow, tsDt, lTsIdx.toString)};
         |  while ($rHead != null) {
         |    int kc = ${ctx.genComp(keyDt, rKey, lKey)};
         |    if (kc > 0) break;
         |    if (kc == 0) {
         |      if (${ctx.genComp(tsDt, rTs, lTs)} >= 0) break;
         |    }
         |    $advance();
         |  }
         |  $matched = $rHead != null && ${ctx.genComp(keyDt, rKey, lKey)} == 0;
         |}
         |$reads""".stripMargin
    } else {
      // consume right rows while (rKey, rTs) <= (lKey, lTs), saving the
      // latest same-key payload — state survives across left rows, so
      // the saved values live in (cloned) mutable state
      val lastValid = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofLastValid")
      val lastKey = ctx.addMutableState(keyJt, "asofLastKey")
      val lastPNull = pIdx.map(_ => ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofLastPNull"))
      val lastPVal = pIdx.indices.map(i => ctx.addMutableState(pJt(i), "asofLastPVal"))
      val savePayload = pIdx.indices.map { i =>
        val get = CodeGenerator.getValue(rHead, payloadIn(i).dataType, pIdx(i).toString)
        s"""
           |${lastPNull(i)} = $rHead.isNullAt(${pIdx(i)});
           |if (!${lastPNull(i)}) ${lastPVal(i)} = ${saved(pJt(i), s"($get)")};""".stripMargin
      }.mkString("\n")
      val reads = pIdx.indices.map { i =>
        s"""
           |boolean ${pNull(i)} = !$matched || ${lastPNull(i)};
           |${pJt(i)} ${pVal(i)} = ${pNull(i)}
           |  ? ${CodeGenerator.defaultValue(payloadIn(i).dataType)} : ${lastPVal(i)};""".stripMargin
      }.mkString("\n")
      s"""
         |boolean $matched = false;
         |if (!$lRow.isNullAt($lKeyIdx) && !$lRow.isNullAt($lTsIdx)) {
         |  $keyJt $lKey = ${CodeGenerator.getValue(lRow, keyDt, lKeyIdx.toString)};
         |  $tsJt $lTs = ${CodeGenerator.getValue(lRow, tsDt, lTsIdx.toString)};
         |  while ($rHead != null) {
         |    int kc = ${ctx.genComp(keyDt, rKey, lKey)};
         |    if (kc > 0) break;
         |    if (kc == 0) {
         |      if (${ctx.genComp(tsDt, rTs, lTs)} > 0) break;
         |      $savePayload
         |      $lastValid = true;
         |      $lastKey = ${saved(keyJt, rKey)};
         |    }
         |    $advance();
         |  }
         |  $matched = $lastValid && ${ctx.genComp(keyDt, lastKey, lKey)} == 0;
         |}
         |$reads""".stripMargin
    }

    // left columns evaluate off the current left row; payload columns
    // are the locals declared above
    ctx.INPUT_ROW = lRow
    ctx.currentVars = null
    val leftVars = lOut.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    val payloadVars = pIdx.indices.map { i =>
      ExprCode(code"", JavaCode.isNullVariable(pNull(i)),
        JavaCode.variable(pVal(i), payloadIn(i).dataType))
    }
    // emits each var's evaluation ONCE and clears its code so consume()
    // does not re-declare the same locals downstream
    val leftVarDecl = evaluateVariables(leftVars)

    s"""
       |if (!$initialized) {
       |  $initialized = true;
       |  $advance();
       |}
       |while ($leftInput.hasNext()) {
       |  InternalRow $lRow = (InternalRow) $leftInput.next();
       |  $mergeAndPayload
       |  $leftVarDecl
       |  ${consume(ctx, leftVars ++ payloadVars)}
       |  if (shouldStop()) return;
       |}""".stripMargin
  }
}

/** DataFrame-level API for the native as-of join (no SQL syntax exists
  * for it). Registers the planner strategy once per session via the
  * public `spark.experimental.extraStrategies` hook (GraftExtensions
  * also injects it for spark-submit deployments).
  */
object Asof {
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(AsofJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsofJoinStrategy
  }

  /** `left` gains `asof_<c>` columns holding, per row, payload column
    * `c` of the last `right` row with the same `key` and
    * `right.ts <= left.ts` (nulls when no such row). With
    * `forward = true`: the FIRST right row with `right.ts >= left.ts`.
    */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, payloadCols: Seq[String],
           forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the whole right side: the two inputs may share a
    // source (self-as-of), and duplicate ids across subtrees would make
    // attribute binding ambiguous
    val rPlan = Project(
      right.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      right.queryExecution.analyzed)
    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${out.map(_.name)}"))
    val rOut = rPlan.output
    // AsofJoinExec builds its interpreted key/ts orderings from the LEFT
    // types only — a type mismatch would surface as a ClassCastException
    // deep inside the merge iterator; fail at plan time instead
    val (lKeyA, rKeyA) = (attr(lPlan.output, key), attr(rOut, key))
    val (lTsA, rTsA) = (attr(lPlan.output, leftTs), attr(rOut, rightTs))
    require(lKeyA.dataType == rKeyA.dataType,
      s"as-of key type mismatch: left $key is ${lKeyA.dataType}, right $key is ${rKeyA.dataType}")
    require(lTsA.dataType == rTsA.dataType,
      s"as-of ts type mismatch: left $leftTs is ${lTsA.dataType}, right $rightTs is ${rTsA.dataType}")
    val payloadIn = payloadCols.map(c => attr(rOut, c))
    val payloadOut = payloadIn.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val node = AsofJoinNode(lPlan, rPlan,
      lKeyA, rKeyA, lTsA, rTsA,
      payloadIn, payloadOut, forward)
    GraftSqlBridge.ofRows(spark, node)
  }
}
