package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Symbolic-reference algebra of the pipeline DSL.
  *
  * Mirrors the reference's expression layer (/root/reference/dpp.py:12-165):
  *   - `Ref`      ≙ `Placeholder`        (dpp.py:81-115)
  *   - `Refs`/`V` ≙ `PlaceholderList`/`V` (dpp.py:118-137, 630-644)
  *   - `All`      ≙ `ALL` super-symbol    (dpp.py:142-149, 164)
  *   - `Prev`     ≙ `PREV` super-symbol   (dpp.py:152-161, 165)
  *   - `PartialStep` ≙ `PartialExpression` (dpp.py:12-47)
  *   - `Step`        ≙ `CompleteExpression` (dpp.py:50-76)
  *
  * Deviation from the reference (deliberate, SURVEY.md §1.3-4): no caller
  * frame injection — refs come from `DPP.ref("x")` / dynamic `dpp.x`.
  *
  * A variable slot holds a (lazy) Spark `DataFrame` instead of `Any`; step
  * functions are `DataFrame => DataFrame` (map mode) or
  * `Seq[DataFrame] => Seq[DataFrame]` (fan-in mode), so Catalyst sees the
  * whole composed logical plan and optimizes across pipeline steps.
  */
sealed trait RefLike {

  /** `x >> fn` — starts a step (dpp.py:100-112, 146-147, 157-158). */
  def >>(fn: StepFn): PartialStep = PartialStep(Seq(this), fn)
}

/** A named variable reference (dpp.py:81-115). */
final case class Ref(name: String) extends RefLike {
  override def toString: String = s"Ref($name)"
}

/** "All current variables" super-symbol (dpp.py:142-149). */
case object All extends RefLike { override def toString = "*ALL*" }

/** "Previous step's outputs" super-symbol (dpp.py:152-161). */
case object Prev extends RefLike { override def toString = "PREV" }

/** The reference's reserved `...` symbol — declared but unimplemented
  * (dpp.py:234-235 raises NotImplementedError; README.md:264 lists it as
  * future work). Preserved faithfully: resolving it raises.
  */
case object Ellipsis extends RefLike { override def toString = "..." }

/** `V(x, y, z)` — an ordered list of refs (dpp.py:630-644). */
final case class Refs(refs: Seq[RefLike]) {
  def >>(fn: StepFn): PartialStep = PartialStep(refs, fn)
  override def toString: String = refs.mkString("V(", ", ", ")")
}

object V { def apply(refs: RefLike*): Refs = Refs(refs.toVector) }

/** A step function. Map mode applies a unary transform per zipped
  * input/output pair (dpp.py:268-296); fan-in mode consumes all inputs at
  * once and yields all outputs (dpp.py:298-335).
  */
sealed trait StepFn { def label: String }

final case class MapFn(label: String, f: DataFrame => DataFrame) extends StepFn
final case class FanInFn(label: String, f: Seq[DataFrame] => Seq[DataFrame]) extends StepFn

object MapFn {
  def apply(f: DataFrame => DataFrame): MapFn = MapFn("fn", f)
}
object FanInFn {
  def apply(f: Seq[DataFrame] => Seq[DataFrame]): FanInFn = FanInFn("fn", f)
  /** Fan-in producing a single output slot (the common case: a join/union). */
  def one(label: String)(f: Seq[DataFrame] => DataFrame): FanInFn =
    FanInFn(label, dfs => Seq(f(dfs)))
}

object StepFn {
  import scala.language.implicitConversions
  implicit def fromUnary(f: DataFrame => DataFrame): StepFn = MapFn("fn", f)
  implicit def fromFanIn(f: Seq[DataFrame] => Seq[DataFrame]): StepFn = FanInFn("fn", f)
}

/** `[inputs] >> fn` — awaiting outputs (dpp.py:12-47). */
final case class PartialStep(inputs: Seq[RefLike], fn: StepFn) {
  /** `>> out` completes the step (dpp.py:32-44). */
  def >>(out: RefLike): Step = Step(inputs, fn, Seq(out))
  def >>(outs: Refs): Step = Step(inputs, fn, outs.refs)
  override def toString: String = s"PartialStep($inputs >> ${fn.label})"
}

/** `[inputs] >> fn >> [outputs]` — one complete processing unit, the IR of
  * the whole system (dpp.py:50-76).
  */
final case class Step(inputs: Seq[RefLike], fn: StepFn, outputs: Seq[RefLike]) {
  override def toString: String = s"Step($inputs >> ${fn.label} >> $outputs)"
}

/** Merge policy for `branch` slot-name conflicts (dpp.py:414-423).
  * `First` is implemented *correctly* here (the reference's 'first' is
  * broken — it writes before checking, dpp.py:447-455; SURVEY.md §1.3-6
  * mandates the fix).
  */
sealed trait Merge
object Merge {
  case object Last extends Merge
  case object First extends Merge
  case object Error extends Merge
}
