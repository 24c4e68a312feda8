package graft.pipeline

import scala.collection.mutable
import scala.language.dynamics

import org.apache.spark.sql.DataFrame

/** Read-only snapshot of the context handed to `select` conditions.
  * Mirrors the attribute-bag snapshot of dpp.py:527-533 — conditions see
  * pre-select values (SURVEY.md §1.3-7). `ctx.x` via `Dynamic`, or
  * `ctx("x")`.
  */
final class CtxView(private val vars: Map[String, DataFrame]) extends Dynamic {
  def selectDynamic(name: String): DataFrame = apply(name)
  def apply(name: String): DataFrame =
    vars.getOrElse(name, throw new NoSuchElementException(s"variable '$name' does not exist in context"))
  def contains(name: String): Boolean = vars.contains(name)
  def names: Seq[String] = vars.keys.toSeq
}

/** The pipeline-orchestration engine — a faithful Scala re-expression of
  * the reference's `DPP` class (/root/reference/dpp.py:170-622), re-typed
  * over Spark `DataFrame` slots.
  *
  * Semantics preserved verbatim (SURVEY.md §1.3):
  *   1. `All` expands to the *initial* variable names only — variables
  *      created mid-pipeline are invisible to it (dpp.py:177, 244-245).
  *   2. `All` as an output list means "write back to the inputs"
  *      (dpp.py:263-266).
  *   3. `Prev`/`All` are recognized only at position 0 of an input list
  *      (dpp.py:238, 244). Elsewhere they are an error (the reference
  *      crashes too, just later).
  *   5. Arity-based mode dispatch in branch/sequence/select:
  *      `inputs.size == outputs.size` → map mode, else fan-in
  *      (dpp.py:447-450, 495-498, 550-553, 570-573).
  *   7. `select` snapshots the context once before evaluating conditions
  *      (dpp.py:527-533).
  *
  * Deliberate fixes / deviations (documented in SURVEY.md §1.3-4/-6):
  *   - `branch(Merge.First)` actually keeps the first write (the
  *     reference's 'first' is broken — dpp.py:447-455).
  *   - No caller-frame injection: `dpp.x` (Scala `Dynamic`) returns a
  *     `Ref`; `dpp("x")` returns the slot's DataFrame value. The
  *     reference overloads the same attribute access on with-block state
  *     (dpp.py:586-622), which has no CPython-free equivalent.
  *
  * Orchestration is eager (step order, select conditions) but every slot
  * holds a *lazy* DataFrame, so Catalyst fuses and optimizes across
  * pipeline steps and nothing executes until an action — the key
  * difference from the reference's fully-materializing interpreter
  * (dpp.py:268-335), and what makes pipelines built from this layer run
  * at cluster scale.
  */
final class DPP private (initial: Seq[(String, DataFrame)]) extends Dynamic {

  /** Frozen at construction — never grows (dpp.py:177; SURVEY §1.3-1). */
  private val varNames: Vector[String] = initial.map(_._1).toVector

  private val context: mutable.LinkedHashMap[String, DataFrame] =
    mutable.LinkedHashMap(initial: _*)

  private val placeholders: mutable.LinkedHashMap[String, Ref] =
    mutable.LinkedHashMap(varNames.map(n => n -> Ref(n)): _*)

  private var lastOutputs: Seq[Ref] = Nil
  private var debugEnabled = false

  // ---- variable access ------------------------------------------------

  /** `dpp.x` — mint/fetch a Ref for a name (≙ dpp.py:613-622 inside the
    * with-block; unknown names create new placeholders).
    */
  def selectDynamic(name: String): Ref = ref(name)

  def ref(name: String): Ref = placeholders.getOrElseUpdate(name, Ref(name))

  /** `dpp("x")` — the slot's current DataFrame (≙ dpp.py:608-611 outside
    * the with-block).
    */
  def apply(name: String): DataFrame =
    context.getOrElse(name, throw new NoSuchElementException(s"variable '$name' does not exist in context"))

  def value(name: String): DataFrame = apply(name)
  def contains(name: String): Boolean = context.contains(name)
  def snapshot: Map[String, DataFrame] = context.toMap

  // ---- symbol resolution (dpp.py:223-266) -----------------------------

  private def resolveInputs(inputs: Seq[RefLike]): Seq[Ref] = inputs.headOption match {
    case Some(Ellipsis) =>
      // dpp.py:234-235 — reserved, unimplemented; fail identically
      throw new NotImplementedError("... placeholder is not implemented")
    case Some(Prev) =>
      // dpp.py:238-241
      if (lastOutputs.isEmpty)
        throw new IllegalStateException("PREV used but there is no previous outputs")
      lastOutputs
    case Some(All) =>
      // dpp.py:244-245 — initial var names only (SURVEY §1.3-1, preserved)
      varNames.map(placeholders(_))
    case _ =>
      inputs.map {
        case r: Ref => r
        case other =>
          // The reference also fails here, just later with an opaque
          // AttributeError (SURVEY §1.3-3).
          throw new IllegalArgumentException(
            s"$other is only recognized at position 0 of an input list")
      }
  }

  private def resolveOutputs(outputs: Seq[RefLike], inputs: Seq[Ref]): Seq[Ref] =
    outputs.headOption match {
      case Some(All) => inputs // dpp.py:263-266 — "write back to inputs"
      case _ =>
        outputs.map {
          case r: Ref => r
          case other =>
            throw new IllegalArgumentException(s"$other cannot be used as an output")
        }
    }

  // ---- executors (dpp.py:268-335) -------------------------------------

  private def executeMap(inputs: Seq[Ref], fn: StepFn, outputs: Seq[Ref]): Unit = {
    if (inputs.size != outputs.size)
      throw new IllegalArgumentException(
        s"the parameter number is not match, inputs=${inputs.size}, outputs=${outputs.size}")
    val f = fn match {
      case MapFn(_, f) => f
      case _: FanInFn =>
        throw new IllegalArgumentException(
          "map mode requires a unary DataFrame => DataFrame function " +
            "(a Seq[DataFrame] => Seq[DataFrame] fan-in fn was given)")
    }
    val results = inputs.map(in => f(apply(in.name)))
    outputs.lazyZip(results).foreach { (out, df) =>
      context(out.name) = df
      placeholders.getOrElseUpdate(out.name, out) // dpp.py:291-293 — NOT varNames
    }
    if (debugEnabled)
      println(s"[MAP] ${inputs.map(_.name)} >> ${fn.label} >> ${outputs.map(_.name)}")
  }

  private def executeAll(inputs: Seq[Ref], fn: StepFn, outputs: Seq[Ref]): Unit = {
    val values = inputs.map(in => apply(in.name))
    val results: Seq[DataFrame] = fn match {
      case FanInFn(_, f) => f(values)
      case MapFn(_, f) =>
        // A unary fn in fan-in mode is valid iff there is exactly one
        // input (the reference's fn(*values) duck-typing, dpp.py:314).
        if (values.size != 1)
          throw new IllegalArgumentException(
            s"fan-in mode with a unary fn requires exactly 1 input, got ${values.size}")
        Seq(f(values.head))
    }
    if (results.size != outputs.size)
      throw new IllegalArgumentException(
        s"the parameter number is not match, inputs=${inputs.size}, outputs=${outputs.size}")
    outputs.lazyZip(results).foreach { (out, df) =>
      context(out.name) = df
      placeholders.getOrElseUpdate(out.name, out)
    }
    if (debugEnabled)
      println(s"[ALL] ${inputs.map(_.name)} >> ${fn.label} >> ${outputs.map(_.name)}")
  }

  /** Arity dispatch used by branch/sequence/select (dpp.py:447-450 etc.;
    * SURVEY §1.3-5): equal arity → map, else fan-in.
    */
  private def dispatch(inputs: Seq[Ref], fn: StepFn, outputs: Seq[Ref]): Unit =
    if (inputs.size == outputs.size) executeMap(inputs, fn, outputs)
    else executeAll(inputs, fn, outputs)

  private def resolve(step: Step): (Seq[Ref], StepFn, Seq[Ref]) = {
    val in = resolveInputs(step.inputs)
    val out = resolveOutputs(step.outputs, in)
    (in, step.fn, out)
  }

  // ---- the six public operators (dpp.py:337-584) -----------------------

  /** MAP: `common(V(o,p,q) >> fn >> V(x,y,z))` ≙ x=fn(o); y=fn(p); z=fn(q)
    * (dpp.py:337-376).
    */
  def common(step: Step): DPP = {
    val (in, fn, out) = resolve(step)
    executeMap(in, fn, out)
    lastOutputs = out
    this
  }

  /** 3-arg form: `common(inputs, fn, outputs)` (dpp.py:365-368). */
  def common(inputs: Seq[RefLike], fn: StepFn, outputs: Seq[RefLike]): DPP =
    common(Step(inputs, fn, outputs))

  /** FAN-IN: `all(V(o,p,q) >> fn >> V(x,y,z))` ≙ (x,y,z)=fn(o,p,q)
    * (dpp.py:378-412).
    */
  def all(step: Step): DPP = {
    val (in, fn, out) = resolve(step)
    executeAll(in, fn, out)
    lastOutputs = out
    this
  }

  def all(inputs: Seq[RefLike], fn: StepFn, outputs: Seq[RefLike]): DPP =
    all(Step(inputs, fn, outputs))

  /** BRANCH: N independent steps; conflict policy on slot-name writes
    * (dpp.py:414-464). `Merge.First` is the fixed implementation
    * (SURVEY §1.3-6). In Spark the branches are independent lineages of
    * the same DAG — downstream actions on them can genuinely run in
    * parallel, unlike the reference's sequential-only loop (dpp.py:435).
    */
  def branch(steps: Step*): DPP = branch(Merge.Last)(steps: _*)

  def branch(merge: Merge)(steps: Step*): DPP = {
    val allOutputs = mutable.ArrayBuffer.empty[Ref]
    val written = mutable.Set.empty[String]
    steps.foreach { step =>
      val (in, fn, out) = resolve(step)
      if (merge == Merge.Error)
        out.foreach { o =>
          if (written.contains(o.name))
            throw new IllegalStateException(
              s"Variable conflict: ${o.name} is written in multiple branches")
        }
      if (merge == Merge.First) {
        // keep-first: execute, but drop writes to already-written slots
        val saved = out.collect {
          case o if written.contains(o.name) => o.name -> apply(o.name)
        }.toMap
        dispatch(in, fn, out)
        saved.foreach { case (n, df) => context(n) = df }
      } else {
        dispatch(in, fn, out)
      }
      out.foreach(o => written += o.name)
      allOutputs ++= out
    }
    lastOutputs = allOutputs.toVector
    if (debugEnabled) println(s"[BRANCH] ${steps.size} branches executed")
    this
  }

  /** SEQUENCE: ordered steps; `Prev` threads each step's outputs into the
    * next (dpp.py:466-505).
    */
  def sequence(steps: Step*): DPP = {
    steps.foreach { step =>
      val (in, fn, out) = resolve(step)
      dispatch(in, fn, out)
      lastOutputs = out
    }
    if (debugEnabled) println(s"[SEQUENCE] ${steps.size} steps executed")
    this
  }

  /** SELECT: first branch whose condition is true runs; else `default`
    * (dpp.py:507-580). Conditions receive a one-time context snapshot
    * (SURVEY §1.3-7) and may trigger Spark actions (e.g.
    * `ctx("x").count() > 0`) — the one sanctioned place orchestration
    * blocks on execution.
    */
  def select(branches: (Step, CtxView => Boolean)*): DPP =
    select(branches, default = None)

  def select(branches: Seq[(Step, CtxView => Boolean)], default: Step): DPP =
    select(branches, Some(default))

  def select(branches: Seq[(Step, CtxView => Boolean)], default: Option[Step]): DPP = {
    val ctx = new CtxView(context.toMap) // snapshot BEFORE any condition runs
    val chosen = branches.find { case (_, cond) => cond(ctx) }
    chosen match {
      case Some((step, _)) =>
        val (in, fn, out) = resolve(step)
        dispatch(in, fn, out)
        lastOutputs = out
        if (debugEnabled) println(s"[SELECT] Executed branch")
      case None =>
        default.foreach { step =>
          val (in, fn, out) = resolve(step)
          dispatch(in, fn, out)
          lastOutputs = out
          if (debugEnabled) println(s"[SELECT] Executed default branch")
        }
    }
    this
  }

  def debug(enabled: Boolean = true): DPP = { debugEnabled = enabled; this }

  /** Force the named slots (default: all) with Spark actions, returning
    * row counts. With `parallel = true` the actions run CONCURRENTLY on
    * the scheduler — the true parallelism the reference's `branch` only
    * documents (its loop is sequential, dpp.py:414 "并行" vs 435-457):
    * independent lineages of the Spark DAG genuinely execute at the same
    * time, sharing executors.
    */
  def materialize(
      names: Seq[String] = Nil,
      parallel: Boolean = true,
      timeout: scala.concurrent.duration.Duration = scala.concurrent.duration.Duration(24, "hours"),
      maxConcurrency: Int = 8): Map[String, Long] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    val targets = if (names.isEmpty) context.keys.toVector else names.toVector
    if (parallel && targets.size > 1) {
      // Dedicated bounded pool, not ExecutionContext.global: the global
      // pool is shared process-wide and can starve when many slots (or
      // other libraries) materialize at once; and a finite default
      // timeout means a hung Spark action surfaces as a TimeoutException
      // instead of deadlocking the caller forever.
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxConcurrency, targets.size))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      // job group so a timeout can cancel the in-flight Spark actions —
      // plain shutdown() would let the hung count() jobs keep burning
      // cluster resources behind the caller's back
      val jobGroup = s"graft-dpp-materialize-${System.identityHashCode(this)}"
      val sc = context.headOption.map(_._2.sparkSession.sparkContext)
      try {
        val fs = targets.map(n => Future {
          sc.foreach(_.setJobGroup(jobGroup, s"DPP.materialize($n)", interruptOnCancel = true))
          n -> apply(n).count()
        })
        Await.result(Future.sequence(fs), timeout).toMap
      } catch {
        case e: java.util.concurrent.TimeoutException =>
          sc.foreach(_.cancelJobGroup(jobGroup))
          pool.shutdownNow()
          throw e
      } finally pool.shutdown()
    } else {
      targets.map(n => n -> apply(n).count()).toMap
    }
  }
}

object DPP {
  /** `DPP("x" -> df, ...)` ≙ `DPP(x=..., ...)` (dpp.py:171-183). */
  def apply(initial: (String, DataFrame)*): DPP = new DPP(initial.toVector)
  def apply(initial: Map[String, DataFrame]): DPP = new DPP(initial.toVector)
}
