"""Python authoring surface for the graft pipeline combinators.

The reference (/root/reference/dpp.py) is a Python DSL — its audience
writes pipelines as ``V(x, y) >> fn >> V(a, b)`` expressions composed
with five operators (``common`` / ``all`` / ``branch`` / ``sequence`` /
``select``).  ``graft_py`` exposes the engine's *queries* to Python;
this module restores the reference's *authoring* model: the same
expression algebra and operators, orchestrating ordinary pyspark
DataFrames driver-side (exactly the reference's eager-interpreter
execution model — dpp.py's executors run user fns in the driver too).
Slots hold lazy pyspark DataFrames, so Catalyst still fuses and
optimizes across pipeline steps; nothing executes until an action.

Semantics are pinned to the Scala layer (graft.pipeline.DPP — the
fidelity-tested port), which preserves the reference's quirks
(SURVEY.md §1.3) verbatim:

  1. ``ALL`` expands to the *initial* variable names only — variables
     created mid-pipeline are invisible to it (dpp.py:177, 244-245).
  2. ``ALL`` as an output means "write back to the inputs"
     (dpp.py:263-266).
  3. ``PREV``/``ALL`` are recognized only at position 0 of an input
     list (dpp.py:238, 244); anything after them is dropped by the
     expansion, and a super-symbol at a later position is an error.
  4. ``...`` (Python Ellipsis — the reference's reserved symbol,
     dpp.py:234-235) raises NotImplementedError.
  5. Arity dispatch in branch/sequence/select: equal input/output
     count → map mode, else fan-in (dpp.py:447-450 etc.).
  6. Deviations shared with the Scala layer: ``branch(merge='first')``
     really keeps the first write (the reference's 'first' is broken —
     dpp.py:447-455), and there is no caller-frame injection —
     placeholders come from attribute access on the DPP object
     (``p.docs``), not from ``with`` magic.

Usage::

    from graft_dpp import DPP, V, PREV, ALL, fn

    p = DPP(docs=spark.read.parquet(...))
    p.sequence(
        p.docs >> fn(normalize) >> p.normed,
        PREV >> fn(lang_filter) >> p.kept,
        PREV >> fn(project) >> p.result,
    )
    p["result"]          # the composed (still lazy) DataFrame
"""


class Placeholder:
    """A named variable reference (≙ dpp.py:81-115)."""

    __slots__ = ("name",)

    def __init__(self, name):
        self.name = name

    def __rshift__(self, step_fn):
        return PartialStep([self], _as_fn(step_fn))

    def __repr__(self):
        return f"Ref({self.name})"


class PlaceholderList:
    """``V(x, y, z)`` — an ordered list of refs (≙ dpp.py:118-137)."""

    __slots__ = ("refs",)

    def __init__(self, refs):
        self.refs = list(refs)

    def __rshift__(self, step_fn):
        return PartialStep(self.refs, _as_fn(step_fn))

    def __repr__(self):
        return "V(" + ", ".join(map(repr, self.refs)) + ")"


def V(*refs):
    """``V(x, y, z)`` (≙ dpp.py:630-644)."""
    return PlaceholderList(refs)


class _Super:
    """PREV / ALL super-symbols (≙ dpp.py:142-165)."""

    __slots__ = ("_tag",)

    def __init__(self, tag):
        self._tag = tag

    def __rshift__(self, step_fn):
        return PartialStep([self], _as_fn(step_fn))

    def __repr__(self):
        return self._tag


PREV = _Super("PREV")
ALL = _Super("*ALL*")


class Fn:
    """A labelled step function.  The callable follows the reference's
    duck-typed contract: map mode invokes ``f(value)`` per input/output
    pair; fan-in mode invokes ``f(*values)`` and binds the raw return
    value when there is exactly one output (the 1-output no-unpack
    rule, dpp.py:329-332), else expects a sequence of ``len(outputs)``.
    """

    __slots__ = ("label", "f")

    def __init__(self, label, f):
        self.label = label
        self.f = f

    def __repr__(self):
        return f"fn({self.label})"


def fn(f, label=None):
    """Wrap a callable as a labelled step fn (label defaults to the
    callable's ``__name__``)."""
    if isinstance(f, Fn):
        return f if label is None else Fn(label, f.f)
    return Fn(label or getattr(f, "__name__", "fn"), f)


def _as_fn(step_fn):
    return step_fn if isinstance(step_fn, Fn) else fn(step_fn)


class PartialStep:
    """``inputs >> fn`` — awaiting outputs (≙ dpp.py:12-47)."""

    __slots__ = ("inputs", "fn")

    def __init__(self, inputs, step_fn):
        self.inputs = list(inputs)
        self.fn = step_fn

    def __rshift__(self, out):
        if isinstance(out, PlaceholderList):
            return Step(self.inputs, self.fn, out.refs)
        return Step(self.inputs, self.fn, [out])

    def __repr__(self):
        return f"PartialStep({self.inputs} >> {self.fn.label})"


class Step:
    """``inputs >> fn >> outputs`` — one complete processing unit, the
    IR of the whole system (≙ dpp.py:50-76)."""

    __slots__ = ("inputs", "fn", "outputs")

    def __init__(self, inputs, step_fn, outputs):
        self.inputs = list(inputs)
        self.fn = step_fn
        self.outputs = list(outputs)

    def __repr__(self):
        return f"Step({self.inputs} >> {self.fn.label} >> {self.outputs})"


class CtxView:
    """Read-only context snapshot handed to ``select`` conditions
    (≙ the attribute bag of dpp.py:527-533 — conditions see pre-select
    values).  ``ctx.x`` or ``ctx["x"]``."""

    def __init__(self, vars_):
        object.__setattr__(self, "_vars", dict(vars_))

    def __getattr__(self, name):
        try:
            return self._vars[name]
        except KeyError:
            raise AttributeError(
                f"variable '{name}' does not exist in context") from None

    def __getitem__(self, name):
        if name not in self._vars:
            raise KeyError(f"variable '{name}' does not exist in context")
        return self._vars[name]

    def __contains__(self, name):
        return name in self._vars

    def names(self):
        return list(self._vars)


class DPP:
    """The pipeline orchestrator (≙ dpp.py:170-622, semantics pinned to
    graft.pipeline.DPP).  Construct with initial named slots::

        p = DPP(docs=df_a, refs=df_b)

    Unknown attribute access mints a placeholder (``p.result``);
    ``p["x"]`` reads a slot's current value.
    """

    def __init__(self, **initial):
        # frozen at construction — never grows (dpp.py:177; SURVEY §1.3-1)
        object.__setattr__(self, "_var_names", list(initial))
        object.__setattr__(self, "_context", dict(initial))
        object.__setattr__(self, "_placeholders",
                           {n: Placeholder(n) for n in initial})
        object.__setattr__(self, "_last_outputs", [])
        object.__setattr__(self, "_debug", False)

    # ---- variable access -------------------------------------------

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return self.ref(name)

    def ref(self, name):
        """Mint/fetch the placeholder for a name (≙ dpp.py:613-622)."""
        ph = self._placeholders.get(name)
        if ph is None:
            ph = self._placeholders[name] = Placeholder(name)
        return ph

    def __getitem__(self, name):
        if name not in self._context:
            raise KeyError(f"variable '{name}' does not exist in context")
        return self._context[name]

    def value(self, name):
        return self[name]

    def __contains__(self, name):
        return name in self._context

    def snapshot(self):
        return dict(self._context)

    # ---- symbol resolution (dpp.py:223-266) ------------------------

    def _resolve_inputs(self, inputs):
        head = inputs[0] if inputs else None
        if head is Ellipsis:
            # dpp.py:234-235 — reserved, unimplemented; fail identically
            raise NotImplementedError("... placeholder is not implemented")
        if head is PREV:
            if not self._last_outputs:
                raise RuntimeError("PREV used but there is no previous outputs")
            return list(self._last_outputs)
        if head is ALL:
            # initial var names only (SURVEY §1.3-1, preserved)
            return [self._placeholders[n] for n in self._var_names]
        resolved = []
        for r in inputs:
            if not isinstance(r, Placeholder):
                # the reference also fails here, just later with an
                # opaque AttributeError (SURVEY §1.3-3)
                raise ValueError(
                    f"{r!r} is only recognized at position 0 of an input list")
            resolved.append(r)
        return resolved

    def _resolve_outputs(self, outputs, inputs):
        if outputs and outputs[0] is ALL:
            return list(inputs)  # dpp.py:263-266 — "write back to inputs"
        for r in outputs:
            if not isinstance(r, Placeholder):
                raise ValueError(f"{r!r} cannot be used as an output")
        return list(outputs)

    # ---- executors (dpp.py:268-335) --------------------------------

    def _bind(self, out, value):
        self._context[out.name] = value
        self._placeholders.setdefault(out.name, out)  # NOT _var_names

    def _execute_map(self, inputs, step_fn, outputs):
        if len(inputs) != len(outputs):
            raise ValueError(
                "the parameter number is not match, "
                f"inputs={len(inputs)}, outputs={len(outputs)}")
        results = [step_fn.f(self[i.name]) for i in inputs]
        for out, value in zip(outputs, results):
            self._bind(out, value)
        if self._debug:
            print(f"[MAP] {[i.name for i in inputs]} >> {step_fn.label} "
                  f">> {[o.name for o in outputs]}")

    def _execute_all(self, inputs, step_fn, outputs):
        result = step_fn.f(*[self[i.name] for i in inputs])
        if len(outputs) == 1:
            results = [result]  # 1-output no-unpack (dpp.py:329-332)
        else:
            results = list(result)
            if len(results) != len(outputs):
                raise ValueError(
                    "the parameter number is not match, "
                    f"inputs={len(inputs)}, outputs={len(outputs)}")
        for out, value in zip(outputs, results):
            self._bind(out, value)
        if self._debug:
            print(f"[ALL] {[i.name for i in inputs]} >> {step_fn.label} "
                  f">> {[o.name for o in outputs]}")

    def _dispatch(self, inputs, step_fn, outputs):
        # arity dispatch (dpp.py:447-450 etc.; SURVEY §1.3-5)
        if len(inputs) == len(outputs):
            self._execute_map(inputs, step_fn, outputs)
        else:
            self._execute_all(inputs, step_fn, outputs)

    def _resolve(self, step):
        if not isinstance(step, Step):
            raise ValueError(f"expected a complete Step, got {step!r}")
        inputs = self._resolve_inputs(step.inputs)
        outputs = self._resolve_outputs(step.outputs, inputs)
        return inputs, step.fn, outputs

    # ---- the six public operators (dpp.py:337-584) ------------------

    def common(self, *args):
        """MAP: ``common(V(o,p,q) >> fn >> V(x,y,z))`` ≙ x=fn(o);
        y=fn(p); z=fn(q) (dpp.py:337-376).  Also the 3-arg form
        ``common(inputs, fn, outputs)``."""
        step = self._coerce_step(args)
        inputs, step_fn, outputs = self._resolve(step)
        self._execute_map(inputs, step_fn, outputs)
        self._last_outputs = outputs
        return self

    def all(self, *args):
        """FAN-IN: ``all(V(o,p,q) >> fn >> V(x,y,z))`` ≙
        (x,y,z)=fn(o,p,q) (dpp.py:378-412)."""
        step = self._coerce_step(args)
        inputs, step_fn, outputs = self._resolve(step)
        self._execute_all(inputs, step_fn, outputs)
        self._last_outputs = outputs
        return self

    def branch(self, *steps, merge="last"):
        """N independent steps; ``merge`` ∈ last/first/error resolves
        slot-name conflicts (dpp.py:414-464; 'first' implemented
        correctly — SURVEY §1.3-6)."""
        if merge not in ("last", "first", "error"):
            raise ValueError(f"unknown merge policy {merge!r}")
        all_outputs = []
        written = set()
        for raw in steps:
            inputs, step_fn, outputs = self._resolve(self._coerce_step((raw,)))
            if merge == "error":
                for out in outputs:
                    if out.name in written:
                        raise RuntimeError(
                            f"Variable conflict: {out.name} is written "
                            "in multiple branches")
            if merge == "first":
                # keep-first: execute, but restore already-written slots
                saved = {o.name: self[o.name]
                         for o in outputs if o.name in written}
                self._dispatch(inputs, step_fn, outputs)
                self._context.update(saved)
            else:
                self._dispatch(inputs, step_fn, outputs)
            written.update(o.name for o in outputs)
            all_outputs.extend(outputs)
        self._last_outputs = all_outputs
        if self._debug:
            print(f"[BRANCH] {len(steps)} branches executed")
        return self

    def sequence(self, *steps):
        """Ordered steps; ``PREV`` threads each step's outputs into the
        next (dpp.py:466-505)."""
        for raw in steps:
            inputs, step_fn, outputs = self._resolve(self._coerce_step((raw,)))
            self._dispatch(inputs, step_fn, outputs)
            self._last_outputs = outputs
        if self._debug:
            print(f"[SEQUENCE] {len(steps)} steps executed")
        return self

    def select(self, *branches, default=None):
        """First branch whose condition is true runs; else ``default``
        (dpp.py:507-580).  Branches are ``(step, condition)`` pairs;
        conditions receive a one-time context snapshot (SURVEY §1.3-7)
        and may trigger Spark actions (``ctx.x.count() > 0``) — the one
        sanctioned place orchestration blocks on execution."""
        ctx = CtxView(self._context)  # snapshot BEFORE any condition runs
        chosen = None
        for pair in branches:
            if not isinstance(pair, tuple) or len(pair) != 2:
                raise ValueError("each select branch must be a "
                                 "(step, condition) pair")
            step, condition = pair
            if condition(ctx):
                chosen = step
                break
        if chosen is None:
            chosen = default
        if chosen is not None:
            inputs, step_fn, outputs = self._resolve(self._coerce_step((chosen,)))
            self._dispatch(inputs, step_fn, outputs)
            self._last_outputs = outputs
            if self._debug:
                print("[SELECT] Executed branch")
        return self

    def debug(self, enabled=True):
        self._debug = enabled
        return self

    def materialize(self, names=None):
        """Force the named slots (default: all) with ``count()``
        actions; returns ``{name: row_count}``.  The Scala layer's
        ``DPP.materialize`` adds bounded-pool parallel execution."""
        targets = list(names) if names else list(self._context)
        return {n: self[n].count() for n in targets}

    # ---- plumbing ----------------------------------------------------

    def _coerce_step(self, args):
        """One Step, or the reference's 3-arg (inputs, fn, outputs)
        form (dpp.py:365-368) — inputs/outputs may be a placeholder, a
        ``V(...)``, a super-symbol, or a plain list."""
        if len(args) == 1 and isinstance(args[0], Step):
            return args[0]
        if len(args) == 1 and isinstance(args[0], tuple) and len(args[0]) == 3:
            args = args[0]
        if len(args) == 3:
            return Step(_reflist(args[0]), _as_fn(args[1]), _reflist(args[2]))
        raise ValueError(
            "expected a complete expression (V(..) >> fn >> V(..)) or "
            "(inputs, fn, outputs)")


def _reflist(x):
    if isinstance(x, PlaceholderList):
        return x.refs
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]
