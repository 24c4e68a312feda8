"""Semantics tests for graft_dpp — the Python authoring surface.

Pure Python (no JVM): slots hold Any, exactly like the reference's
context (dpp.py:178), so every combinator law the Scala PipelineSpec
pins is checkable here with scalars.  Run: ``python3 test_graft_dpp.py``.
"""
import sys

from graft_dpp import ALL, DPP, PREV, V, fn

PASS = 0


def check(name, cond):
    global PASS
    if not cond:
        print(f"FAIL {name}")
        sys.exit(1)
    PASS += 1


def raises(name, exc, thunk):
    try:
        thunk()
    except exc:
        check(name, True)
        return
    check(name, False)


# --- reference test.py replicated: ALL >> fn >> ALL in-place update ----
p = DPP(x=1, y=2, z=3)
p.common(ALL >> fn(lambda v: v + 1) >> ALL)
check("test.py increment", (p["x"], p["y"], p["z"]) == (2, 3, 4))

# --- common: map semantics, arity enforced -----------------------------
p = DPP(o=10, q=20)
p.common(V(p.o, p.q) >> fn(lambda v: v * 2) >> V(p.a, p.b))
check("common map", (p["a"], p["b"]) == (20, 40))
raises("common arity", ValueError,
       lambda: p.common(V(p.o, p.q) >> fn(lambda v: v) >> V(p.c)))

# --- all: fan-in, tuple unpack + 1-output no-unpack --------------------
p = DPP(x=2, y=3)
p.all(V(p.x, p.y) >> fn(lambda a, b: (a + b, a * b)) >> V(p.s, p.m))
check("all fan-in unpack", (p["s"], p["m"]) == (5, 6))
p.all(V(p.x, p.y) >> fn(lambda a, b: (a, b)) >> V(p.pair))
check("all 1-output no-unpack", p["pair"] == (2, 3))

# --- PREV threads through a sequence -----------------------------------
p = DPP(x=1)
p.sequence(
    p.x >> fn(lambda v: v + 1) >> p.a,
    PREV >> fn(lambda v: v * 10) >> p.b,
    PREV >> fn(lambda v: v - 5) >> p.c,
)
check("sequence PREV", (p["a"], p["b"], p["c"]) == (2, 20, 15))

# --- PREV before any step is an error ----------------------------------
raises("PREV unset", RuntimeError,
       lambda: DPP(x=1).common(PREV >> fn(lambda v: v) >> DPP(x=1).y))

# --- ALL = initial vars only (SURVEY §1.3-1) ----------------------------
p = DPP(x=1, y=2)
p.common(p.x >> fn(lambda v: v + 100) >> p.z)   # z created mid-pipeline
p.all(ALL >> fn(lambda *vs: sum(vs)) >> p.total)
check("ALL initial-only", p["total"] == 3)       # x+y, z invisible

# --- super-symbols only at position 0 (SURVEY §1.3-3) -------------------
p = DPP(x=1, y=2)
raises("PREV at position 1", ValueError,
       lambda: p.common(V(p.x, PREV) >> fn(lambda v: v) >> V(p.a, p.b)))
raises("ALL as one output among many", ValueError,
       lambda: p.common(V(p.x, p.y) >> fn(lambda v: v) >> V(p.a, ALL)))

# --- Ellipsis reserved (dpp.py:234-235) ---------------------------------
raises("... unimplemented", NotImplementedError,
       lambda: DPP(x=1).common(V(...) >> fn(lambda v: v) >> V(DPP(x=1).y)))

# --- branch merge policies ----------------------------------------------
def wins(tag):
    return fn(lambda v: tag, label=tag)

p = DPP(x=0)
p.branch(p.x >> wins("first") >> p.out, p.x >> wins("second") >> p.out)
check("branch merge=last", p["out"] == "second")
p = DPP(x=0)
p.branch(p.x >> wins("first") >> p.out, p.x >> wins("second") >> p.out,
         merge="first")
check("branch merge=first (fixed)", p["out"] == "first")
p = DPP(x=0)
raises("branch merge=error", RuntimeError,
       lambda: p.branch(p.x >> wins("a") >> p.out,
                        p.x >> wins("b") >> p.out, merge="error"))

# --- branch arity dispatch: unequal arity → fan-in ----------------------
p = DPP(x=1, y=2)
p.branch(V(p.x, p.y) >> fn(lambda a, b: a + b) >> p.sum1)
check("branch fan-in dispatch", p["sum1"] == 3)

# --- select: first true wins, snapshot, default -------------------------
p = DPP(x=5)
p.select(
    (p.x >> fn(lambda v: "neg") >> p.r, lambda ctx: ctx.x < 0),
    (p.x >> fn(lambda v: "pos") >> p.r, lambda ctx: ctx.x > 0),
)
check("select first-true", p["r"] == "pos")
p = DPP(x=0)
p.select(
    (p.x >> fn(lambda v: "neg") >> p.r, lambda ctx: ctx.x < 0),
    default=p.x >> fn(lambda v: "zero") >> p.r,
)
check("select default", p["r"] == "zero")

# select conditions see the PRE-select snapshot even if a branch writes
p = DPP(x=1)
seen = []
p.select(
    (p.x >> fn(lambda v: 99) >> p.x, lambda ctx: (seen.append(ctx.x), True)[1]),
    (p.x >> fn(lambda v: -1) >> p.x, lambda ctx: (seen.append(ctx.x), False)[1]),
)
check("select snapshot", seen == [1] and p["x"] == 99)

# --- 3-arg forms ---------------------------------------------------------
p = DPP(x=7)
p.common([p.x], lambda v: v * 3, [p.t])
check("common 3-arg", p["t"] == 21)
p.all(V(p.x, p.t), lambda a, b: a + b, p.u)
check("all 3-arg", p["u"] == 28)

print(f"ALL OK ({PASS} checks)")
