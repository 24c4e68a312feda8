package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference's executable spec — test.py:1-7 and every README
  * worked example (/root/reference/README.md:23-57, 120-128, 137-171,
  * 196-204) — over 1-row DataFrames, plus the SURVEY.md §1.3 edge cases.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** A scalar slot = a 1-row, 1-col DataFrame named `value`. */
  def scalarS(v: String): DataFrame = Seq(v).toDF("value")
  def scalarI(v: Int): DataFrame = Seq(v).toDF("value")
  def readInt(df: DataFrame): Int = df.head().get(0).toString.toInt

  /** int(v) cast — README.md:26-43. */
  val toInt: StepFn = fn("toInt")(_.select(col("value").cast("int").as("value")))
  /** int(v) + 1 — test.py:4-6. */
  val intInc: StepFn = fn("intInc")(_.select((col("value").cast("int") + 1).as("value")))
  /** int(v) - 1. */
  val intDec: StepFn = fn("intDec")(_.select((col("value").cast("int") - 1).as("value")))
  val identityFn: StepFn = fn("id")(df => df)

  def p3: DPP = DPP("x" -> scalarS("4"), "y" -> scalarS("2"), "z" -> scalarS("42"))

  // ---- test.py:1-7 ----------------------------------------------------
  test("test.py: common(ALL >> int+1 >> ALL) increments every initial var in place") {
    val p = p3
    p.common(All >> intInc >> All)
    assert(readInt(p("x")) == 5)
    assert(readInt(p("y")) == 3)
    assert(readInt(p("z")) == 43)
  }

  // ---- README.md:26-43 basic tuple syntax -----------------------------
  test("README basic: common((x,y,z), int, (x,y,z)) casts in place") {
    val p = p3
    p.common(Seq(p.x, p.y, p.z), toInt, Seq(p.x, p.y, p.z))
    assert(readInt(p("x")) == 4)
    assert(readInt(p("y")) == 2)
    assert(readInt(p("z")) == 42)
  }

  // ---- README.md:49-57 expression syntax ------------------------------
  test("README >>: common(V(x,y,z) >> int >> V(x,y,z))") {
    val p = p3
    p.common(V(p.x, p.y, p.z) >> toInt >> V(p.x, p.y, p.z))
    assert(readInt(p("y")) == 2)
  }

  // ---- README.md:149-155 fan-in: result = add(x, y) -------------------
  test("README all: x=10, y=20 => result=30") {
    val p = DPP("x" -> scalarI(10), "y" -> scalarI(20))
    val add = fanIn1("add") { case Seq(a, b) =>
      a.crossJoin(b.withColumnRenamed("value", "v2"))
        .select((col("value") + col("v2")).as("value"))
    }
    p.all(V(p.x, p.y) >> add >> p.result)
    assert(readInt(p("result")) == 30)
    assert(readInt(p("x")) == 10)
    assert(readInt(p("y")) == 20)
  }

  // ---- README.md:98-114 sequence + PREV -------------------------------
  test("sequence threads PREV through steps") {
    val p = DPP("data" -> scalarI(1))
    p.sequence(
      p.data >> intInc >> p.cleaned,
      Prev >> intInc >> p.features,
      Prev >> intInc >> p.result,
    )
    assert(readInt(p("cleaned")) == 2)
    assert(readInt(p("features")) == 3)
    assert(readInt(p("result")) == 4)
  }

  test("PREV resolves to the previous step's output list") {
    val p = p3
    p.common(V(p.x, p.y) >> intInc >> V(p.a, p.b))
    p.common(Prev >> intInc >> V(p.c, p.d))
    assert(readInt(p("c")) == 6)  // x=4 -> a=5 -> c=6
    assert(readInt(p("d")) == 4)  // y=2 -> b=3 -> d=4
  }

  // ---- SURVEY §1.3-1: ALL = initial vars only -------------------------
  test("ALL expands to INITIAL variables only (preserved reference quirk)") {
    val p = DPP("x" -> scalarI(1))
    p.common(p.x >> intInc >> p.fresh) // creates 'fresh' mid-pipeline
    p.common(All >> intInc >> All)     // must touch only x
    assert(readInt(p("x")) == 2)
    assert(readInt(p("fresh")) == 2)   // untouched (would be 3 if ALL saw it)
  }

  // ---- SURVEY §1.3-2: ALL as output = write back to inputs ------------
  test("ALL as output writes back to the resolved inputs") {
    val p = DPP("x" -> scalarI(7))
    p.common(p.x >> intInc >> All)
    assert(readInt(p("x")) == 8)
  }

  // ---- errors ---------------------------------------------------------
  test("PREV before any step raises") {
    val p = p3
    val e = intercept[IllegalStateException] { p.common(Prev >> intInc >> p.out) }
    assert(e.getMessage.contains("PREV used but there is no previous outputs"))
  }

  test("map arity mismatch raises with the reference's message") {
    val p = p3
    val e = intercept[IllegalArgumentException] {
      p.common(V(p.x, p.y) >> intInc >> p.onlyOne)
    }
    assert(e.getMessage.contains("the parameter number is not match"))
  }

  test("fan-in output count mismatch raises") {
    val p = p3
    val e = intercept[IllegalArgumentException] {
      p.all(V(p.x, p.y) >> fanIn("two") { case Seq(a, b) => Seq(a, b) } >> p.one)
    }
    assert(e.getMessage.contains("the parameter number is not match"))
  }

  test("equal-arity fan-in is unreachable in sequence (reference quirk §1.3-5)") {
    val p = p3
    // 2 in, 2 out → sequence dispatches to MAP mode, which rejects a fan-in fn,
    // mirroring the reference where fn(*values) would crash on a single arg.
    intercept[IllegalArgumentException] {
      p.sequence(V(p.x, p.y) >> fanIn("swap") { case Seq(a, b) => Seq(b, a) } >> V(p.x, p.y))
    }
  }

  // ---- branch ---------------------------------------------------------
  test("branch Merge.Last: later branch overwrites") {
    val p = DPP("x" -> scalarI(1))
    p.branch(
      p.x >> intInc >> p.w,  // w = 2
      p.x >> intDec >> p.w,  // w = 0 overwrites
    )
    assert(readInt(p("w")) == 0)
  }

  test("branch Merge.First keeps the first write (fixed vs broken reference 'first')") {
    val p = DPP("x" -> scalarI(1))
    p.branch(Merge.First)(
      p.x >> intInc >> p.w,  // w = 2 — kept
      p.x >> intDec >> p.w,  // executed but write dropped
    )
    assert(readInt(p("w")) == 2)
  }

  test("branch Merge.Error raises on conflict") {
    val p = DPP("x" -> scalarI(1))
    val e = intercept[IllegalStateException] {
      p.branch(Merge.Error)(
        p.x >> intInc >> p.w,
        p.x >> intDec >> p.w,
      )
    }
    assert(e.getMessage.contains("Variable conflict"))
  }

  test("branch with unequal arity dispatches to fan-in per branch") {
    val p = DPP("x" -> scalarI(10), "y" -> scalarI(20))
    val add = fanIn1("add") { case Seq(a, b) =>
      a.crossJoin(b.withColumnRenamed("value", "v2"))
        .select((col("value") + col("v2")).as("value"))
    }
    p.branch(
      V(p.x, p.y) >> add >> p.sum,   // 2-in 1-out → fan-in
      p.x >> intInc >> p.xi,         // 1-in 1-out → map
    )
    assert(readInt(p("sum")) == 30)
    assert(readInt(p("xi")) == 11)
    // PREV after branch = concatenated branch outputs
    p.common(Prev >> intInc >> V(p.s2, p.x2))
    assert(readInt(p("s2")) == 31)
    assert(readInt(p("x2")) == 12)
  }

  // ---- select ---------------------------------------------------------
  test("select runs the first true branch only") {
    val p = p3
    p.select(
      (V(p.x, p.y) >> intInc >> V(p.x, p.y), (_: CtxView) => false),
      (p.z >> intInc >> p.z, (_: CtxView) => true),
      (p.x >> intInc >> p.x, (_: CtxView) => true), // never reached
    )
    assert(readInt(p("x")) == 4)  // untouched (still the string "4" cast)
    assert(readInt(p("z")) == 43)
  }

  test("select falls through to default") {
    val p = p3
    p.select(
      Seq((p.z >> intInc >> p.z, (_: CtxView) => false)),
      default = V(p.x, p.y) >> intDec >> V(p.x, p.y))
    assert(readInt(p("x")) == 3)
    assert(readInt(p("y")) == 1)
    assert(readInt(p("z")) == 42)
  }

  test("select conditions see a pre-select snapshot and can run Spark actions") {
    val p = DPP("x" -> scalarI(5))
    p.select(
      (p.x >> intInc >> p.x, (ctx: CtxView) => ctx("x").head().getInt(0) > 3),
    )
    assert(readInt(p("x")) == 6)
  }

  test("select with no true branch and no default is a no-op") {
    val p = DPP("x" -> scalarI(5))
    p.select((p.x >> intInc >> p.x, (_: CtxView) => false))
    assert(readInt(p("x")) == 5)
  }

  // ---- chaining + debug + dynamic access ------------------------------
  test("operators chain (README.md:192-204)") {
    val p = p3
    p.common(All >> intInc >> All)
      .select(
        (p.z >> intInc >> p.z, (_: CtxView) => true),
      )
    assert(readInt(p("z")) == 44)
  }

  test("... (Ellipsis) raises NotImplementedError like the reference") {
    val p = p3
    intercept[NotImplementedError] { p.common(Ellipsis >> intInc >> p.out) }
  }

  test("debug traces use the reference's [MODE] format (README.md:222-240)") {
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf)) {
      val p = p3.debug()
      p.common(All >> intInc >> All)
      p.sequence(p.x >> intInc >> p.x2)
      p.select((p.x2 >> intInc >> p.x3, (_: CtxView) => true))
    }
    val trace = buf.toString
    assert(trace.contains("[MAP]"))
    assert(trace.contains("[SEQUENCE]"))
    assert(trace.contains("[SELECT]"))
  }

  test("unknown context variable read raises") {
    val p = p3
    intercept[NoSuchElementException] { p("nope") }
  }

  test("dynamic ref access mints stable placeholders") {
    val p = p3
    assert(p.x eq p.ref("x"))
    assert(p.brandNew == Ref("brandNew"))
  }

  test("snapshot table composes with the DPP layer: sequence reads a version, transforms, commits the next") {
    // the lakehouse tier behind the reference's orchestration surface:
    // a sequence step whose source is Snapshots.read and whose sink step
    // commits the transformed frame as the table's next version — the
    // q_pipeline_docs precedent, with versioned storage at both ends
    import graft.ops.Sinks
    val path = java.nio.file.Files.createTempDirectory("graft_dpp_snap_")
      .toString + "/t"
    Sinks.Snapshots.commit(spark,
      Seq((1, 5), (2, 6), (3, 7)).toDF("id", "v"), path)
    val p = DPP("snap" -> Sinks.Snapshots.read(spark, path))
    val double = fn("double")(df => df.select(col("id"), (col("v") * 2).as("v")))
    val commitStep = fn("commitSnapshot") { df =>
      Sinks.Snapshots.commit(spark, df, path)
      Sinks.Snapshots.read(spark, path) // the slot now holds the committed tip
    }
    p.sequence(
      p.snap >> double >> p.doubled,
      Prev >> commitStep >> p.committed,
    )
    assert(Sinks.Snapshots.versions(spark, path) == Seq(1, 2),
      "the sink step must land exactly one new version")
    val v2 = Sinks.Snapshots.read(spark, path).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(v2 == Seq((1, 10), (2, 12), (3, 14)))
    // time travel still reads the pipeline's INPUT version unchanged
    val v1 = Sinks.Snapshots.read(spark, path, Some(1)).orderBy("id")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(v1 == Seq((1, 5), (2, 6), (3, 7)))
    assert(p("committed").count() == 3)
  }

  test("q_pipeline_release composes every tier: snapshot I/O at both ends, auto-kernel normalize, bounded sample, versioned card") {
    val sf = "/root/testdata/sf0.001"
    val card = graft.ops.Llm.q_pipeline_release(spark, sf)
    // the published card reads COMMITTED snapshot bytes, one row per
    // surviving source, and the sample stage bounded every stratum at
    // its Neyman quota (budget 200 total)
    val rows = card.collect()
    assert(rows.nonEmpty, "release card must not be empty")
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "card is one row per source")
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs > 0 && nDocs <= 200, s"sample must respect the 200-doc budget, got $nDocs")
    // the normalize stage was written as the VERBATIM regex idiom — the
    // auto-injected rewrite rule must lower it to the kernels in the
    // composed plan (checked on the stage output the card stage
    // materializes; the final frame reads the published parquet, so the
    // assertion runs on a reconstruction of the upstream plan)
    import org.apache.spark.sql.functions._
    val upstream = graft.ops.Tables.documents(spark, sf)
      .withColumn("norm_key", md5(lower(trim(regexp_replace(
        regexp_replace(col("text"), "[^a-zA-Z0-9 ]", ""), " +", " ")))))
      .withColumn("n_tok", size(split(col("text"), " ")))
    val opt = upstream.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_normtext") && !opt.toLowerCase.contains("regexp_replace"),
      s"pipeline normalize stage must ride the kernel rewrite:\n$opt")
  }
}
