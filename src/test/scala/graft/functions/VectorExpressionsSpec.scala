package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native DotProduct/L2Norm expressions must be bit-identical to the
  * higher-order-function formulation (same summation order), work from
  * SQL once registered, and run inside whole-stage codegen.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def emb = graft.ops.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))

  test("DotProduct/L2Norm ≡ interpreted aggregate/zip_with, bit-identical") {
    val hofDot = aggregate(zip_with(col("e"), col("r"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val hofNorm = sqrt(aggregate(col("e"), lit(0.0), (acc, x) => acc + x * x))
    val df = emb.withColumn("r", reverse(col("e")))
      .select(
        Vec.dot(col("e"), col("r")).as("nat_dot"), hofDot.as("hof_dot"),
        Vec.l2norm(col("e")).as("nat_norm"), hofNorm.as("hof_norm"))
    // bit-identical: compare raw doubles, no tolerance
    assert(df.filter(col("nat_dot") =!= col("hof_dot") ||
      col("nat_norm") =!= col("hof_norm")).count() == 0)
  }

  test("null and empty-array handling") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double])),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(Vec.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).getDouble(0) == 0.0)
    assert(out(2).isNullAt(0))
  }

  test("mismatched array lengths yield NULL, not a truncated partial dot") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(df.select(Vec.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("SQL registration: graft_dot / graft_l2norm usable from spark.sql") {
    Vec.register(spark)
    emb.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT vec_id, graft_dot(e, e) AS sq, graft_l2norm(e) AS n FROM emb_v
        |ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(1) - row.getDouble(2) * row.getDouble(2)) < 1e-9)
    }
  }

  test("expressions run inside whole-stage codegen (no eval fallback)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = emb.select(Vec.dot(col("e"), col("e")).as("d")).filter(col("d") > 0)
    df.collect()
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(finalPlan.toString.contains("*(1)"), s"not codegen'd:\n$finalPlan")
  }
}
