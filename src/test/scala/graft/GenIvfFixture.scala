package graft

import org.apache.spark.sql.functions._

/** Clustered embedding fixture for the IVF recall ladder (round-11
  * verdict item 3): the committed sf* embeddings are UNIFORM random
  * vectors, so every coarse cell is equidistant from every query and
  * recall is ∝ probed-fraction BY CONSTRUCTION — a ladder on them can
  * only conclude "no knee". Real embedding corpora are clustered; this
  * generator plants a 64-component Gaussian mixture in the same 64-dim
  * space/schema (vec_id, embedding float[64], label = component), so
  * the quantizer has real structure to find and the recall-vs-nProbe
  * curve has a real knee to defend an operating point against.
  *
  * Deterministic column arithmetic only (the GenSf1 convention):
  * uniforms come from xxhash64(id, dim, salt) → [0,1); component
  * centers are uniform in [-1,1]^64; points = center + σ·(sum of 3
  * uniforms − 1.5) per dim (Irwin–Hall ≈ N(0, 0.5²), so σ=0.7 gives a
  * per-dim point spread of ~0.35 vs the centers' ~0.58 — clusters that
  * are separated but share boundaries, the regime where nProbe > 1
  * earns its cost).
  *
  * `sbt "Test/runMain graft.GenIvfFixture <outDir> <n> [noiseScale]"`
  * writes `<outDir>/embeddings.parquet` (the only table the sim queries
  * read, so the dir drops into IvfRecall/q_sim_* as a sfDir).
  * `noiseScale` tunes component overlap: the per-dim point σ is
  * 0.5·noiseScale vs the centers' ~0.577 — too small and every
  * neighbor list is one quantizer cell (recall saturates at nProbe=1),
  * too large and the mixture degenerates toward the uniform fixture;
  * the committed ladder uses the calibrated value whose curve shows a
  * real knee (see IVF_RECALL_r12.json).
  */
object GenIvfFixture {
  val Components = 64
  val Dim = 64

  /** The fixture as a DataFrame (vec_id, embedding float[Dim], label) —
    * exposed so OpsSpec can gate the clustered-recall floor on a
    * freshly built copy without touching the committed artifact dirs.
    */
  def build(spark: org.apache.spark.sql.SparkSession, n: Long,
            noiseScale: Double): org.apache.spark.sql.DataFrame = {
    // u(salt keys...) ∈ [0,1): xxhash64 → non-negative mod 2^20 / 2^20
    def u(keys: org.apache.spark.sql.Column*) =
      pmod(xxhash64(keys: _*), lit(1048576L)).cast("double") / lit(1048576.0)

    spark.range(n).toDF("vec_id")
      .withColumn("label", pmod(xxhash64(col("vec_id"), lit("comp")), lit(Components)).cast("int"))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(Dim - 1)), j => {
          val center = (u(col("label"), j, lit("ctr")) - 0.5) * 2.0
          val noise = (u(col("vec_id"), j, lit("n1")) +
            u(col("vec_id"), j, lit("n2")) +
            u(col("vec_id"), j, lit("n3")) - 1.5) * noiseScale
          (center + noise).cast("float")
        }))
      .select(col("vec_id"), col("embedding"), col("label"))
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "target/testdata/ivf_clustered_50k"
    val n = if (args.length > 1) args(1).toLong else 50000L
    val noiseScale = if (args.length > 2) args(2).toDouble else 1.4
    val spark = GraftSession.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, partitions = 32)
    spark.sparkContext.setLogLevel("WARN")

    build(spark, n, noiseScale)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[genivf] $out: ${spark.read.parquet(s"$out/embeddings.parquet").count()} rows, " +
      s"$Components components, dim $Dim")
    spark.stop()
  }
}
