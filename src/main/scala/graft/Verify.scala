package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional 3rd arg: comma-separated query names — local fast iteration
    // only; the driver always invokes with exactly two args (full dump).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // SPARK_GRAFT_VERIFY_PAR > 1 submits that many queries concurrently
    // (each its own Spark job; the scheduler interleaves stages) — a
    // large-SF full dump is wall-clock-bound on per-query scheduling
    // gaps, not on CPU. Default 1 = the driver's sequential contract.
    val par = sys.env.getOrElse("SPARK_GRAFT_VERIFY_PAR", "1").toInt.max(1)
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val work = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
    def runOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    if (par <= 1) work.foreach { case (n, f) => runOne(n, f) }
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val futs = work.map { case (n, f) => scala.concurrent.Future(runOne(n, f)) }
      futs.foreach(f => scala.concurrent.Await.ready(f, scala.concurrent.duration.Duration.Inf))
      pool.shutdown()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // decade-sweep oracle overrides: forms that are too slow for the
    // sf0.01 driver gate's bulletproof-but-quadratic originals, with
    // execution pragmas (-- SWEEP_THREADS=k) the sweep child enforces
    val overrides = Map("q_pack_sequences" -> OracleSql.packSequencesChunked)
    Files.writeString(Paths.get(s"$outDir/oracle_sql_sweep_overrides.json"),
      overrides.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
