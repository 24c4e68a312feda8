package graft

import org.apache.spark.sql.SparkSession

/** The library's session factory: one place for the configuration that
  * matters at cluster scale, documented per knob. Local test/bench
  * runners and a 1000-executor deployment differ only in `master` and
  * the parallelism numbers.
  */
object GraftSession {

  /** @param cpus       local core count (ignored when master is set externally)
    * @param partitions shuffle fan-out. Rule of thumb at scale: 2-3× total
    *                   executor cores, and ≥ (largest shuffled stage bytes /
    *                   200 MB) so partitions fit in memory; AQE coalesces
    *                   the small ones back down at runtime.
    */
  def local(cpus: Int = 4, partitions: Int = 0): SparkSession = {
    val p = if (partitions > 0) partitions else cpus
    val spark = configure(SparkSession.builder().master(s"local[$cpus]"), p).getOrCreate()
    install(spark)
    spark
  }

  /** Engine wiring for sessions built WITHOUT
    * `spark.sql.extensions=graft.functions.GraftExtensions`: registers
    * the native SQL functions, the as-of join strategy, and the
    * bloom-prefilter + binned-range join rules through the public
    * runtime hooks (FunctionRegistry / experimental.extraStrategies /
    * experimental.extraOptimizations). Idempotent.
    */
  def install(spark: SparkSession): Unit = {
    graft.functions.Vec.register(spark)
    graft.plans.Asof.ensureRegistered(spark)
    graft.plans.BloomJoin.ensureRegistered(spark)
    graft.plans.RangeJoin.ensureRegistered(spark)
  }

  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    // deterministic timestamps across engines (DuckDB oracle parity)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", shufflePartitions)
    // AQE: runtime re-planning — coalesces small post-shuffle partitions,
    // splits skewed ones, and switches SMJ→broadcast when a side turns
    // out tiny. Default-on in Spark 4; pinned here because the engine's
    // scale story depends on it.
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // keep scan tasks ~128 MB so a 100 TB table yields bounded task counts
    // without giant per-task memory footprints
    .config("spark.sql.files.maxPartitionBytes", String.valueOf(128L * 1024 * 1024))
    // some events.parquet vintages carry TIMESTAMP(NANOS), which
    // Spark's reader rejects; read nanos as raw longs (Tables.events
    // normalizes either encoding). Set once here so table reads are
    // order-independent — never mutated per-read.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  /** SQL extension registration for spark-submit deployments:
    * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
    */
  val ExtensionsClass = "graft.functions.GraftExtensions"
}
