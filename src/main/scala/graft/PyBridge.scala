package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Py4J-friendly entry points for the PySpark facade
  * (`python/graft_py.py`). The reference's audience writes Python
  * (dpp.py is a Python DSL), so the operator library is callable from
  * a stock `pyspark` session whose JVM has the graft classes on the
  * classpath (`--jars` / `spark.driver.extraClassPath`). Scala objects
  * compile with static forwarders, so `spark._jvm.graft.PyBridge.x(...)`
  * resolves directly; everything here takes/returns only Java-friendly
  * types (String, Array, DataFrame) — no Scala collections or
  * function values cross the bridge.
  */
object PyBridge {

  /** All registered operator queries, sorted (the SURVEY §2.B surface). */
  def queryNames(): Array[String] = SparkEntry.queries.keys.toArray.sorted

  /** Run one registered operator query over a testdata-layout dir. */
  def runQuery(spark: SparkSession, name: String, sfDir: String): DataFrame = {
    val q = SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown graft query '$name' (see queryNames())"))
    q(spark, sfDir)
  }

  /** DuckDB-equivalent oracle SQL for a query, or null when the query
    * is hash-/approx-dependent (no SQL oracle by design).
    */
  def oracleSql(name: String): String =
    SparkEntry.oracleSql.getOrElse(name, null)

  /** The flagship DPP-orchestrated entry query. */
  def entry(spark: SparkSession): DataFrame = SparkEntry.entry(spark)

  /** Engine wiring (native SQL functions, as-of strategy, bloom/range
    * join rules, text-kernel rewrites) for a session built without
    * `spark.sql.extensions=graft.functions.GraftExtensions`. Idempotent.
    */
  def install(spark: SparkSession): Unit = GraftSession.install(spark)
}
