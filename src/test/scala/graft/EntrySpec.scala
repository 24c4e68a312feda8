package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency: every oracle has a query, and EVERY
  * registered query — including the hash-dependent ones the DuckDB gate
  * only rows-checks — executes end-to-end at sf0.001 and yields rows.
  */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // legitimately empty on the tiny sf0.001 inputs: every customer has
  // orders, so the anti-join has no misses
  private val emptyOkAtTinySf = Set("q_join_anti")

  test("flagship entry and every registered query run and return rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val n = fn(spark, sf).count()
        if (n > 0 || emptyOkAtTinySf(name)) None else Some(s"$name: 0 rows")
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }
}
