package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DuckDB kernel oracles regenerate the minhash permutation family
  * and splitmix64 constants independently — these must be pinned against
  * the production kernel (`TextKernels`) so the two cannot drift: a
  * constant change in one place would silently turn the hash-exact gate
  * into a guaranteed mismatch.
  */
class OracleSqlSpec extends AnyFunSuite {

  test("oracle splitmix64 matches TextKernels.splitmix64") {
    val seeds = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 0xdeadbeefL, 1234567890123L)
    seeds.foreach { s =>
      assert(OracleSql.splitmixLong(s) == graft.functions.TextKernels.splitmix64(s))
    }
  }

  test("oracle HashA/HashB family matches TextKernels.HashA/HashB") {
    val a = Array.tabulate(32)(j => OracleSql.splitmixLong(2L * j) & 0x3fffffffL | 1L)
    val b = Array.tabulate(32)(j => OracleSql.splitmixLong(2L * j + 1) & 0xffffffffL)
    assert(a.sameElements(graft.functions.TextKernels.HashA))
    assert(b.sameElements(graft.functions.TextKernels.HashB))
  }

  test("oracle hyperplane matrix matches VecKernels.PlanesFlat") {
    val ints = Array.tabulate(12 * 64)(i => Math.floorMod(OracleSql.splitmixLong(i.toLong), 2001L))
    val doubles = ints.map(k => (k - 1000L) / 1000.0)
    assert(doubles.sameElements(graft.functions.VecKernels.PlanesFlat))
  }

  test("kernel oracle SQL embeds the pinned constants") {
    // FNV offset basis / prime, and the three splitmix mix constants,
    // in their unsigned-decimal spellings
    val constants = Seq(
      "14695981039346656037", "1099511628211", // FNV-1a 64
      "11400714819323198485", "13787848793156543929", "10723151780598845931")
    val sqls = Seq(OracleSql.winnow, OracleSql.dedupMinhash, OracleSql.dedupSimhash)
    sqls.foreach { sql => constants.foreach { c => assert(sql.contains(c), s"missing $c") } }
    // every oracle is a single statement (the driver runs one con.sql)
    (sqls ++ Seq(OracleSql.dedupClusters, OracleSql.dedupBucketStats,
      OracleSql.contaminationFuzzy, OracleSql.packSequences,
      OracleSql.bpeTrain, OracleSql.bpeEncode))
      .foreach(sql => assert(!sql.contains(";")))
    // the BPE unrolls carry their full merge budgets (train 10,
    // encode 30 + the word carry for the vocab join-back)
    assert(OracleSql.bpeTrain.contains("w10") && !OracleSql.bpeTrain.contains("w11"))
    assert(OracleSql.bpeEncode.contains("w30") && !OracleSql.bpeEncode.contains("w31"))
  }
}
