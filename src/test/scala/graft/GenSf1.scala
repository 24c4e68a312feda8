package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 test-data generator for the scaling spot-bench (PERF.md): builds
  * a 10× replica of /root/testdata/sf0.1 under target/testdata/sf1
  * (the driver's testdata tree is read-only, so the scaled set lives in
  * the repo's build dir).
  *
  * Construction — ten key-offset copies, each a self-contained universe:
  * every scaling key (order/cust/supp/part keys, event/user ids, doc and
  * vec ids) is shifted by copy·10^8, so per-copy join fan-out, group
  * cardinality ratios, and graph structure are EXACTLY sf0.1's, and the
  * total is 10× the rows (lineitem 6M — the TPC-H sf1 count). The
  * non-scaling dims (region, nation) stay fixed, as in TPC-H.
  *
  * Content perturbation keeps content-addressed operators honest:
  *   - documents: every token of copy c>0 gains an alphanumeric 'xc'
  *     suffix (vocab
  *     becomes copy-disjoint, so cross-copy text is NOT near-duplicate
  *     and the dedup/LSH workloads scale linearly instead of drowning
  *     in 10-deep artificial dup groups); n_chars is recomputed.
  *   - embeddings: deterministic ±5% component jitter (xxhash64-seeded)
  *     so cross-copy vectors are not bit-identical in the ANN paths.
  *
  * Determinism: pure column arithmetic over the fixed sf0.1 input — no
  * RNG state, so re-running reproduces the same bytes (modulo parquet
  * file split boundaries, which no query depends on).
  */
object GenSf1 {

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "target/testdata/sf1"
    val in = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    // scaling a scaled set again needs a LARGER key stride than the one
    // already consumed (sf1 keys span ~10·10^8): pass e.g. 10^10 when
    // the input is itself a generated set
    val Off = if (args.length > 2) args(2).toLong else 100000000L
    val Copies = if (args.length > 3) args(3).toInt else 10
    val spark = GraftSession.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, partitions = 32)
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String) = spark.read.parquet(s"$in/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gensf1] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def replicate(df: DataFrame)(mutate: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Copies).map(c => mutate(df, c)).reduce(_ unionByName _)
    def shift(df: DataFrame, c: Int, keys: String*): DataFrame =
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Off)))

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"))(shift(_, _, "c_custkey")), "customer")
    write(replicate(read("supplier"))(shift(_, _, "s_suppkey")), "supplier")
    write(replicate(read("part"))(shift(_, _, "p_partkey")), "part")
    write(replicate(read("orders"))(shift(_, _, "o_orderkey", "o_custkey")), "orders")
    write(replicate(read("lineitem"))(
      shift(_, _, "l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(replicate(read("events"))(shift(_, _, "event_id", "user_id")), "events")
    write(replicate(read("documents")) { (df, c) =>
      if (c == 0) df
      else shift(df, c, "doc_id")
        // alphanumeric salt, deliberately: a punctuation salt ('#')
        // diverges from the oracle emulations of locale tokenization
        // (sentences) and URL encoding, which are charset-specific
        .withColumn("text", array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"x$c"))), " "))
        .withColumn("n_chars", length(col("text")))
    }, "documents")
    write(replicate(read("embeddings")) { (df, c) =>
      if (c == 0) df
      else shift(df, c, "vec_id")
        .withColumn("embedding", transform(col("embedding"), (x, i) =>
          (x * (lit(1.0f) + lit(0.1f) *
            ((pmod(xxhash64(col("vec_id"), i, lit(c)), lit(1001)).cast("float") /
              lit(1000.0f)) - lit(0.5f)))).cast("float")))
    }, "embeddings")

    spark.stop()
  }
}
