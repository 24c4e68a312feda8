package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql` entry point over registered views — the SQL-user surface
  * of the engine. SQL and DataFrame formulations must produce identical
  * results (they compile to the same Catalyst plans).
  */
class SqlSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  def registerViews(): Unit =
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
      .foreach(t => Tables(spark, sf, t).createOrReplaceTempView(t))

  test("SQL ≡ DataFrame: join + aggregate") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    val viaDf = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
    assert(viaSql.collect().toSeq == viaDf.collect().toSeq)
  }

  test("SQL window functions and CTEs work over views") {
    registerViews()
    val top = spark.sql(
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |SELECT * FROM ranked WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin)
    val viaDf = Relational.q_topk_group(spark, sf).filter(col("rn") <= 2)
    assert(top.count() == viaDf.count())
  }

  test("registered graft_dot works in SQL similarity queries") {
    graft.functions.Vec.register(spark)
    Tables.embeddings(spark, sf)
      .withColumn("e", col("embedding").cast("array<double>"))
      .createOrReplaceTempView("emb_sql")
    val self = spark.sql(
      "SELECT vec_id, graft_dot(e, e) AS sq FROM emb_sql ORDER BY vec_id LIMIT 3").collect()
    assert(self.forall(_.getDouble(1) > 0))
  }

  test("parameterized SQL: named markers bind values without string interpolation") {
    Tables.orders(spark, sf).createOrReplaceTempView("param_orders")
    val n = spark.sql(
      "SELECT count(*) AS n FROM param_orders WHERE o_totalprice > :thr AND o_orderstatus = :st",
      Map("thr" -> 300000.0, "st" -> "O")).head.getLong(0)
    val expected = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000.0 && col("o_orderstatus") === "O").count()
    assert(n == expected && n > 0)
    // binding, not splicing: a quote in a string param must not break out
    val quoted = spark.sql(
      "SELECT count(*) AS n FROM param_orders WHERE o_orderstatus = :st",
      Map("st" -> "O' OR '1'='1")).head.getLong(0)
    assert(quoted == 0, "string param must be bound as a literal, not spliced")
  }

  test("global temp views live in global_temp and survive session forks") {
    Tables.nation(spark, sf).createOrReplaceGlobalTempView("g_nation")
    val viaGlobal = spark.sql("SELECT count(*) FROM global_temp.g_nation").head.getLong(0)
    assert(viaGlobal == Tables.nation(spark, sf).count())
    // a NEW session in the same SparkContext sees global temp views
    val s2 = spark.newSession()
    assert(s2.sql("SELECT count(*) FROM global_temp.g_nation").head.getLong(0) == viaGlobal)
    // ...but not plain temp views, which are session-scoped
    Tables.nation(spark, sf).createOrReplaceTempView("local_nation")
    intercept[Exception] { s2.sql("SELECT count(*) FROM local_nation").collect() }
  }
}
