package graft

/** Scratch probe for feature support checks (not a spec). */
object Probe {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.local(4)
    s.sparkContext.setLogLevel("ERROR")
    for ((name, sql) <- Seq(
      "theta_union" -> "SELECT theta_sketch_estimate(theta_union_agg(sk)) FROM (SELECT theta_sketch_agg(x) sk FROM VALUES (1),(2) t(x) UNION ALL SELECT theta_sketch_agg(x) FROM VALUES (2),(3) t(x))",
      "theta_intersection" -> "SELECT theta_sketch_estimate(theta_intersection(a, b)) FROM (SELECT (SELECT theta_sketch_agg(x) FROM VALUES (1),(2) t(x)) a, (SELECT theta_sketch_agg(x) FROM VALUES (2),(3) t(x)) b)",
      "theta_difference" -> "SELECT theta_sketch_estimate(theta_difference(a, b)) FROM (SELECT (SELECT theta_sketch_agg(x) FROM VALUES (1),(2) t(x)) a, (SELECT theta_sketch_agg(x) FROM VALUES (2),(3) t(x)) b)"
    )) {
      try println(s"$name OK: " + s.sql(sql).head)
      catch { case e: Throwable => println(s"$name FAIL: " + e.getMessage.replaceAll("\n", " ").take(120)) }
    }
    s.stop()
  }
}
