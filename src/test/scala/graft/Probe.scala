package graft

/** Scratch probe for feature support checks (not a spec). */
object Probe {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.local(4)
    s.sparkContext.setLogLevel("ERROR")
    for ((name, sql) <- Seq(
      "collate" -> "SELECT count(DISTINCT collate(x, 'UTF8_LCASE')) FROM VALUES ('Ab'),('aB'),('cd') t(x)",
      "tz" -> "SELECT convert_timezone('UTC', 'Asia/Kolkata', TIMESTAMP '2024-01-01 00:00:00')",
      "regr" -> "SELECT regr_slope(y, x), regr_intercept(y, x), regr_r2(y, x) FROM VALUES (1.0, 2.1), (2.0, 3.9), (3.0, 6.2) t(x, y)"
    )) {
      try println(s"$name OK: " + s.sql(sql).head)
      catch { case e: Throwable => println(s"$name FAIL: " + e.getMessage.replaceAll("\n", " ").take(120)) }
    }
    s.stop()
  }
}
