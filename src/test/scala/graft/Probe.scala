package graft

/** Scratch probe for feature support checks (not a spec). */
object Probe {
  def main(a: Array[String]): Unit = {
    val s = GraftSession.local(4)
    s.sparkContext.setLogLevel("ERROR")
    for ((name, sql) <- Seq(
      "recursive" -> "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) SELECT sum(n) FROM t",
      "xpath" -> "SELECT xpath_string('<a><b>hi</b></a>', '/a/b')",
      "base64" -> "SELECT base64('ab'), unbase64(base64('ab')), hex(encode('ab','utf-8'))",
      "from_xml" -> "SELECT from_xml('<r><x>1</x></r>', 'x INT')",
      "format" -> "SELECT format_number(1234.567, 2), printf('%d-%s', 7, 'a')",
      "sentences" -> "SELECT sentences('Hi there. Bye.')"
    )) {
      try println(s"$name OK: " + s.sql(sql).head)
      catch { case e: Throwable => println(s"$name FAIL: " + e.getMessage.replaceAll("\n", " ").take(150)) }
    }
    s.stop()
  }
}
