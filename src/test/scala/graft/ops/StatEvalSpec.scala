package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant + brute-force-replay specs for the statistics / ML-eval
  * gate family (q_stat_ks, q_stat_chi2, q_eval_auc, q_eval_calibration,
  * q_lang_kappa, q_window_ewma, q_join_asof_tol, q_dedup_soft,
  * q_sim_sparse). The DuckDB oracle proves engine parity; these specs
  * prove the STATISTIC is the one claimed, by recomputing it naively on
  * the collected sf0.001 tables and demanding exact integer equality.
  */
class StatEvalSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q_stat_ks matches a brute-force two-sample KS, exactly") {
    val rows = Relational.q_stat_ks(spark, sf).collect()
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val n = ev.length.toLong
    assert(rows.length == 5)
    rows.foreach { r =>
      val t = r.getString(0)
      val (n1, n2, dNum, dMicro) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n1 + n2 == n)
      // brute force: max over sample points of |c1*n2 - c2*n1|
      val s1 = ev.filter(_._1 == t).map(_._2).sorted
      val s2 = ev.filter(_._1 != t).map(_._2).sorted
      assert(n1 == s1.length && n2 == s2.length)
      val grid = (s1 ++ s2).distinct
      val expect = grid.map { v =>
        val c1 = s1.count(_ <= v).toLong
        val c2 = s2.count(_ <= v).toLong
        math.abs(c1 * n2 - c2 * n1)
      }.max
      assert(dNum == expect, s"type $t")
      val den = n1 * n2
      assert(dMicro == (2L * 1000000L * dNum + den) / (2L * den))
      assert(dMicro >= 0 && dMicro <= 1000000L)
    }
  }

  test("q_stat_chi2: full grid, exact integer expected/contribution") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = BigInt(docs.length)
    val langs = docs.map(_._1).distinct.sorted
    val srcs = docs.map(_._2).distinct.sorted
    val rows = Relational.q_stat_chi2(spark, sf).collect()
    assert(rows.length == langs.length * srcs.length, "complete grid incl. empty cells")
    assert(rows.map(_.getLong(2)).sum == docs.length.toLong)
    rows.foreach { row =>
      val (l, s2, o) = (row.getString(0), row.getString(1), BigInt(row.getLong(2)))
      val r = BigInt(docs.count(_._1 == l))
      val c = BigInt(docs.count(_._2 == s2))
      assert(o == BigInt(docs.count(d => d._1 == l && d._2 == s2)))
      val eMicro = (2 * 1000000 * r * c + n) / (2 * n)
      val dev = o * n - r * c
      val contrib = (2 * 1000000 * dev * dev + n * r * c) / (2 * n * r * c)
      assert(BigInt(row.getLong(3)) == eMicro, s"cell ($l,$s2) expected")
      assert(BigInt(row.getLong(4)) == contrib, s"cell ($l,$s2) contribution")
    }
  }

  test("q_eval_auc: U-statistic equals the pairwise wins + half-ties count") {
    val scored = Llm.q_eval_auc(spark, sf).collect()
    val frame = Llm.classifierScored(spark, sf)
      .select("source", "score_ppm", "label").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    scored.foreach { row =>
      val src = row.getString(0)
      val (p, n, u2) = (row.getLong(1), row.getLong(2), row.getLong(3))
      val pos = frame.filter(f => f._1 == src && f._3).map(_._2)
      val neg = frame.filter(f => f._1 == src && !f._3).map(_._2)
      assert(p == pos.length && n == neg.length)
      // 2U = 2·(wins) + (cross ties): the Mann-Whitney pair form
      var wins = 0L; var ties = 0L
      for (a <- pos; b <- neg) { if (a > b) wins += 1 else if (a == b) ties += 1 }
      assert(u2 == 2 * wins + ties, s"source $src")
      if (p > 0 && n > 0) {
        assert(row.getLong(4) == (1000000L * u2 + 2 * p * n) / (4 * p * n))
        assert(row.getLong(4) >= 0 && row.getLong(4) <= 1000000L)
      } else assert(row.isNullAt(4), "degenerate slice must report NULL auc")
    }
    assert(spark.read.parquet(s"$sf/documents.parquet").count() == frame.length)
  }

  test("q_eval_calibration: bins partition the corpus, rates are exact") {
    val rows = Llm.q_eval_calibration(spark, sf).collect()
    val frame = Llm.classifierScored(spark, sf)
      .select("score_ppm", "label").collect()
      .map(r => (r.getLong(0), r.getBoolean(1)))
    assert(rows.map(_.getLong(1)).sum == frame.length.toLong)
    rows.foreach { r =>
      val (bin, n, nPos, mean, rate) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val members = frame.filter(f => math.min(f._1 / 100000, 9) == bin)
      assert(n == members.length && nPos == members.count(_._2))
      val sum = members.map(_._1).sum
      assert(mean == (2 * sum + n) / (2 * n))
      assert(rate == (2 * 1000000L * nPos + n) / (2 * n))
      // the mean predicted score must actually fall inside its bin
      assert(mean >= bin * 100000 && mean <= (bin + 1) * 100000)
    }
  }

  test("q_lang_kappa: exact fraction vs a naive per-source recomputation") {
    val rows = Llm.q_lang_kappa(spark, sf).collect()
    val docs = Llm.q_lang_id(spark, sf)
      .join(spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "lang", "source"), "doc_id")
      .select("source", "lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = docs.filter(_._1 == src)
      val n = BigInt(mine.length)
      val agree = BigInt(mine.count(d => d._2 == d._3))
      val cats = (mine.map(_._2) ++ mine.map(_._3)).distinct
      val s = cats.map(k => BigInt(mine.count(_._3 == k)) * BigInt(mine.count(_._2 == k))).sum
      assert(BigInt(r.getLong(1)) == n && BigInt(r.getLong(2)) == agree)
      assert(BigInt(r.getLong(3)) == s, s"source $src marginal product sum")
      assert(BigInt(r.getLong(4)) == n * agree - s)
      assert(BigInt(r.getLong(5)) == n * n - s)
      // kappa ∈ [-1, 1]: |num| ≤ den (den > 0 whenever two categories exist)
      if (r.getLong(5) > 0) assert(math.abs(r.getLong(4)) <= r.getLong(5))
    }
  }

  test("q_window_ewma: closed-form replay for frame depths 1 and 2") {
    val ew = Relational.q_window_ewma(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("user_id", "ts_us", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    byUser.values.foreach { seq =>
      val first = seq.head
      val exp1 = BigDecimal(first._4 * 0.5 / 0.5 + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ew(first._3) == exp1, s"first event of user ${first._1}")
      if (seq.length > 1) {
        val second = seq(1)
        val num = second._4 * 0.5 + first._4 * 0.25
        val exp2 = BigDecimal(num / 0.75 + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(ew(second._3) == exp2, s"second event of user ${second._1}")
      }
    }
  }

  test("q_join_asof_tol: unbounded match filtered by the 7-day bound, row for row") {
    val unb = Relational.q_join_asof(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    val tol = Relational.q_join_asof_tol(spark, sf).collect()
    val evTs = Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tolNs = 7L * 24 * 3600 * 1000000L * 1000L
    var bounded = 0
    tol.foreach { r =>
      val id = r.getLong(0)
      val got = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val expected = unb(id).filter(_ >= evTs(id) * 1000L - tolNs)
      assert(got == expected, s"event $id")
      if (unb(id).isDefined && expected.isEmpty) bounded += 1
    }
    assert(bounded > 0, "the tolerance must actually exclude something, or the gate is vacuous")
  }

  test("q_dedup_soft: weights are exact reciprocals of duplicate-cluster sizes") {
    val rows = Llm.q_dedup_soft(spark, sf).collect()
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sizes = texts.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val byDoc = texts.toMap
    assert(rows.length == texts.length, "soft dedup keeps every document")
    rows.foreach { r =>
      val m = sizes(byDoc(r.getLong(0)))
      assert(r.getLong(1) == m)
      assert(r.getLong(2) == (2000000L + m) / (2 * m))
    }
    // sf0.001 happens to contain no exact duplicate, so the corpus only
    // exercises the m = 1 path — prove the down-weighting on a planted
    // corpus: a triple and a singleton
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("softdedup").toString
    Seq((1L, "aa bb", "en", "s0", 5L), (2L, "aa bb", "en", "s0", 5L),
        (3L, "aa bb", "en", "s0", 5L), (4L, "cc dd", "en", "s0", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val planted = Llm.q_dedup_soft(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(planted(1L) == ((3L, 333333L)) && planted(2L) == ((3L, 333333L)) &&
      planted(3L) == ((3L, 333333L)), "triple gets weight round(1e6/3)")
    assert(planted(4L) == ((1L, 1000000L)), "singleton keeps full weight")
  }

  test("q_bigram_ppl: brute-force interpolated-bigram NLL replay") {
    val rows = Llm.q_bigram_ppl(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def toks(t: String) = t.split(" ", -1) // Spark split keeps trailing empties
    val allPairs = docs.flatMap { case (_, t) =>
      val w = toks(t); if (w.length < 2) Seq.empty else w.sliding(2).map(a => (a(0), a(1)))
    }
    val c12 = allPairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = allPairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c2 = allPairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nTotal = allPairs.length.toLong
    def nll6(p: (String, String)): BigDecimal =
      BigDecimal(-math.log(0.75 * (c12(p).toDouble / c1(p._1).toDouble)
        + 0.25 * (c2(p._2).toDouble / nTotal.toDouble)) + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    var checked = 0
    docs.foreach { case (id, t) =>
      val w = toks(t)
      if (w.length >= 2) {
        val pairs = w.sliding(2).map(a => (a(0), a(1))).toSeq
        val sum = pairs.map(nll6).sum
        val exp = BigDecimal(sum.toDouble / pairs.length + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(rows(id)._1 == pairs.length.toLong, s"doc $id n_bigrams")
        assert(rows(id)._2 == exp, s"doc $id avg_nll")
        checked += 1
      } else assert(!rows.contains(id), s"doc $id has no bigrams")
    }
    assert(checked > 100)
  }

  test("q_mine_hardneg: wrong-label only, dominated by the unconstrained top-1") {
    val hn = Llm.q_mine_hardneg(spark, sf).collect()
    assert(hn.nonEmpty)
    val byQ = hn.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length))
      assert(sorted.forall(r => r.getLong(4) != r.getLong(1)),
        s"query $q: every mined negative must carry a different label")
      val cs = sorted.map(_.getDouble(5))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
    // the best wrong-label neighbor can never beat the best neighbor overall
    val best = Llm.q_sim_topk(spark, sf).collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    byQ.foreach { case (q, rs) =>
      val top = rs.minBy(_.getLong(2)).getDouble(5)
      best.get(q).foreach(b => assert(top <= b + 1e-9, s"query $q dominance"))
    }
    // brute-force top-1 for query 0
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    val q0 = emb.find(_._1 == 0L).get
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      // match the engine: accumulate in double over double-cast elements
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      val r9 = BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      r9.toDouble
    }
    val expTop = emb.filter(e => e._3 != q0._3)
      .map(e => (cos(q0._2, e._2), e._1)).maxBy { case (c, id) => (c, -id) }
    val gotTop = byQ(0L).minBy(_.getLong(2))
    assert(gotTop.getLong(3) == expTop._2, "query 0 top hard negative matches brute force")
  }

  test("q_session_paths: brute-force sessionize + path replay") {
    val got = Relational.q_session_paths(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ev = Tables.events(spark, sf)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .select("user_id", "ts_us", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[String]]()
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (sessions.isEmpty || e._2 - prev > 30L * 60 * 1000000L)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4
        prev = e._2
      }
      sessions.map(_.take(5).mkString(">"))
    }
    val expect = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expect, "top-20 session paths must match the naive replay")
    assert(got.forall(_._1.split(">", -1).length <= 5))
  }

  test("q_decontam_semantic: canary flags, nearest-eval matches brute force") {
    val rows = Llm.q_decontam_semantic(spark, sf).collect()
    val canary = rows.find(_.getLong(0) == -1L).get
    assert(canary.getLong(1) == 0L && canary.getDouble(2) == 1.0 && canary.getBoolean(3),
      "planted copy of eval 0 must flag as contaminated with cos exactly 1")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val nTrain = emb.count(_._1 >= 50)
    assert(rows.length == nTrain + 1, "every train vector + the canary reports")
    assert(rows.forall(r => r.getLong(1) < 50), "nearest item always from the eval set")
    // brute-force the nearest eval for the largest train id
    def cos9(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val probe = emb.filter(_._1 >= 50).maxBy(_._1)
    val evals = emb.filter(_._1 < 50)
    val best = evals.map(e => (cos9(probe._2, e._2), e._1)).maxBy(identity)
    val gotProbe = rows.find(_.getLong(0) == probe._1).get
    assert(gotProbe.getLong(1) == best._2, "nearest eval for the probe matches brute force")
  }

  test("q_sim_sparse: ranks are cosine-monotone and top-1 matches brute force") {
    val rows = Llm.q_sim_sparse(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(1L, 2L, 3L, 4L, 5L))
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length))
      assert(sorted.forall(_.getLong(2) != q), "no self matches")
      val cosines = sorted.map(_.getDouble(4))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
        s"query $q cosine non-increasing")
      assert(cosines.forall(c => c > 0 && c <= 1.0 + 1e-6))
    }
    // brute-force top-1 for query doc 1 from bigram tf vectors
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ")
      if (w.length < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val tf = docs.map { case (id, t) =>
      id -> bigrams(t).groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val nDocs = docs.length
    val dfCount = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    val keptTf = tf.view.mapValues(_.filter { case (g, _) => dfCount(g) * 10 <= nDocs }).toMap
    val qv = keptTf(1L)
    val best = docs.map(_._1).filter(_ != 1L).map { id =>
      val dv = keptTf(id)
      val dot = qv.map { case (g, c) => c * dv.getOrElse(g, 0L) }.sum
      val n1 = qv.values.map(v => v * v).sum
      val n2 = dv.values.map(v => v * v).sum
      val cos = if (dot == 0) 0.0 else dot.toDouble / math.sqrt(n1.toDouble * n2.toDouble)
      (cos, id)
    }.maxBy { case (c, id) => (c, -id) }
    val top1 = byQ(1L).minBy(_.getLong(1))
    assert(top1.getLong(2) == best._2, "top-1 neighbor for query 1 must match brute force")
  }
}
