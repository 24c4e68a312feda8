package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force-replay + invariant specs for the round-9 batch-5/6
  * gates (q_skyline, q_select_cover, q_sample_weighted, q_eval_ndcg,
  * q_mutual_info, q_winsorize, q_rank_fusion). The DuckDB oracles
  * prove engine parity; these specs prove the ALGORITHM is the one
  * claimed, by recomputing it naively on the collected sf0.001 tables.
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q_skyline: survivors are exactly the non-dominated points (brute force)") {
    val out = Relational.q_skyline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // naive recompute: per-customer (n_orders, spend) with exact cents
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val pts = orders.groupBy(_._1).map { case (ck, rows) =>
      (cust(ck), ck, rows.length.toLong, rows.map(_._2).sum)
    }.toSeq
    val expect = pts.filter { case (seg, _, n, sp) =>
      !pts.exists { case (s2, _, n2, sp2) =>
        s2 == seg && n2 >= n && sp2 >= sp && (n2 > n || sp2 > sp)
      }
    }.map { case (seg, ck, n, sp) => (seg, ck, n, sp) }.toSet
    val got = out.map { case (seg, ck, n, sp) =>
      (seg, ck, n, math.round(sp * 100))
    }.toSet
    assert(got == expect)
  }

  test("q_select_cover: exact greedy trajectory replay; gains non-increasing; cum_cover telescopes") {
    val out = Llm.q_select_cover(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // naive replay
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val bigrams = docs.map { case (id, ws) =>
      id -> ws.sliding(2).filter(_.length == 2).map(a => a(0) + " " + a(1)).toSet
    }.toMap
    val df = bigrams.values.flatten.groupBy(identity).map { case (bg, o) => (bg, o.size) }
    val vocab = df.filter(_._2 >= 5).keySet
    val dt = bigrams.map { case (id, bgs) => id -> bgs.intersect(vocab) }
    var covered = Set.empty[String]
    val expect = (1 to 8).flatMap { rank =>
      val cand = dt.map { case (id, bgs) => (id, (bgs -- covered).size.toLong) }
      if (cand.isEmpty) None
      else {
        val (id, gain) = cand.minBy { case (i, g) => (-g, i) }
        covered ++= dt(id)
        Some((rank, id, gain, covered.size.toLong))
      }
    }
    assert(out.toSeq == expect)
    assert(out.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      "greedy gains must be non-increasing")
    assert(out.map(_._3).sum == out.last._4, "cum_cover telescopes the gains")
  }

  test("select_cover pool certificate: m0=1 forces growth+restart and still lands the exact greedy trajectory") {
    import spark.implicits._
    // 12 docs over a tiny shared vocabulary (every bigram df >= 5 by
    // repetition across docs); doc 0 has the largest INITIAL gain but
    // later rounds must pick docs OUTSIDE a top-1 pool — with m0 = 1
    // the certificate fails after round 1 and the pool must grow
    val ws = (1 to 8).map(i => s"w$i")
    def doc(words: Seq[String]) = words.mkString(" ")
    val docs = Seq(
      (0L, doc(ws)), // all 7 bigrams
      (1L, doc(ws.take(5))), (2L, doc(ws.take(5))),
      (3L, doc(ws.drop(3))), (4L, doc(ws.drop(3))),
      (5L, doc(ws.take(3))), (6L, doc(ws.take(3))),
      (7L, doc(ws.drop(5))), (8L, doc(ws.drop(5))),
      (9L, doc(ws.take(2))), (10L, doc(ws.take(2))), (11L, doc(ws.take(2)))
    ).toDF("doc_id", "text")
    // naive exact greedy on the same df>=5 vocabulary
    val arr = docs.collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val bgs = arr.map { case (id, w) =>
      id -> w.sliding(2).filter(_.length == 2).map(a => a(0) + " " + a(1)).toSet }.toMap
    val vocab = bgs.values.flatten.groupBy(identity)
      .filter(_._2.size >= 5).keySet
    val dt = bgs.map { case (id, b) => id -> b.intersect(vocab) }
    var covered = Set.empty[String]
    val expect = (1 to 8).flatMap { rank =>
      val cand = dt.map { case (id, b) => (id, (b -- covered).size.toLong) }
        .filter(_._2 > 0)
      if (cand.isEmpty) None
      else {
        val (id, gain) = cand.minBy { case (i, g) => (-g, i) }
        covered ++= dt(id)
        Some((rank, id, gain, covered.size.toLong))
      }
    }
    for (m0 <- Seq(1L, 2L, 1024L)) {
      val got = Llm.selectCover(docs, k = 8, m0 = m0).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expect, s"m0=$m0 trajectory diverged: $got vs $expect")
    }
  }

  test("q_sample_weighted: exact A-Res replay (md5-derived u, ln(u)/w key) and retry stability") {
    val out = Llm.q_sample_weighted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = mdig.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u52 = java.lang.Long.parseLong(hex, 16)
      math.log((u52 + 1).toDouble / 4503599627370497.0) / w
    }
    val expect = docs.map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(20).map(t => (t._1, t._2))
    assert(out.toSeq.sortBy(_._1) == expect.toSeq.sortBy(_._1))
    val again = Llm.q_sample_weighted(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(again.toSeq == out.toSeq, "retry-stable")
  }

  test("q_mutual_info: cells replay exactly and total MI is non-negative") {
    val out = Relational.q_mutual_info(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "source").collect().map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val cells = docs.groupBy(identity).map { case (k, o) => (k, o.length.toLong) }
    val rl = docs.groupBy(_._1).map { case (k, o) => (k, o.length.toLong) }
    val rs = docs.groupBy(_._2).map { case (k, o) => (k, o.length.toLong) }
    assert(out.length == cells.size)
    out.foreach { case (l, s, c, pmi, mi) =>
      assert(c == cells((l, s)))
      val ratio = (c * n).toDouble / (rl(l) * rs(s)).toDouble
      assert(math.abs(pmi - math.log(ratio)) < 1e-5)
      assert(math.abs(mi - c.toDouble / n * math.log(ratio)) < 1e-5)
    }
    assert(out.map(_._5).sum >= -1e-4, "MI = sum of contributions is non-negative")
  }

  test("q_winsorize: clamped mean sits within the bounds and n matches the group") {
    val out = Relational.q_winsorize(spark, sf).collect()
    val counts = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.length == counts.size)
    out.foreach { r =>
      val (pri, lo, hi) = (r.getString(0), r.getDouble(1), r.getDouble(2))
      val (n, mRaw, mWin) = (r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(n == counts(pri))
      assert(lo <= hi)
      assert(mWin >= lo - 1e-6 && mWin <= hi + 1e-6,
        s"winsorized mean must lie inside the clamp interval ($pri)")
      // clamping pulls the mean toward the interval, never past raw extremes
      assert(math.abs(mWin - mRaw) <= math.max(math.abs(mRaw - lo), math.abs(hi - mRaw)))
    }
  }

  test("q_eval_ndcg: NDCG in (0,1]; DCG <= IDCG; identity ranking gives NDCG 1 on a degenerate slice") {
    val out = Llm.q_eval_ndcg(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (dcg, idcg, ndcg) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(dcg > 0 && idcg > 0 && dcg <= idcg + 1e-9)
      assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
      assert(math.abs(ndcg - dcg / idcg) < 1e-5)
    }
  }

  test("q_eval_f1: tp/fp/fn replay exactly from a naive confusion matrix") {
    val out = Llm.q_eval_f1(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val en = Set("the", "and", "of", "to", "in")
    val es = Set("el", "la", "de", "que", "los")
    val de = Set("der", "die", "das", "und", "ist")
    val pairs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect().map { r =>
        val ws = r.getString(1).split(" ", -1)
        val (a, b, c) = (ws.count(en), ws.count(es), ws.count(de))
        val pred = if (a >= b && a >= c) "en" else if (b >= c) "es" else "de"
        (r.getString(0), pred)
      }
    Seq("de", "en", "es").foreach { cls =>
      val tp = pairs.count(p => p._1 == cls && p._2 == cls).toLong
      val fp = pairs.count(p => p._1 != cls && p._2 == cls).toLong
      val fn = pairs.count(p => p._1 == cls && p._2 != cls).toLong
      assert(out(cls) == ((tp, fp, fn)), s"class $cls")
    }
  }

  test("q_rank_fusion: fused list replays exactly from the two legs' collected rankings") {
    val out = Llm.q_rank_fusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty && out.length <= 20)
    // invariants: rrf matches 1/(60+r1)+1/(60+r2) with 0-sentinel legs
    out.foreach { case (_, r1, r2, rrf) =>
      val expect = (if (r1 > 0) 1.0 / (r1 + 60) else 0.0) +
        (if (r2 > 0) 1.0 / (r2 + 60) else 0.0)
      assert(math.abs(rrf - expect) < 1e-5)
      assert(r1 >= 0 && r1 <= 50 && r2 >= 0 && r2 <= 50)
      assert(r1 > 0 || r2 > 0)
    }
    // fused order is non-increasing in rrf
    assert(out.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-9))
  }
}
