package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM training-data pipeline operators: deduplication (exact, MinHash
  * LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search,
  * and text analysis (language ID, quality scoring, token counting,
  * fingerprinting).
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order array functions + hash built-ins (`xxhash64`, `md5`) —
  * no Scala UDFs in the hot path, so whole-stage codegen spans the full
  * per-document compute.
  *
  * Scale design (100 TB): every candidate-generation step is a
  * *bucketed* equi-join (band-hash or LSH bucket), never an n² cross
  * join; per-document signature compute is embarrassingly parallel map
  * work; the only shuffles are groupBy-bucket + the pair join on bucket
  * keys.
  */
object Llm {
  import Tables._

  // ---- shared vector helpers (array<double>) --------------------------

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  // ---- exact dedup ----------------------------------------------------

  /** Exact dedup = hash groupBy on the content key: one shuffle on
    * `text` (or a digest of it at scale — same plan shape). Keeps the
    * smallest doc_id per text, deterministic.
    */
  def q_dedup_exact(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_cnt"))
      .select("keep_id", "dup_cnt", "text")
      .orderBy("keep_id")

  // ---- MinHash + LSH near-dedup --------------------------------------

  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** doc_id, sigs: array<long> of NumHashes minhashes over 3-word
    * shingles. Signature compute is pure map-side codegen.
    */
  private def minhashSigs(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    val shingles = when(size(words) < 3, array(col("text")))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(words) - 3),
          i => concat_ws(" ", slice(words, i + 1, lit(3))))))
    docs
      .withColumn("shingles", shingles)
      .withColumn("sigs",
        transform(sequence(lit(0), lit(NumHashes - 1)),
          j => aggregate(col("shingles"), lit(Long.MaxValue),
            (acc, sh) => least(acc, xxhash64(sh, j)))))
      .select(col("doc_id"), col("sigs"))
  }

  /** MinHash-LSH near-duplicate pairs: shingle → minhash → band →
    * bucket-join. Candidates only meet inside a (band, band-sig) bucket,
    * so the pair join is a plain equi-join shuffled on the bucket key —
    * the standard at-scale formulation. Estimated Jaccard = fraction of
    * matching signature components, thresholded at 0.5.
    * No DuckDB oracle (hash-dependent); driver rows-only check.
    */
  def q_dedup_minhash(s: SparkSession, d: String): DataFrame = {
    val sigs = minhashSigs(documents(s, d))
    val exploded = sigs
      .select(col("doc_id"), col("sigs"),
        explode(transform(sequence(lit(0), lit(Bands - 1)),
          b => struct(b.as("band"),
            xxhash64(slice(col("sigs"), b * RowsPerBand + 1, lit(RowsPerBand))).as("bsig")))).as("bk"))
      .select(col("doc_id"), col("sigs"), col("bk.band").as("band"), col("bk.bsig").as("bsig"))
    exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        (aggregate(zip_with(col("a.sigs"), col("b.sigs"),
          (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, v) => acc + v)
          .cast("double") / NumHashes).as("est_jaccard"))
      .dropDuplicates("id1", "id2")
      .filter(col("est_jaccard") >= 0.5)
      .orderBy("id1", "id2")
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash per document + Hamming distance to the previous doc.
    * Signature: sign of the per-bit sum of ±1 votes from xxhash64(word).
    * All in SQL higher-order functions (nested lambdas), fully codegen.
    * No oracle (DuckDB has no xxhash64); driver rows-only check.
    */
  def q_dedup_simhash(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("doc_id")
    documents(s, d)
      .withColumn("whash", expr("transform(split(text, ' '), w -> xxhash64(w))"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L, (fp, i) -> fp +
          |  if(aggregate(whash, 0L,
          |       (acc, h) -> acc + if(((h >> i) & 1) = 1, 1L, -1L)) > 0,
          |     shiftleft(1L, i), 0L))""".stripMargin))
      .withColumn("prev_simhash", lag("simhash", 1).over(w))
      .select(
        col("doc_id"), col("simhash"),
        when(col("prev_simhash").isNotNull,
          bit_count(col("simhash").bitwiseXOR(col("prev_simhash")))).as("hamming_prev"))
      .orderBy("doc_id")
  }

  // ---- n-gram Jaccard (oracle-able variant) ---------------------------

  /** Exact word-set Jaccard between consecutive doc_ids — a linear-cost
    * probe of the Jaccard kernel (the full near-dup sweep is
    * q_dedup_minhash; this one is DuckDB-verifiable).
    */
  def q_dedup_ngram(s: SparkSession, d: String): DataFrame = {
    val a = documents(s, d).select(col("doc_id").as("id1"),
      array_distinct(split(col("text"), " ")).as("w1"))
    val b = documents(s, d).select(col("doc_id").as("id2"),
      array_distinct(split(col("text"), " ")).as("w2"))
    a.join(b, col("id2") === col("id1") + 1)
      .select(col("id1"), col("id2"),
        round(size(array_intersect(col("w1"), col("w2"))).cast("double") /
          size(array_union(col("w1"), col("w2"))), 6).as("jaccard"))
      .orderBy("id1")
  }

  // ---- embedding-cosine near-dup via random-hyperplane LSH ------------

  private val Planes = 12
  private val Dim = 64

  /** Near-duplicate embedding pairs: 12-bit random-hyperplane signature
    * → bucket equi-join → exact cosine ≥ 0.95. The brute-force n² cross
    * join never happens; candidate volume is |bucket|² summed, controlled
    * by the signature width. No oracle (hash-dependent).
    */
  def q_dedup_embed(s: SparkSession, d: String): DataFrame = {
    val emb = col("embedding").cast("array<double>")
    // signature via expr: shiftleft with a Column amount isn't in the Scala API
    val withSig = embeddings(s, d)
      .withColumn("e", emb)
      .withColumn("sig", expr(
        s"""aggregate(sequence(0, ${Planes - 1}), 0L, (acc, j) -> acc +
           |  if(aggregate(sequence(0, ${Dim - 1}), 0D,
           |       (dacc, c) -> dacc + e[c] *
           |         ((pmod(xxhash64(j * $Dim + c), 2001L) - 1000L) / 1000D)) > 0D,
           |     shiftleft(1L, j), 0L))""".stripMargin))
      .select(col("vec_id"), col("e"), col("sig"))
    withSig.as("a")
      .join(withSig.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        round(cosine(col("a.e"), col("b.e")), 6).as("cos"))
      .filter(col("cos") >= 0.95)
      .orderBy("id1", "id2")
  }

  // ---- similarity search ---------------------------------------------

  /** Brute-force cosine top-k for a pinned query set (vec_id < 20):
    * broadcast the tiny query side against the full corpus, window
    * top-k per query. This is the exact-baseline; the scale path for
    * all-pairs work is the LSH bucketing above (q_dedup_embed).
    */
  def q_sim_topk(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d).withColumn("e", col("embedding").cast("array<double>"))
    val q = emb.select(col("vec_id").as("qid"), col("e").as("qe")).filter(col("qid") < 20)
    val c = emb.select(col("vec_id").as("cid"), col("e").as("ce"))
    val w = Window.partitionBy("qid").orderBy(col("cos_raw").desc, col("cid"))
    c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos_raw", round(cosine(col("qe"), col("ce")), 9))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("rn"), col("cid"), round(col("cos_raw"), 6).as("cos"))
      .orderBy("qid", "rn")
  }

  // ---- text analysis --------------------------------------------------

  def q_text_stats(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")

  def q_lang_filter(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(col("lang").isin("es", "de", "zh") && col("n_chars") >= 200)
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  private val EnStops = Seq("the", "and", "of", "to", "in")
  private val EsStops = Seq("el", "la", "de", "que", "los")
  private val DeStops = Seq("der", "die", "das", "und", "ist")

  private def stopHits(words: Column, stops: Seq[String]): Column =
    size(filter(words, w => w.isInCollection(stops))).cast("long")

  /** Stopword-profile language ID — an n-gram-style heuristic whose
    * scoring is exactly reproducible in the DuckDB oracle.
    */
  def q_lang_id(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    documents(s, d)
      .select(
        col("doc_id"),
        stopHits(words, EnStops).as("s_en"),
        stopHits(words, EsStops).as("s_es"),
        stopHits(words, DeStops).as("s_de"))
      .withColumn("pred_lang",
        when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de"), "en")
          .when(col("s_es") >= col("s_de"), "es")
          .otherwise("de"))
      .orderBy("doc_id")
  }

  /** Length / stopword-ratio quality score — integer-derived arithmetic
    * only, so bit-identical across engines.
    */
  def q_quality_score(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(words).cast("long").as("n_tok"),
        stopHits(words, EnStops).as("stop_hits"))
      // +1e-9 before each round: the ratios are small-denominator
      // rationals that land exactly on x.xxxx5 round boundaries, where
      // Spark (BigDecimal HALF_UP on the true double) and DuckDB
      // disagree; the epsilon pushes ties off the boundary identically
      // in both engines (boundary-distance of non-ties is >= 5e-5).
      .withColumn("avg_wlen",
        round((col("n_chars") - (col("n_tok") - 1)).cast("double") / col("n_tok") + 1e-9, 4))
      .withColumn("stop_ratio", round(col("stop_hits").cast("double") / col("n_tok") + 1e-9, 4))
      .withColumn("score",
        round(least(lit(1.0), col("n_tok").cast("double") / 100.0) * 0.5 +
          col("stop_ratio") * 0.5 + 1e-9, 4))
      .select("doc_id", "n_tok", "avg_wlen", "stop_ratio", "score")
      .orderBy("doc_id")
  }

  /** Whitespace + BPE-ish regex token counts. */
  def q_token_count(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]', 0)")).cast("long").as("re_tokens"))
      .orderBy("doc_id")

  /** Document fingerprints: md5 of normalized text + min-word-hash (a
    * 1-gram winnowing fingerprint). Both reproducible in DuckDB.
    */
  def q_fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(
        col("doc_id"),
        md5(lower(trim(col("text"))).cast("binary")).as("fp_md5"),
        array_min(transform(split(col("text"), " "), w => md5(w.cast("binary")))).as("fp_minword"))
      .orderBy("doc_id")
}
