package graft

/** DuckDB oracle SQL for the hash-kernel gate queries — the queries that
  * were "rows-only by design" because their values derive from the
  * engine's own FNV-1a / splitmix64 / minhash kernels
  * (`graft.functions.TextKernels`), which no stock SQL function
  * reproduces. The round-7 playbook (pagerank's unrolled decimal CTE,
  * MMR's recursive CTE) extends to these: the kernels are DETERMINISTIC
  * integer arithmetic, so they are SQL-expressible with 64-bit wrapping
  * semantics emulated in DuckDB's HUGEINT (int128) domain:
  *
  *  - `x * y mod 2^64` — split the 64-bit operand into 32-bit halves so
  *    every partial product fits int128: `(lo·C + ((hi·C) mod 2^32)·2^32)
  *    mod 2^64`.
  *  - `x ^ y` — map [0, 2^64) to signed BIGINT two's-complement, use
  *    native `xor`, map back.
  *  - `x >>> n` — floor-division by 2^n on the unsigned representation.
  *
  * splitmix64's three mix steps run as a chain of CTE COLUMN steps (one
  * step references the previous step's column), which both avoids the
  * exponential subexpression blowup of naive inlining and keeps
  * evaluation columnar — the same computation phrased as nested list
  * lambdas measured ~6× slower in DuckDB.
  *
  * Everything here replicates `TextKernels` semantics exactly: FNV-1a
  * over ASCII bytes (`ord(char)` = byte on the all-ASCII gate corpus —
  * the kernel itself documents byte/char FNV coincidence on ASCII),
  * word/shingle hashing, the 32-component minhash family (HashA/HashB
  * literals generated from the same splitmix64 seeds), LSH banding (the
  * oracle groups on the raw 4-component signature SLICE where Spark
  * groups on `xxhash64(slice)` — bucket contents are identical absent a
  * 64-bit hash collision, and only bucket contents reach the output),
  * the winnowing window minimum (SIGNED long comparison, as in the JVM),
  * and SimHash's per-bit ±1 votes.
  */
object OracleSql {

  private val U64 = "18446744073709551616::HUGEINT"
  private val U63 = "9223372036854775808::HUGEINT"

  /** unsigned HUGEINT expr in [0, 2^64) → signed BIGINT two's complement */
  private def sgn(u: String): String =
    s"(CASE WHEN ($u) >= $U63 THEN (($u) - $U64)::BIGINT ELSE ($u)::BIGINT END)"

  /** signed BIGINT expr → unsigned HUGEINT in [0, 2^64) */
  private def uns(b: String): String =
    s"(CASE WHEN ($b) < 0 THEN ($b)::HUGEINT + $U64 ELSE ($b)::HUGEINT END)"

  /** (a ^ b) on the unsigned-HUGEINT representation */
  private def xor64(a: String, b: String): String =
    uns(s"xor(${sgn(a)}, ${sgn(b)})")

  /** (u * c) mod 2^64 — u in [0, 2^64), c a 64-bit constant expr */
  private def mulmod(u: String, c: String): String =
    s"(((($u) % 4294967296::HUGEINT) * ($c) + (((($u) // 4294967296::HUGEINT) * ($c)) " +
      s"% 4294967296::HUGEINT) * 4294967296::HUGEINT) % $U64)"

  /** splitmix64 as four chained CTEs applying the mix steps to `colIn`
    * of `cteIn`; returns (cteListSql, finalCteName). `carry` = columns
    * to thread through.
    */
  private def smSteps(cteIn: String, colIn: String, p: String, colOut: String,
                      carry: String): (String, String) = {
    val c = if (carry.isEmpty) "" else carry + ", "
    val z1 = s"((($colIn) + 11400714819323198485::HUGEINT) % $U64)"
    val z2 = mulmod(xor64("z1", "z1 // 1073741824::HUGEINT"), "13787848793156543929::HUGEINT")
    val z3 = mulmod(xor64("z2", "z2 // 134217728::HUGEINT"), "10723151780598845931::HUGEINT")
    val z4 = xor64("z3", "z3 // 2147483648::HUGEINT")
    (Seq(
      s"${p}a AS (SELECT $c$z1 AS z1 FROM $cteIn)",
      s"${p}b AS (SELECT $c$z2 AS z2 FROM ${p}a)",
      s"${p}c AS (SELECT $c$z3 AS z3 FROM ${p}b)",
      s"${p}d AS (SELECT $c$z4 AS $colOut FROM ${p}c)").mkString(",\n"), s"${p}d")
  }

  /** splitmix64 as a single expression (for one-off evaluations where a
    * CTE chain is impossible, e.g. inside a lambda): a 3-step struct
    * fold via list_reduce, so the input expr `x` appears exactly once.
    */
  private def smExpr(x: String): String = {
    val z1 = s"((($x) + 11400714819323198485::HUGEINT) % $U64)"
    val step = mulmod(xor64("a.z", "(a.z // b.d)"), "b.m")
    val steps = "[{'z': 0::HUGEINT, 'd': 1073741824::HUGEINT, 'm': 13787848793156543929::HUGEINT}, " +
      "{'z': 0::HUGEINT, 'd': 134217728::HUGEINT, 'm': 10723151780598845931::HUGEINT}, " +
      "{'z': 0::HUGEINT, 'd': 2147483648::HUGEINT, 'm': 1::HUGEINT}]"
    s"(list_reduce(list_prepend({'z': $z1, 'd': 1::HUGEINT, 'm': 1::HUGEINT}, $steps), " +
      s"(a, b) -> {'z': $step, 'd': 1::HUGEINT, 'm': 1::HUGEINT}).z)"
  }

  /** FNV-1a 64 of a VARCHAR expr's ASCII bytes (empty → offset basis).
    * The multiply-by-prime fits int128 directly (2^64 · 2^41 < 2^127);
    * the byte XOR touches only the low 8 bits, so it runs in BIGINT
    * without the two's-complement mapping.
    */
  private def fnv(w: String): String = {
    val body = s"(((h) - (h) % 256::HUGEINT + xor(((h) % 256::HUGEINT)::BIGINT, (c)::BIGINT)::HUGEINT) " +
      s"* 1099511628211::HUGEINT) % $U64"
    s"(CASE WHEN ($w) = '' THEN 14695981039346656037::HUGEINT ELSE " +
      s"list_reduce(list_prepend(14695981039346656037::HUGEINT, " +
      s"list_transform(string_split(($w), ''), ch -> ord(ch)::HUGEINT)), " +
      s"(h, c) -> $body) END)"
  }

  /** Java `String.split(" ")` of a VARCHAR expr, as TextKernels
    * .tokenHashes implements it (its documented contract): trailing
    * empty tokens DROPPED, `''` → `['']`, all-spaces → `[]`, NULL
    * treated as `''`. DuckDB's bare `string_split(t, ' ')` keeps
    * trailing empties and nulls through — on a corpus with trailing
    * spaces or NULL text the kernel-replica oracles would report false
    * mismatches (round-8 ADVICE; fixtures were verified clean, this
    * closes the latent class).
    */
  private def javaSplit(t: String): String =
    s"(CASE WHEN regexp_matches(coalesce($t, ''), '^ +$$') THEN []::VARCHAR[] " +
      s"ELSE string_split(regexp_replace(coalesce($t, ''), ' +$$', ''), ' ') END)"

  // ---- minhash permutation family: regenerate HashA/HashB from the
  // same splitmix64 seeds as TextKernels (shared constants, can't drift
  // silently — OracleConstantsSpec pins them against the kernel arrays)

  private[graft] def splitmixLong(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private val hashA = Array.tabulate(32)(j => splitmixLong(2L * j) & 0x3fffffffL | 1L)
  private val hashB = Array.tabulate(32)(j => splitmixLong(2L * j + 1) & 0xffffffffL)
  private val aLit = hashA.mkString("[", ",", "]::BIGINT[]")
  private val bLit = hashB.mkString("[", ",", "]::BIGINT[]")
  private val pow2Lit = // 2^0..2^63 as unsigned HUGEINT
    (0 until 64).map(b => java.math.BigInteger.ONE.shiftLeft(b)).mkString("[", ",", "]::HUGEINT[]")

  /** CTE chain `<p>docs → <p>wf → <p>tri → … → <p>exploded` computing
    * per-doc 32-component minhash signatures and the 8 LSH band rows
    * (band, bkey = raw 4-component slice) for `docsSql(doc_id, text)`.
    */
  private def minhashCtes(p: String, docsSql: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"""${p}docs AS (
  SELECT doc_id, coalesce(text, '') AS text, ${javaSplit("text")} AS ws,
         len(${javaSplit("text")}) AS nw
  FROM ($docsSql))"""
    parts += s"""${p}wf AS (
  SELECT doc_id, u.i AS i, ${fnv("u.w")} AS f, nw
  FROM (SELECT doc_id, nw, unnest(list_transform(ws, (w, i) -> {'w': w, 'i': i})) AS u
        FROM ${p}docs WHERE nw >= 3))"""
    parts += s"""${p}tri AS (
  SELECT a.doc_id, a.i, a.f AS f1, b.f AS f2, c.f AS f3
  FROM ${p}wf a
  JOIN ${p}wf b ON b.doc_id = a.doc_id AND b.i = a.i + 1
  JOIN ${p}wf c ON c.doc_id = a.doc_id AND c.i = a.i + 2)"""
    // sh = sm(f1 ^ sm(f2 ^ sm(f3))) — TextKernels.minhashSig's 3-word
    // shingle chain, stepped through 12 columnar CTEs
    val (s1, l1) = smSteps(s"${p}tri", "f3", s"${p}s1", "m1", "doc_id, i, f1, f2")
    parts += s1
    val (s2, l2) = smSteps(l1, xor64("f2", "m1"), s"${p}s2", "m2", "doc_id, i, f1")
    parts += s2
    val (s3, l3) = smSteps(l2, xor64("f1", "m2"), s"${p}s3", "sh", "doc_id, i")
    parts += s3
    parts += s"""${p}shrow AS (
  SELECT doc_id, sh FROM $l3
  UNION ALL
  SELECT doc_id, ${smExpr(fnv("text"))} AS sh FROM ${p}docs WHERE nw < 3)"""
    parts += s"""${p}hp AS (
  SELECT j, ($aLit)[j] AS ha, ($bLit)[j] AS hb FROM generate_series(1, 32) AS g(j))"""
    parts += s"""${p}sigv AS (
  SELECT doc_id, j, min(ha * ((sh % 4294967296::HUGEINT))::BIGINT + hb) AS v
  FROM ${p}shrow CROSS JOIN ${p}hp GROUP BY doc_id, j)"""
    parts += s"""${p}sig AS (
  SELECT doc_id, list(v ORDER BY j) AS sigs FROM ${p}sigv GROUP BY doc_id)"""
    parts += s"""${p}exploded AS (
  SELECT doc_id, sigs, b AS band, sigs[4*b+1:4*b+4] AS bkey
  FROM ${p}sig, generate_series(0, 7) AS g(b))"""
    parts.mkString(",\n")
  }

  /** matched-signature-component estimate for a pair aliased a/b */
  private val est32 = "list_sum(list_transform(generate_series(1, 32), " +
    "k -> CASE WHEN a.sigs[k] = b.sigs[k] THEN 1 ELSE 0 END)) / 32.0"

  /** `<p>capped → <p>cand → … → <p>verified`: the 256-cap, the
    * within-bucket pair join, and the exact shingle-set Jaccard verify
    * in RELATIONAL form — one (doc_id, md5(shingle)) row per distinct
    * shingle of a CANDIDATE doc, intersections via a digest equi-join
    * grouped per pair. The earlier per-doc shingle LISTs
    * (`list_intersect` per pair row) materialized the whole corpus as
    * VARCHAR lists and OOM'd DuckDB at sf10; digest rows hash-join and
    * spill instead, and only candidate docs are shingled at all.
    * Jaccard = ni / (n1 + n2 − ni) divides the same exact integers as
    * the engine's |A∩B| / |A∪B| (md5 is collision-free at any tested
    * corpus size).
    */
  private def pairCtes(p: String): String = s"""
${p}capped AS MATERIALIZED (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bn FROM ${p}exploded)
  WHERE bn <= 256
), ${p}cand AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2, $est32 AS est_jaccard
  FROM ${p}capped a JOIN ${p}capped b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
), ${p}cdocs AS MATERIALIZED (
  SELECT DISTINCT doc_id FROM (
    SELECT id1 AS doc_id FROM ${p}cand UNION ALL SELECT id2 FROM ${p}cand)
), ${p}shr AS MATERIALIZED (
  SELECT DISTINCT doc_id, md5(s) AS shd FROM (
    SELECT d.doc_id,
           unnest(list_transform(generate_series(1, nw - 2),
             i -> ws[i] || chr(1) || ws[i+1] || chr(1) || ws[i+2])) AS s
    FROM ${p}docs d SEMI JOIN ${p}cdocs USING (doc_id) WHERE nw >= 3
    UNION ALL
    SELECT d.doc_id, coalesce(text, '') AS s
    FROM ${p}docs d SEMI JOIN ${p}cdocs USING (doc_id) WHERE nw < 3)
), ${p}shn AS MATERIALIZED (
  SELECT doc_id, count(*) AS nsh FROM ${p}shr GROUP BY doc_id
), ${p}inter AS MATERIALIZED (
  SELECT c.id1, c.id2, count(*) AS ni
  FROM ${p}cand c
  JOIN ${p}shr a ON a.doc_id = c.id1
  JOIN ${p}shr b ON b.doc_id = c.id2 AND b.shd = a.shd
  GROUP BY c.id1, c.id2
), ${p}verified AS MATERIALIZED (
  SELECT id1, id2, est_jaccard, jaccard FROM (
    SELECT c.id1, c.id2, c.est_jaccard,
           coalesce(i.ni, 0)::DOUBLE / (n1.nsh + n2.nsh - coalesce(i.ni, 0)) AS jaccard
    FROM ${p}cand c
    LEFT JOIN ${p}inter i ON i.id1 = c.id1 AND i.id2 = c.id2
    JOIN ${p}shn n1 ON n1.doc_id = c.id1
    JOIN ${p}shn n2 ON n2.doc_id = c.id2)
  WHERE jaccard >= 0.5
)"""

  private val allDocs = "SELECT doc_id, text FROM documents"

  /** q_dedup_minhash: the full LSH candidates→verify pipeline. */
  val dedupMinhash: String =
    "WITH " + minhashCtes("mh_", allDocs) + "," + pairCtes("mh_") + """
SELECT id1, id2, est_jaccard, jaccard FROM mh_verified ORDER BY id1, id2"""

  /** Min-label connected components over `mh_verified` as UNROLLED
    * pointer-jumping rounds (the recursive-CTE reachability form
    * accumulated (id, label) pairs diameter-by-diameter and walled the
    * sf10 sweep at 2400 s). Each round folds, per node, its own label,
    * its neighbors' labels (one hop) and its label's label (pointer
    * jump), so reach at round k is ≥ 2^k: `rounds` = 12 certifies any
    * component of diameter ≤ 4096 — far beyond the capped LSH pair
    * graph. The label table holds only nodes that HAVE edges
    * (singletons rejoin at the end), keeping every round linear in the
    * pair count, not the corpus. `ccviol` is the loud non-convergence
    * sentinel: an edge with differing final labels appends an
    * impossible extra row, failing the row-count compare instead of
    * silently shipping wrong clusters.
    */
  private def closureCtes(rounds: Int): String = {
    // every ccl round references its predecessor 3× — DuckDB v1.0
    // INLINES each reference (no auto-materialization), which makes the
    // naive form 3^rounds copies of the whole upstream pipeline; the
    // MATERIALIZED hint pins each round to one evaluation
    val roundCtes = (1 to rounds).map { k =>
      s"""ccl$k AS MATERIALIZED (
  SELECT id, min(lab) AS lab FROM (
    SELECT id, lab FROM ccl${k - 1}
    UNION ALL
    SELECT e.a AS id, l.lab FROM cc_edges e JOIN ccl${k - 1} l ON l.id = e.b
    UNION ALL
    SELECT x.id, y.lab FROM ccl${k - 1} x JOIN ccl${k - 1} y ON y.id = x.lab)
  GROUP BY id)"""
    }.mkString(",\n")
    s"""cc_edges AS MATERIALIZED (
  SELECT id1 AS a, id2 AS b FROM mh_verified
  UNION SELECT id2, id1 FROM mh_verified
), ccl0 AS MATERIALIZED (
  SELECT a AS id, least(a, min(b)) AS lab FROM cc_edges GROUP BY a
),
$roundCtes,
cclf AS MATERIALIZED (SELECT id, lab FROM ccl$rounds),
ccviol AS (
  SELECT 1 AS v FROM cc_edges e
  JOIN cclf la ON la.id = e.a JOIN cclf lb ON lb.id = e.b
  WHERE la.lab <> lb.lab),
cl AS (
  SELECT d.doc_id, coalesce(l.lab, d.doc_id) AS cluster
  FROM documents d LEFT JOIN cclf l ON l.id = d.doc_id)"""
  }

  /** q_dedup_clusters: min-label connected components over the verified
    * pair set (unrolled pointer jumping; see [[closureCtes]]).
    */
  val dedupClusters: String =
    "WITH " + minhashCtes("mh_", allDocs) + "," + pairCtes("mh_") + ",\n" +
      closureCtes(12) + """
SELECT doc_id, cluster, cluster = doc_id AS keep FROM cl
UNION ALL
SELECT -1::BIGINT, -1::BIGINT, false FROM (SELECT v FROM ccviol LIMIT 1) t
ORDER BY doc_id"""

  /** q_dedup_keep_best: same closure, but the survivor is the longest
    * cluster member (ties → smallest doc_id).
    */
  val dedupKeepBest: String =
    "WITH " + minhashCtes("mh_", allDocs) + "," + pairCtes("mh_") + ",\n" +
      closureCtes(12) + """,
scored AS (
  SELECT c.doc_id, c.cluster, strlen(d.text)::BIGINT AS n_bytes,
         row_number() OVER (PARTITION BY c.cluster
           ORDER BY strlen(d.text) DESC, c.doc_id) AS rk
  FROM cl c JOIN documents d USING (doc_id))
SELECT doc_id, cluster, n_bytes, rk = 1 AS keep FROM scored
UNION ALL
SELECT -1::BIGINT, -1::BIGINT, -1::BIGINT, false FROM (SELECT v FROM ccviol LIMIT 1) t
ORDER BY doc_id"""

  /** q_tokenizer_fertility: the bpeEncode merge replay grouped at the
    * language grain — tokens-per-word as the round-half-up ppm integer.
    * Every distinct corpus word is in the trained vocab, so the
    * word-occurrence join is lossless and n_words is the exact
    * nonempty-whitespace-token count.
    */
  val tokenizerFertility: String = {
    val n = 30
    val sep = "chr(31)"
    val ss = s"($sep || $sep)"
    s"""WITH ${bpeRounds(n, carryWord = true)},
vocab AS (
  SELECT w, string_split(substr(s, 2, len(s)-2), $ss) AS toks FROM w$n),
docw AS (
  SELECT lang, u.w AS w
  FROM (SELECT lang,
          unnest(list_transform(string_split(text, ' '), (w, i) -> {'w': w, 'i': i})) AS u
        FROM documents)
  WHERE u.w <> ''),
ft AS (
  SELECT lang, count(*)::BIGINT AS n_words, sum(len(toks))::BIGINT AS n_tokens
  FROM docw JOIN vocab USING (w) GROUP BY lang)
SELECT lang, n_words, n_tokens,
  CAST((2000000 * n_tokens + n_words) // (2 * n_words) AS BIGINT) AS fertility_ppm
FROM ft ORDER BY lang"""
  }

  /** q_pipeline_release: the end-to-end corpus-release pipeline —
    * normalize (the regex idiom the engine auto-lowers to its kernel) →
    * lang/quality gate → exact dedup on the norm key → MinHash-LSH
    * near-dup drop (the full HUGEINT minhash replica over the SURVIVOR
    * relation, larger id of each verified pair dropped) → Neyman-
    * allocation stratified sample (budget 200, the q_sample_neyman
    * arithmetic over the deduped relation) → the q_corpus_card rollup
    * over the sample. The snapshot-table legs of the engine pipeline
    * are value-neutral (commit + read-back of the same rows), so the
    * oracle replays the relational stages only.
    */
  val pipelineRelease: String = {
    val normKey = "md5(lower(trim(regexp_replace(regexp_replace(text, " +
      "'[^a-zA-Z0-9 ]', '', 'g'), ' +', ' ', 'g'))))"
    "WITH rl_base AS (\n" +
      s"  SELECT doc_id, text, lang, source, n_chars, $normKey AS norm_key,\n" +
      "    len(string_split(text, ' ')) AS n_tok\n" +
      "  FROM documents),\n" +
      """rl_kept AS (
  SELECT * FROM rl_base WHERE lang IN ('es', 'de', 'zh') AND n_tok >= 5),
rl_uniq AS (
  SELECT doc_id, text, lang, source, n_chars FROM (
    SELECT *, row_number() OVER (PARTITION BY norm_key ORDER BY doc_id) AS rn0
    FROM rl_kept)
  WHERE rn0 = 1),
""" +
      minhashCtes("rel_", "SELECT doc_id, text FROM rl_uniq") + "," +
      pairCtes("rel_") + """,
rl_drop AS (SELECT DISTINCT id2 AS doc_id FROM rel_verified),
rl_ded AS (SELECT u.* FROM rl_uniq u ANTI JOIN rl_drop USING (doc_id)),
rl_st AS (
  SELECT source, count(*)::HUGEINT AS n,
    sum(n_chars::HUGEINT) AS s1, sum((n_chars::HUGEINT) * (n_chars::HUGEINT)) AS s2
  FROM rl_ded GROUP BY source),
rl_wv AS (
  SELECT source, n,
    n * (CASE WHEN n > 1
      THEN CAST(round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
             / CAST(n * (n - 1) AS DOUBLE)) * 1000000 + 1e-9) AS HUGEINT)
      ELSE 0::HUGEINT END) AS w
  FROM rl_st),
rl_tot AS (SELECT sum(w) AS bigw FROM rl_wv),
rl_shares AS (
  SELECT source, n, (200 * w) // bigw AS base, (200 * w) % bigw AS rem
  FROM rl_wv CROSS JOIN rl_tot),
rl_def AS (SELECT 200 - sum(base) AS deficit FROM rl_shares),
rl_alloc AS (
  SELECT source,
    CAST(least(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                           <= deficit THEN 1 ELSE 0 END, n) AS BIGINT) AS n_h
  FROM rl_shares CROSS JOIN rl_def),
rl_d AS (
  SELECT doc_id, text, lang, source, n_chars,
    row_number() OVER (PARTITION BY source
      ORDER BY md5(source || ':' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM rl_ded),
rl_samp AS (
  SELECT d.* FROM rl_d d JOIN rl_alloc USING (source) WHERE rn <= n_h),
rl_g AS (
  SELECT source, lang, n_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
""" +
      s"    $normKey AS k\n" +
      """  FROM rl_samp),
rl_card AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
    round(quantile_cont(n_chars, 0.5) + 1e-9, 1) AS p50_chars,
    round(quantile_cont(n_chars, 0.95) + 1e-9, 1) AS p95_chars
  FROM rl_g GROUP BY source),
rl_dups AS (
  SELECT source, CAST(sum(c) - count(*) AS BIGINT) AS n_dups
  FROM (SELECT source, k, count(*) AS c FROM rl_g GROUP BY source, k)
  GROUP BY source),
rl_ent AS (
  SELECT source,
    CAST(sum(CAST(round(-p * ln(p) * 1000000 + 1e-9, 0) AS BIGINT)) AS BIGINT)
      AS lang_entropy_micro
  FROM (SELECT source,
          CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY source) AS p
        FROM (SELECT source, lang, count(*) AS c FROM rl_g GROUP BY source, lang))
  GROUP BY source)
SELECT source, n_docs, n_tokens, p50_chars, p95_chars, n_dups, lang_entropy_micro
FROM rl_card JOIN rl_dups USING (source) JOIN rl_ent USING (source)
ORDER BY source"""
  }

  /** q_dedup_bucket_stats: the LSH bucket-size distribution summary. */
  val dedupBucketStats: String =
    "WITH " + minhashCtes("mh_", allDocs) + """,
bs AS (SELECT band, bkey, count(*)::BIGINT AS n FROM mh_exploded GROUP BY band, bkey)
SELECT count(*)::BIGINT AS buckets,
       max(n) AS max_bucket,
       sum(CASE WHEN n > 1 THEN n * (n - 1) / 2 ELSE 0 END)::DOUBLE AS candidate_pairs,
       count(CASE WHEN n > 256 THEN 1 END)::BIGINT AS dropped_buckets,
       coalesce(sum(CASE WHEN n > 256 THEN n END), 0)::BIGINT AS dropped_doc_slots
FROM bs"""

  /** q_contamination_fuzzy: train×eval band-bucket meet with the
    * planted canary (smallest train doc re-entered as eval id −1) and
    * the cap on the train side only, est ≥ 0.5 — mirrors
    * `Llm.contaminationFuzzy` stage for stage.
    */
  val contaminationFuzzy: String = {
    val trainDocs = "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0"
    val evalDocs = "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1 " +
      "UNION ALL SELECT -1::BIGINT AS doc_id, text FROM " +
      "(SELECT text FROM documents WHERE doc_id % 2 = 0 ORDER BY doc_id LIMIT 1)"
    "WITH " + minhashCtes("ct_", trainDocs) + ",\n" + minhashCtes("ce_", evalDocs) + s""",
ct_capped AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bn FROM ct_exploded)
  WHERE bn <= 256
)
SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS eval_id, $est32 AS est_jaccard
FROM ct_capped a JOIN ce_exploded b ON a.band = b.band AND a.bkey = b.bkey
WHERE $est32 >= 0.5
ORDER BY train_id, eval_id"""
  }

  /** q_dedup_snm: sorted-neighborhood blocking — normalized-key sort,
    * w=3 sliding window as two lag columns, word-set Jaccard verify.
    * Same window partition (2-char key prefix) and (sk, doc_id)
    * tie-break as the engine; the Jaccard is a division of two small
    * ints, IEEE-identical in both engines.
    */
  val dedupSnm: String = {
    def wset(t: String) = s"list_distinct(string_split($t, ' '))"
    def jac(a: String, b: String) =
      s"len(list_intersect(${wset(a)}, ${wset(b)}))::DOUBLE / " +
        s"len(list_distinct(list_concat(${wset(a)}, ${wset(b)})))"
    def arm(k: Int) =
      s"""SELECT least(doc_id, p${k}_id) AS id1, greatest(doc_id, p${k}_id) AS id2,
       ${jac("text", s"p${k}_text")} AS jaccard
FROM lagged WHERE p${k}_id IS NOT NULL"""
    s"""WITH snm0 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT -1::BIGINT, text FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 1)),
keyed AS (
  SELECT doc_id, text,
         substr(lower(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')), 1, 12) AS sk
  FROM snm0),
lagged AS (
  SELECT doc_id, text,
         lag(doc_id, 1) OVER w AS p1_id, lag(text, 1) OVER w AS p1_text,
         lag(doc_id, 2) OVER w AS p2_id, lag(text, 2) OVER w AS p2_text
  FROM keyed
  WINDOW w AS (PARTITION BY substr(sk, 1, 2) ORDER BY sk, doc_id)),
pr AS (${arm(1)} UNION ALL ${arm(2)})
SELECT DISTINCT id1, id2, jaccard FROM pr
WHERE jaccard >= 0.5 ORDER BY id1, id2"""
  }

  /** q_dedup_simhash: per-bit ±1 votes over splitmix-mixed FNV word
    * hashes, packed to a signed 64-bit signature, then the bucketed lag
    * window and Hamming distance.
    */
  val dedupSimhash: String = {
    val (smS, smLast) = smSteps("sx_wf", "f", "sx_s1", "h", "doc_id")
    s"""WITH sx_docs AS (
  SELECT doc_id, text FROM documents),
sx_wf AS (
  SELECT doc_id, ${fnv("w")} AS f
  FROM (SELECT doc_id, unnest(${javaSplit("text")}) AS w FROM sx_docs
        WHERE text IS NOT NULL)),
$smS,
sx_votes AS (
  SELECT doc_id, b,
         sum(((h // ($pow2Lit)[b+1]) % 2::HUGEINT)::BIGINT) AS ones,
         count(*) AS n
  FROM $smLast, generate_series(0, 63) AS g(b)
  GROUP BY doc_id, b),
sx_sig AS (
  SELECT doc_id,
         ${sgn("sum(CASE WHEN 2 * ones > n THEN (" + pow2Lit + ")[b+1] ELSE 0::HUGEINT END)")} AS simhash
  FROM sx_votes GROUP BY doc_id
  UNION ALL
  -- kernel: NULL doc casts no votes (sig 0), and an all-space doc has zero
  -- tokens after the trailing-empty drop, so it votes nothing too
  SELECT doc_id, 0::BIGINT AS simhash FROM sx_docs
  WHERE doc_id NOT IN (SELECT doc_id FROM sx_wf))
SELECT doc_id, simhash,
       CASE WHEN prev IS NOT NULL THEN bit_count(xor(simhash, prev))::INTEGER END AS hamming_prev
FROM (SELECT doc_id, simhash,
             lag(simhash) OVER (PARTITION BY doc_id // 10000 ORDER BY doc_id) AS prev
      FROM sx_sig)
ORDER BY doc_id"""
  }

  /** q_winnow: per-word FNV, 5-gram splitmix chains, SIGNED window-of-4
    * minima, first-occurrence dedup (order-insensitive here: the gate
    * surfaces count/min/max/sorted-CSV digest).
    */
  val winnow: String = {
    val gramBody = smExpr(xor64("h", "f"))
    s"""WITH w1 AS (
  SELECT doc_id,
         list_transform(${javaSplit("text")}, w -> ${fnv("w")}) AS wh,
         coalesce(text, '') AS text
  FROM documents
), g1 AS (
  SELECT doc_id,
         CASE WHEN len(wh) < 5
              THEN [${sgn(smExpr(fnv("text")))}]
              ELSE list_transform(
                     list_transform(generate_series(1, len(wh) - 4),
                       i -> list_reduce(list_prepend(0::HUGEINT, wh[i:i+4]),
                              (h, f) -> $gramBody)),
                     u -> ${sgn("u")})
         END AS grams,
         len(wh) AS nw
  FROM w1
), f1 AS (
  SELECT doc_id,
         CASE WHEN nw < 5 THEN grams
              ELSE list_distinct(list_transform(
                     generate_series(1, greatest(1, len(grams) - 3)),
                     w -> list_min(grams[w:w+3])))
         END AS fps
  FROM g1
)
SELECT doc_id,
       len(fps)::BIGINT AS n_fp,
       list_min(fps) AS fp_min,
       list_max(fps) AS fp_max,
       md5(array_to_string(list_sort(fps), ',')) AS fp_digest
FROM f1 ORDER BY doc_id"""
  }

  /** q_dedup_cdc: content-defined chunking census. The boundary rule is
    * a pure per-token predicate (low 4 bits of splitmix64(fnv(token))
    * are zero); chunk identity = md5 of the single-space-joined tokens
    * (byte-identical to the kernel's byte-slice emission). Canary doc
    * −1 = smallest doc's text, as in the engine.
    *
    * Memory shape (two sf10 OOM lessons): the HUGEINT splitmix chain
    * runs once per DISTINCT word (Zipf-bounded vocab) and fans back out
    * through a broadcast MAP lookup; chunking happens as per-doc LIST
    * ops (boundary positions → range slices → md5) so DuckDB streams
    * doc by doc — the earlier window-prefix-sum + ordered string_agg
    * over the 27M-row token stream OOM'd at a 30 GB cap, this form
    * runs sf10 in ~13 s.
    */
  val dedupCdc: String = {
    val bnd = s"((${smExpr(fnv("w"))}) % 16 = 0)"
    s"""WITH cdocs0 AS (
  SELECT doc_id, coalesce(text, '') AS text FROM documents
  UNION ALL
  SELECT -1::BIGINT, coalesce(text, '')
  FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 1)),
cdocs AS (SELECT doc_id, ${javaSplit("text")} AS ws FROM cdocs0),
wb AS (
  SELECT w, $bnd AS bnd
  FROM (SELECT DISTINCT unnest(ws) AS w FROM cdocs)),
bm AS (SELECT map(list(w), list(bnd)) AS m FROM wb),
docs2 AS (
  SELECT doc_id, ws, list_transform(ws, w -> (m[w])[1]) AS bnds
  FROM cdocs, bm WHERE len(ws) > 0),
ranged AS (
  SELECT doc_id, ws,
         list_filter(generate_series(1, len(ws)),
                     i -> i = len(ws) OR bnds[i]) AS ends
  FROM docs2),
chunks AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ends)),
           k -> md5(array_to_string(
                  ws[(CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END):ends[k]],
                  ' '))) AS cks
  FROM ranged),
occ AS (SELECT doc_id, unnest(cks) AS ck FROM chunks),
freq AS (SELECT ck FROM occ GROUP BY ck HAVING count(DISTINCT doc_id) > 1)
SELECT o.doc_id, count(*)::BIGINT AS n_chunks,
       coalesce(sum(CASE WHEN f.ck IS NOT NULL THEN 1 ELSE 0 END), 0)::BIGINT AS n_dup_chunks
FROM occ o LEFT JOIN freq f ON o.ck = f.ck
GROUP BY o.doc_id ORDER BY doc_id"""
  }

  // ---- BPE: the last deterministic-but-iterative gates. Training
  // unrolls its fixed merge budget as CTE rounds (the pagerank
  // playbook); the greedy non-overlapping PER-WORD merge — the part
  // with no relational form — runs as a string `replace` over a
  // separator-encoded symbol string: every symbol is wrapped in
  // chr(31) flanks (`\x1f a \x1f\x1f b \x1f`), so replacing
  // `\x1f l \x1f\x1f r \x1f` with `\x1f lr \x1f` is EXACTLY the
  // kernel's left-to-right non-overlapping scan (each symbol owns its
  // flanks — consuming a match can never eat the next match's
  // boundary, and replace() scans left-to-right without rescanning
  // its own output). chr(31) never occurs in the corpus (asserted
  // ASCII-printable, same contract as the FNV byte/char coincidence).
  // Each w-round is referenced twice (pair count + merge apply), so
  // the rounds are AS MATERIALIZED — naive inlining doubles the tree
  // per round (2^30 by the encode gate's budget).

  /** CTE chain `w0 → (p1, t1, w1) → … → (pN, tN, wN)`: `w{i}` =
    * distinct-word table (sep-encoded symbol string + count) after i
    * merges; `t{i}` = round i's winning pair by (freq DESC, l, r) —
    * the kernel's total tie-break, byte-identical on the ASCII corpus.
    */
  private def bpeRounds(n: Int, carryWord: Boolean): String = {
    val sep = "chr(31)"
    val ss = s"($sep || $sep)"
    val wcol = if (carryWord) "w, " else ""
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    parts += s"""w0 AS MATERIALIZED (
  SELECT $wcol cnt,
         ($sep || array_to_string(list_append(string_split(w, ''), '</w>'), $ss) || $sep) AS s
  FROM (SELECT w, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' GROUP BY w))"""
    (1 to n).foreach { i =>
      val prev = s"w${i - 1}"
      parts += s"""p$i AS (
  SELECT u.l AS l, u.r AS r, sum(cnt) AS freq
  FROM (SELECT cnt,
          unnest(list_transform(range(1, len(sy)), j -> {'l': sy[j], 'r': sy[j+1]})) AS u
        FROM (SELECT cnt, string_split(substr(s, 2, len(s)-2), $ss) AS sy FROM $prev))
  GROUP BY u.l, u.r)"""
      parts += s"""t$i AS (
  SELECT l, r, freq FROM p$i ORDER BY freq DESC, l, r LIMIT 1)"""
      parts += s"""w$i AS MATERIALIZED (
  SELECT $wcol cnt,
         replace(s, $sep || t.l || $ss || t.r || $sep, $sep || t.l || t.r || $sep) AS s
  FROM $prev, t$i AS t)"""
    }
    parts.mkString(",\n")
  }

  /** q_bpe_train: the 10 learned merge rules with rank and corpus
    * frequency — each round's winner read straight off its t-CTE.
    */
  val bpeTrain: String = {
    val n = 10
    val union = (1 to n)
      .map(i => s"SELECT $i AS rank, l, r, freq FROM t$i").mkString(" UNION ALL ")
    s"""WITH ${bpeRounds(n, carryWord = false)},
m AS ($union)
SELECT rank::BIGINT AS rank, l AS "left", r AS "right", l || r AS merged, freq::BIGINT AS freq
FROM m ORDER BY rank"""
  }

  /** q_bpe_encode: train 30 merges, then tokenize every document. The
    * encode side needs NO separate merge-rank loop: replaying trained
    * merges in order equals lowest-rank-first (a rule's output can
    * only pair with symbols that exist AFTER its training round — the
    * bpeEncode scaladoc's equivalence, held by OpsSpec's parity
    * invariant encode(vocab) == trained word table), and the gate
    * encodes the same corpus it trained on, so each distinct word's
    * token array IS its row in the final trained word table (the word
    * rides the rounds as a carry column).
    */
  val bpeEncode: String = {
    val n = 30
    val sep = "chr(31)"
    val ss = s"($sep || $sep)"
    s"""WITH ${bpeRounds(n, carryWord = true)},
vocab AS (
  SELECT w, string_split(substr(s, 2, len(s)-2), $ss) AS toks FROM w$n),
docw AS (
  SELECT doc_id, u.i AS pos, u.w AS w
  FROM (SELECT doc_id,
          unnest(list_transform(string_split(text, ' '), (w, i) -> {'w': w, 'i': i})) AS u
        FROM documents)
  WHERE u.w <> ''),
-- memory shape (sf10 learning): the old flatten(list(toks)) over every
-- token occurrence materialized ~27M VARCHAR lists and OOM'd DuckDB at
-- 30 GB. n_tokens needs only a SUM of per-word token counts, and since
-- every word encodes to >= 1 token the 10 head tokens live in each
-- doc's first 10 WORDS — so lists are built for <= 10 rows per doc.
tot AS (
  SELECT doc_id, sum(len(toks))::BIGINT AS n_tokens
  FROM docw JOIN vocab USING (w) GROUP BY doc_id),
firstw AS (
  SELECT doc_id, pos, w
  FROM (SELECT doc_id, pos, w,
          row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM docw)
  WHERE rn <= 10),
heads AS (
  SELECT doc_id, flatten(list(toks ORDER BY pos)) AS tokens
  FROM firstw JOIN vocab USING (w) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(t.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(array_to_string(h.tokens[1:10], '|'), '') AS head_tokens
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN tot t USING (doc_id)
LEFT JOIN heads h USING (doc_id)
ORDER BY doc_id"""
  }

  // ---- embedding kernels: the hyperplane-LSH and int8-quantization
  // gates are deterministic DOUBLE arithmetic with pinned evaluation
  // order, so they follow the q_sim_topk convention (left-to-right
  // list_reduce dots — bit-identical to the codegen kernels)

  /** left-to-right dot product / L2 norm — the established order-exact
    * device (see the q_sim_topk oracle + DotProduct scaladoc).
    */
  private def dotLR(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (x, y) -> x + y)"
  private def normLR(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> x * x), (x, y) -> x + y))"

  /** The 12×64 hyperplane matrix as its INTEGER pre-image (floorMod of
    * splitmix64, component = (k−1000)/1000.0 — an exact integer ratio,
    * so both engines derive the identical IEEE double). Pinned against
    * `VecKernels.PlanesFlat` in OracleSqlSpec.
    */
  private val planeInts: Array[Long] =
    Array.tabulate(12 * 64)(i => Math.floorMod(splitmixLong(i.toLong), 2001L))
  private val planeLit = planeInts.mkString("[", ",", "]::BIGINT[]")

  /** q_dedup_embed: 12-bit hyperplane signature → bucket cap → pair
    * join → exact cosine ≥ 0.95, with the planted canary (copy of the
    * smallest vec_id as −1). The plane matrix is hoisted into a
    * single-row CTE — inlining the 768-element literal into the lambda
    * re-built it per element evaluation (measured 35 s → 0.4 s).
    */
  val dedupEmbed: String = {
    val planedot = "list_reduce(list_transform(range(1, least(64, len(e)) + 1), " +
      "c -> e[c] * pm[j * 64 + c]), (x, y) -> x + y)"
    s"""WITH pl AS (SELECT list_transform($planeLit, k -> (k - 1000)::DOUBLE / 1000.0) AS pm),
base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
allv AS (SELECT * FROM base
         UNION ALL SELECT -1::BIGINT AS vec_id, e FROM (SELECT e FROM base ORDER BY vec_id LIMIT 1)),
sigv AS (
  SELECT vec_id, e,
         list_sum(list_transform(range(0, 12),
           j -> CASE WHEN $planedot > 0 THEN 1 << j ELSE 0 END))::BIGINT AS sig
  FROM allv, pl),
capped AS (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY sig) AS bn FROM sigv)
  WHERE bn <= 256)
SELECT id1, id2, cos FROM (
  SELECT a.vec_id AS id1, b.vec_id AS id2,
         round(${dotLR("a.e", "b.e")} / (${normLR("a.e")} * ${normLR("b.e")}), 6) AS cos
  FROM capped a JOIN capped b ON a.sig = b.sig AND a.vec_id < b.vec_id)
WHERE cos >= 0.95 ORDER BY id1, id2"""
  }

  /** q_sim_quantized: int8 symmetric quantization (scale = max|x|/127,
    * round-half-away — both engines' `round` on doubles) + the
    * broadcast-query top-k shape of the q_sim_topk oracle with the
    * quantized dot and exact stored norms.
    */
  val simQuantized: String =
    s"""WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
qz AS (
  SELECT vec_id,
         greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127.0 AS q_scale,
         ${normLR("e")} AS q_norm, e
  FROM base),
quant AS (
  SELECT vec_id, q_scale, q_norm,
         list_transform(e, x -> (round(x / q_scale)::TINYINT)::DOUBLE) AS qd
  FROM qz),
q AS (SELECT vec_id AS qid, qd AS qa, q_scale AS sa, q_norm AS na FROM quant WHERE vec_id < 20),
c AS (SELECT vec_id AS cid, qd AS qb, q_scale AS sb, q_norm AS nb FROM quant),
s AS (SELECT qid, cid,
        round(((sa * sb) * ${dotLR("qa", "qb")}) / (na * nb), 9) AS cos_raw
      FROM c, q WHERE cid <> qid),
r AS (SELECT qid, cid, cos_raw,
        row_number() OVER (PARTITION BY qid ORDER BY cos_raw DESC, cid) AS rn
      FROM s)
SELECT qid, CAST(rn AS BIGINT) AS rn, cid, round(cos_raw, 6) AS cos_q
FROM r WHERE rn <= 5 ORDER BY qid, rn"""

  // ---- multimodal stub kernels: the STUBBED codec is deterministic
  // integer/dyadic arithmetic (byte histograms, mean-brightness pools),
  // so "stub decode isn't SQL" was false — the plumbing gates are
  // oracle-able end to end. ASCII payloads make byte ops == char ops.

  /** q_mm_frames: fixed-64-byte frame split + SHA-256 digests, pure
    * string arithmetic in both engines.
    */
  val mmFrames: String = """WITH f AS (
  SELECT doc_id,
         unnest(generate_series(0, greatest(cast(ceil(strlen(text) / 64.0) AS INT) - 1, 0))) AS frame_idx,
         text
  FROM documents)
SELECT doc_id, frame_idx::BIGINT AS frame_idx,
       strlen(substr(text, frame_idx * 64 + 1, 64))::BIGINT AS frame_bytes,
       sha256(substr(text, frame_idx * 64 + 1, 64)) AS frame_digest,
       frame_idx % 4 = 0 AS sampled
FROM f ORDER BY doc_id, frame_idx"""

  /** q_mm_features: the fake decoder's normalized 16-bin byte histogram
    * + pair-mean resize, rendered as INTEGER-exact round-half-up
    * micro-units (the engine recovers the exact count from its double
    * and does the same integer arithmetic — see the q_mm_features
    * scaladoc). No doubles cross the comparison: the sf10 sweep caught
    * both engine-disagreement modes of the previous `round(x, 6)` form
    * (the 41/640 six-dp tie and scientific-notation small values).
    */
  val mmFeatures: String = {
    // round-half-up of num·10⁶ / den, pure BIGINT
    def fp(num: String, den: String) = {
      val ppm = s"((2 * ($num) * 1000000 + ($den)) // (2 * ($den)))"
      s"printf('%d.%06d', $ppm // 1000000, $ppm % 1000000)"
    }
    s"""WITH base AS (
  SELECT doc_id, strlen(text) AS n,
         list_transform(string_split(text, ''), ch -> ord(ch) % 16) AS residues
  FROM documents),
cnt AS (
  SELECT doc_id, n, greatest(n, 1)::BIGINT AS d,
         list_transform(generate_series(0, 15),
           b -> len(list_filter(residues, r -> r = b))::BIGINT) AS c
  FROM base)
SELECT doc_id,
       array_to_string(list_transform(c, x -> ${fp("x", "d")}), ',') AS features_csv,
       array_to_string(list_transform(generate_series(1, 8),
         i -> ${fp("c[2*i-1] + c[2*i]", "2 * d")}), ',') AS resized_csv,
       n::BIGINT AS n_bytes,
       'fake-decoder-v1' AS decoder
FROM cnt ORDER BY doc_id"""
  }

  /** q_mm_phash: the 65-segment mean-brightness pool (integer boundary
    * arithmetic; segment sums are whole numbers, double-exact, so the
    * dHash comparisons are order-free), the 4×16-bit band buckets with
    * the 256 cap, and the exact hamming ≤ 3 screen, with the planted
    * canary.
    */
  val mmPhash: String = {
    val poolSum = "list_sum(list_transform(generate_series((i * n) // 65 + 1, " +
      "least(greatest((i * n) // 65 + 1, ((i + 1) * n) // 65), n)), j -> ord(text[j])::DOUBLE))"
    val poolDen = "(least(greatest((i * n) // 65 + 1, ((i + 1) * n) // 65), n) - (i * n) // 65)"
    val phashU = s"list_sum(list_transform(generate_series(1, 64), " +
      s"i -> CASE WHEN p[i] > p[i+1] THEN ($pow2Lit)[i] ELSE 0::HUGEINT END))"
    s"""WITH base AS (
  SELECT doc_id, text, strlen(text) AS n FROM documents),
pool AS (
  SELECT doc_id,
         list_transform(generate_series(0, 64), i ->
           CASE WHEN n = 0 THEN 0.0 ELSE $poolSum / $poolDen END) AS p
  FROM base),
ph AS (
  SELECT doc_id, ${sgn(phashU)} AS phash FROM pool),
allp AS (
  SELECT * FROM ph
  UNION ALL SELECT -1::BIGINT, phash FROM (SELECT phash FROM ph ORDER BY doc_id LIMIT 1)),
banded AS (
  SELECT doc_id, phash, b AS band,
         ((CASE WHEN phash < 0 THEN phash::HUGEINT + $U64 ELSE phash::HUGEINT END)
            // ($pow2Lit)[b * 16 + 1]) % 65536::HUGEINT AS bkey
  FROM allp, generate_series(0, 3) AS g(b)),
capped AS (
  SELECT * FROM (SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bn FROM banded)
  WHERE bn <= 256)
SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
       bit_count(xor(a.phash, b.phash))::BIGINT AS hamming
FROM capped a JOIN capped b
  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
ORDER BY id1, id2"""
  }

  /** q_select_cover: greedy max-coverage replayed as UNROLLED rounds —
    * each round one hash ANTI join against the covered set + an argmax,
    * then the pick's bigrams fold into the next covered CTE. The
    * previous recursive-CTE form ran a per-row `list_contains` against
    * the growing covered LIST every round (quadratic in DuckDB — 300 s+
    * wall at sf10 while the engine finished in 46 s); the anti-join
    * form is k linear hash joins. Exact integer gains + doc_id
    * tie-break keep the trajectory engine-exact; an exhausted corpus
    * stops early exactly as the engine does (empty argmax → no row).
    */
  val selectCover: String = {
    val k = 8
    val rounds = (1 to k).map { r =>
      val prev = if (r == 1) "" else s"ANTI JOIN c${r - 1} USING (bg) "
      val gain = s"g$r AS MATERIALIZED (SELECT doc_id, count(*) AS gain FROM dt $prev" +
        s"GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1)"
      val cov =
        if (r == 1)
          "c1 AS MATERIALIZED (SELECT DISTINCT bg FROM dt WHERE doc_id = (SELECT doc_id FROM g1))"
        else
          s"c$r AS MATERIALIZED (SELECT bg FROM c${r - 1} UNION " +
            s"SELECT bg FROM dt WHERE doc_id = (SELECT doc_id FROM g$r))"
      s"$gain,\n$cov"
    }.mkString(",\n")
    val out = (1 to k).map(r =>
      s"SELECT $r AS rank, doc_id, gain, (SELECT count(*) FROM c$r) AS cum_cover FROM g$r")
      .mkString("\n  UNION ALL\n")
    // MATERIALIZED throughout: DuckDB v1.0 inlines every CTE
    // reference, and dt is referenced 2k+1 times — the naive form
    // re-ran the 450M-row distinct per reference and filled the disk
    // with concurrent spills at sf10
    s"""WITH dt0 AS MATERIALIZED (SELECT DISTINCT doc_id, bg FROM (
  SELECT doc_id,
    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))),
vocab AS MATERIALIZED (SELECT bg FROM (SELECT bg, count(*) AS df FROM dt0 GROUP BY 1) WHERE df >= 5),
dt AS MATERIALIZED (SELECT doc_id, bg FROM dt0 SEMI JOIN vocab USING (bg)),
$rounds
SELECT rank::BIGINT AS rank, doc_id, gain::BIGINT AS gain, cum_cover::BIGINT AS cum_cover
FROM ($out) ORDER BY rank"""
  }

  /** q_pack_sequences — DRIVER-GATE form: the per-source greedy
    * first-fit fold as a row-per-step recursive CTE (one row per source
    * per step). Quadratic in DuckDB at sf10 (each step rejoins the doc
    * table), but LAMBDA-FREE and therefore immune to the DuckDB v1.0
    * parallel-lambda wrongness this round uncovered (see
    * [[packSequencesChunked]]); the driver's sf0.01 correctness gate
    * must never depend on duckdb thread count, so the committed oracle
    * stays this form and the decade sweep replays the chunked form
    * single-threaded.
    */
  val packSequences: String = """WITH RECURSIVE t AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), walk AS (
  SELECT source, rn, doc_id, n_tokens, 0::BIGINT AS bin_id, n_tokens AS used
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.source, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN w.used + t.n_tokens > 256 AND w.used > 0
              THEN w.bin_id + 1 ELSE w.bin_id END,
         CASE WHEN w.used + t.n_tokens > 256 AND w.used > 0
              THEN t.n_tokens ELSE w.used + t.n_tokens END
  FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
)
SELECT doc_id, source, n_tokens, bin_id FROM walk ORDER BY doc_id"""

  /** q_pack_sequences — DECADE-SWEEP form (linear): the recursion
    * advances one 256-doc CHUNK per step carrying only the (bin, used)
    * boundary state (list_reduce over the chunk); per-doc bins replay
    * each doc's chunk PREFIX from its boundary state as ONE flat
    * single-level list_reduce per doc row. sf1: 3.5 s vs the driver
    * form's 54 s; hash-exact vs both the driver form and the engine.
    *
    * Reaches DuckDB through `oracle_sql_sweep_overrides.json` (written
    * by graft.Verify, overlaid by tools/sweep_oracle.py), carrying the
    * `-- SWEEP_THREADS=1` header the sweep child ENFORCES.
    *
    * MUST run with `SET threads=1`: DuckDB v1.0's PARALLEL lambda
    * evaluation is wrong — a single-level list_reduce over
    * join-correlated rows returns run-to-run different results at
    * threads=32 (16k/50k self-diffs at sf1, zero at threads=1), and
    * nested lambdas additionally misalign captured columns across the
    * vector even single-threaded (the flat per-doc form avoids
    * nesting). Exactness at threads=1 verified against the driver form
    * at sf1 (0/50k diffs, deterministic across runs).
    */
  val packSequencesChunked: String = """-- SWEEP_THREADS=1
WITH RECURSIVE t AS (
  SELECT doc_id, source,
         len(string_split(text, ' '))::BIGINT AS n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), ch AS (
  SELECT source, ((rn - 1) // 256)::BIGINT AS cno,
         list({'d': doc_id, 'n': n_tokens} ORDER BY rn) AS docs
  FROM t GROUP BY source, ((rn - 1) // 256)
), walk AS (
  SELECT source, -1::BIGINT AS cno, 0::BIGINT AS bin, 0::BIGINT AS used
  FROM (SELECT DISTINCT source FROM t)
  UNION ALL
  SELECT source, cno, st.b AS bin, st.u AS used FROM (
    SELECT c.source, c.cno,
           list_reduce(
             list_prepend({'b': w.bin, 'u': w.used, 'n': 0::BIGINT},
               list_transform(c.docs, x -> {'b': 0::BIGINT, 'u': 0::BIGINT, 'n': x.n})),
             (acc, x) -> CASE WHEN acc.u + x.n > 256 AND acc.u > 0
                  THEN {'b': acc.b + 1, 'u': x.n, 'n': 0::BIGINT}
                  ELSE {'b': acc.b, 'u': acc.u + x.n, 'n': 0::BIGINT} END) AS st
    FROM walk w JOIN ch c ON c.source = w.source AND c.cno = w.cno + 1)
), perdoc AS (
  SELECT c.source, u.e.d AS doc_id, u.e.n AS n_tokens, u.i AS j, c.docs,
         w.bin AS b0, w.used AS u0
  FROM ch c JOIN walk w ON w.source = c.source AND w.cno = c.cno - 1,
       LATERAL (SELECT unnest(list_transform(c.docs, (e, i) -> {'e': e, 'i': i})) AS u) lx
), asg AS (
  SELECT source, doc_id, n_tokens,
         list_reduce(
           list_prepend({'b': b0, 'u': u0, 'n': 0::BIGINT},
             list_transform(docs[1:j], x -> {'b': 0::BIGINT, 'u': 0::BIGINT, 'n': x.n})),
           (acc, x) -> CASE WHEN acc.u + x.n > 256 AND acc.u > 0
                THEN {'b': acc.b + 1, 'u': x.n, 'n': 0::BIGINT}
                ELSE {'b': acc.b, 'u': acc.u + x.n, 'n': 0::BIGINT} END).b AS bin_id
  FROM perdoc)
SELECT doc_id, source, n_tokens, bin_id FROM asg ORDER BY doc_id"""
}
