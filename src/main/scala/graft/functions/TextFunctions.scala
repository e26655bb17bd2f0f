package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface: tokenization,
  * shingling, cross-engine-stable hashing, language-ID heuristics, quality
  * ratios, fingerprints.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs): at 100 TB these run inside whole-stage codegen over the
  * vectorized parquet reader, shuffle-free until an explicit groupBy/join.
  *
  * Hash discipline: engine-portable hashing goes through md5 (identical hex
  * output in Spark, DuckDB, Polars, …) reduced to a 60-bit int, rather than
  * Spark-private xxhash64/murmur — so every derived structure (MinHash,
  * LSH buckets, fingerprints) is reproducible outside Spark and
  * oracle-checkable.
  */
object TextFunctions {

  /** Whitespace tokens of a single-space-joined text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word k-gram shingles (k consecutive tokens joined by a space), as the
    * DISTINCT shingle set. Guarded: Spark's `sequence(1, n)` runs DESCENDING
    * when n < 1, so short texts must short-circuit to an empty array. */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesFromTokens(tokens(text), k)

  /** Shingles from a PRE-TOKENIZED array column — project the token array
    * in its own select first (see shingleHashSetFromTokens for why). */
  def shinglesFromTokens(t: Column, k: Int): Column =
    array_distinct(
      when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(o => element_at(t, i + o)): _*)))
        .otherwise(array()))

  /** 60-bit integer hash from the first 15 hex chars of md5 — stable across
    * engines (DuckDB twin: `('0x' || substr(md5(s),1,15))::BIGINT`). */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Mersenne prime 2^31-1: keeps (a*h+b) % P inside int64 without overflow
    * (a,b,h%P all < 2^31 → product < 2^62). */
  val MinhashP: Long = 2147483647L

  /** Deterministic MinHash parameter pairs (a_j, b_j), j < 16. Fixed odd
    * constants, all < P — shared by the Spark queries and the generated
    * oracle SQL. */
  val MinhashA: Seq[Long] = Seq(
    1103515245L, 1234567891L, 766245317L, 997755331L,
    622729787L, 961748941L, 589934581L, 314159257L,
    271828183L, 141421357L, 173205081L, 123456791L,
    987654323L, 192837465L, 1029384757L, 564738291L)
  val MinhashB: Seq[Long] = Seq(
    12345L, 67891L, 24680L, 13579L, 98765L, 43210L, 11111L, 22222L,
    33333L, 44444L, 55555L, 66666L, 77777L, 88888L, 99999L, 10101L)

  /** j-th MinHash of a shingle-set column: min over shingles of the j-th
    * universal hash of the shingle's md5Long. Null when the set is empty. */
  def minhash(shingleSet: Column, j: Int): Column =
    minhashFromHashes(shingleHashes(shingleSet), j)

  /** Pre-reduced shingle hashes (md5Long % P). Computing this ONCE and
    * deriving every signature from it does one md5 per shingle instead of
    * one per (shingle × signature) — the dominant cost of the sketch. */
  def shingleHashes(shingleSet: Column): Column =
    transform(shingleSet, s =>
      conv(substring(md5(s), 1, 15), 16, 10).cast("long") % MinhashP)

  /** Distinct 60-bit hash set of the k-gram shingles, built in ONE pass:
    * hash each shingle string immediately (never materializing the string
    * array) and dedup the LONGS — long equality beats string equality inside
    * array_distinct, and every downstream consumer (Jaccard on the set,
    * MinHash via % P) reuses this single array. 60-bit space makes set
    * collisions negligible (~1e-13 per pair), so Jaccard over hashes equals
    * Jaccard over shingle strings. */
  def shingleHashSet(text: Column, k: Int = 3): Column =
    shingleHashSetFromTokens(tokens(text), k)

  /** Same, over a PRE-TOKENIZED array column. Callers should project the
    * token array in its own select first: expressions referenced inside a
    * higher-order-function lambda are re-evaluated per element, so an
    * inlined split(text) turns shingling O(tokens²) per row. Referencing a
    * materialized attribute keeps it O(tokens). */
  def shingleHashSetFromTokens(t: Column, k: Int): Column =
    array_distinct(
      when(size(t) >= k,
        transform(sequence(lit(1), size(t) - (k - 1)),
          i => conv(substring(md5(concat_ws(" ",
            (0 until k).map(o => element_at(t, i + o)): _*)), 1, 15), 16, 10)
            .cast("long")))
        .otherwise(typedLit(Seq.empty[Long])))

  /** j-th MinHash from pre-reduced hashes: min of (a_j*h + b_j) % P. */
  def minhashFromHashes(hashes: Column, j: Int): Column =
    array_min(transform(hashes, h =>
      (lit(MinhashA(j)) * h + MinhashB(j)) % MinhashP))

  /** Exact Jaccard similarity of two array columns (as double). Integer
    * |∩| / |∪| division — bit-identical in any engine. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Number of regex matches in a string (codegen'd regexp_count). */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** Ratio of characters matching a char-class regex. Explicit char classes
    * only (no \p{...}) so Java-regex Spark and RE2 DuckDB agree. */
  def charRatio(text: Column, charClass: String): Column =
    (length(text) - length(regexp_replace(text, charClass, ""))).cast("double") /
      length(text).cast("double")

  /** Tiny per-language marker-word lists for the heuristic language ID.
    * Real pipelines use char-n-gram models; the shape (score per language →
    * argmax) is the same and this stays SQL-expressible for the oracle. */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|join|group)\\b",
    "de" -> "\\b(der|die|das|und|ist|scan|merge)\\b",
    "es" -> "\\b(el|la|de|que|los|filter|sort)\\b")

  /** Heuristic language guess: argmax of marker-word hit counts; first
    * language wins ties (greatest(...) compared in declaration order). */
  def langGuess(text: Column): Column = {
    val scores = LangMarkers.map { case (l, p) => (l, matchCount(text, p)) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** 60-bit content fingerprint (md5-derived); stable across engines. */
  def fingerprint(text: Column): Column = md5Long(text)

  /** Canonical text normalization for near-exact dedup: lowercase, strip
    * everything outside [a-z0-9 ], collapse runs of spaces, trim. Two
    * documents differing only in case/punctuation/spacing normalize to
    * the same string. Explicit char classes; DuckDB twin uses the same
    * regexes with the 'g' flag (Spark replaces all matches by default). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]+", " "), " +", " "))

  /** ORDERED k-gram shingle hash sequence (no distinct — position
    * matters). `t` must be a materialized token-array attribute. */
  def shingleHashSeqFromTokens(t: Column, k: Int): Column =
    when(size(t) >= k,
      transform(sequence(lit(1), size(t) - (k - 1)),
        i => conv(substring(md5(concat_ws(" ",
          (0 until k).map(o => element_at(t, i + o)): _*)), 1, 15), 16, 10)
          .cast("long")))
      .otherwise(typedLit(Seq.empty[Long]))

  /** Winnowing fingerprints (MOSS-style): min hash of every window of
    * `w` consecutive shingle hashes, deduped — a content-defined
    * fingerprint set whose size adapts to document length and which two
    * documents share in proportion to their overlapping runs. `hs` must
    * be a MATERIALIZED ordered-hash attribute ([[shingleHashSeqFromTokens]]
    * projected first — lambda-scope discipline). */
  def winnowFingerprints(hs: Column, w: Int): Column =
    array_distinct(
      when(size(hs) >= w,
        transform(sequence(lit(1), size(hs) - (w - 1)),
          j => array_min(slice(hs, j, lit(w)))))
        .otherwise(when(size(hs) > 0, array(array_min(hs)))
          .otherwise(typedLit(Seq.empty[Long]))))

  /** Token md5-hash ARRAY (multiset — duplicates kept, unlike
    * [[shingleHashSet]]): the materialization point for SimHash. Project
    * this into its own column before [[simhashFromHashes]] — the 16+ bit
    * votes each reference the hash array, and an inlined expression would
    * re-tokenize and re-hash every token once per bit. */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t =>
      conv(substring(md5(t), 1, 15), 16, 10).cast("long"))

  /** SimHash bit votes over a MATERIALIZED token-hash array attribute:
    * bit b is set iff a majority of token hashes have bit b set. `hashes`
    * must be a projected column (see [[tokenHashes]]), not an inline
    * expression — HOF lambdas are interpreted and each of the `bits`
    * filter() calls re-evaluates its input expression. */
  def simhashFromHashes(hashes: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 60,
      s"simhash bits must be in [1, 60] — the md5-derived hashes carry 60 bits (got $bits)")
    val n = size(hashes)
    (0 until bits).map { b =>
      val ones = size(filter(hashes, h => shiftright(h, b).bitwiseAND(1L) === 1L))
      when(ones * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash over the token multiset, as a single inline expression.
    * Convenience form for one-off use; on hot paths project
    * [[tokenHashes]] first and use [[simhashFromHashes]] (as
    * Dedup.simhashCodes does) — inline, tokenization and hashing re-run
    * once per bit position. */
  def simhash(text: Column, bits: Int = 16): Column =
    simhashFromHashes(tokenHashes(text), bits)

  /** Hamming distance between two simhash codes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("long")
}
