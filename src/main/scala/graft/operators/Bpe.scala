package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding (BPE) merge training — the tokenizer-
  * construction step of an LLM data pipeline (Sennrich et al. 2016 shape).
  * The reference has no tokenizer surface; this is BASELINE.json extension
  * work, built Spark-first:
  *
  *   - The corpus collapses to its WORD VOCABULARY (distinct word, freq)
  *     once — at web scale the vocabulary is millions of rows while the
  *     corpus is trillions of tokens, so the iterative part of training
  *     never touches the corpus again (the standard trick every BPE
  *     trainer uses, here as a groupBy).
  *   - Each merge round is: explode adjacent symbol pairs weighted by word
  *     freq → one map-side-combined aggregation → the driver receives
  *     EXACTLY ONE ROW (the argmax pair; count desc, pair lexicographic as
  *     the deterministic tie-break) → the merge is applied vocabulary-wide
  *     as a higher-order `aggregate` fold (engine-native lambda, no UDF),
  *     and the frame is localCheckpoint'ed to truncate lineage (the
  *     [[Dedup.dupClusters]] iteration discipline).
  *
  * Greedy left-to-right merge semantics ("aaa" + merge (a,a) → ["aa","a"])
  * are exactly the fold: append each symbol unless the accumulator's last
  * element equals `a` and the incoming equals `b`, in which case the pair
  * fuses. BpeSpec proves the loop bit-equal to a sequential reference
  * implementation on the fixture corpus.
  */
object Bpe {

  /** Escape a string for interpolation into a SQL single-quoted literal
    * (symbols/end-marks reach `expr` lambdas as literals — a quote or
    * backslash in them must not break parsing or inject expression text). */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** (word, freq) vocabulary of a whitespace-tokenized text column. */
  def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Frequency-weighted adjacent-pair counts over a (word|syms, freq)
    * frame. `syms` is the word's current symbol array. */
  private def pairCounts(v: DataFrame): DataFrame =
    // single-symbol words have no pairs — and must be filtered BEFORE the
    // explode: sequence(0, size-2) runs DESCENDING for size 1 (Spark's
    // sequence auto-reverses), which under ANSI mode is an invalid index
    v.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(
        expr("transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS a, syms[i+1] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Train `numMerges` BPE merges over the corpus vocabulary. Returns the
    * learned merge table (ord, a, b, cnt) in training order; `cnt` is the
    * pair's frequency-weighted count at the time it was chosen. Words
    * start as single-character symbols with `endMark` appended to the
    * final character (the end-of-word convention that keeps suffixes and
    * in-word units distinct). */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  endMark: String = "</w>"): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    var v = vocab(docs, textCol)
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), " +
          s"i -> substring(word, i, 1) || CASE WHEN i = length(word) " +
          s"THEN '${esc(endMark)}' ELSE '' END)"))
      .select(col("syms"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    for (ord <- 1 to numMerges if !done) {
      // ONE row to the driver: the argmax pair under the total order
      // (cnt desc, a, b) — never the pair table itself
      val top = pairCounts(v)
        .orderBy(desc("cnt"), col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((ord, a, b, cnt))
        v = applyMerge(v, a, b).localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Fuse every greedy left-to-right adjacent (a, b) occurrence in the
    * symbol arrays — the higher-order fold described in the class doc. */
  private[graft] def applyMerge(v: DataFrame, a: String, b: String): DataFrame = {
    // symbols come from corpus text: escape quotes for the lambda literal
    def lit(s: String) = esc(s)
    v.withColumn("syms",
      expr(s"""aggregate(syms, CAST(array() AS array<string>),
              |  (acc, x) -> CASE
              |    WHEN size(acc) > 0 AND element_at(acc, -1) = '${lit(a)}'
              |         AND x = '${lit(b)}'
              |    THEN concat(slice(acc, 1, size(acc) - 1),
              |                array('${lit(a)}' || '${lit(b)}'))
              |    ELSE concat(acc, array(x)) END)""".stripMargin))
  }

  /** ENCODE a corpus with a trained merge table — the application half of
    * the tokenizer story ([[trainMerges]] builds the merges; this reports
    * the corpus's token counts under them, the number every token-budget /
    * packing / mixture decision actually consumes).
    *
    * Same scale discipline as training: the merges fold over the DISTINCT
    * word vocabulary (millions of rows), never the corpus (trillions of
    * tokens) — each merge is the greedy left-to-right higher-order
    * `aggregate` fold of [[applyMerge]] (bit-identical semantics to
    * training, applied in training order), with `localCheckpoint` every
    * `checkpointEvery` merges to keep plan depth and lineage bounded. The
    * corpus is touched exactly once, by the final word → token-count
    * equi-join (vocabulary side is the small one — Catalyst broadcasts
    * it) and a per-doc aggregation. Returns (id, n_words, n_tokens).
    *
    * Spec-proven (BpeGraphSpec) bit-equal to a sequential reference
    * encoder; not oracle-gated — an iterated greedy fold has no faithful
    * single-query SQL twin (DuckDB's list_reduce cannot change
    * accumulator type, and separator-string replace tricks break on
    * adjacent repeated pairs). */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)],
                        endMark: String = "</w>",
                        checkpointEvery: Int = 8): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    val corpus = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    var v = corpus.select(col("word")).distinct()
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), " +
          s"i -> substring(word, i, 1) || CASE WHEN i = length(word) " +
          s"THEN '${esc(endMark)}' ELSE '' END)"))
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      v = applyMerge(v, a, b)
      if ((i + 1) % checkpointEvery == 0) v = v.localCheckpoint()
    }
    val enc = v.select(col("word"), size(col("syms")).cast("long").as("__nt"))
    corpus.join(enc, "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("__nt")).as("n_tokens"))
  }

  /** Persist a trained merge table as ONE rank-ordered parquet frame
    * (ord, a, b, cnt) — the artifact half of the tokenizer lifecycle,
    * completing the persist→serve contract every other trained state in
    * the engine already has (Postings.save, VectorIndex.save,
    * DupGraph.save). A tokenizer is trained once and served by every
    * downstream token-budget / packing / mixture decision, usually in a
    * DIFFERENT session — the artifact, not the training lineage, is the
    * hand-off. The table is merge-count-sized (thousands of rows), so
    * one part file is the right physical shape. */
  def save(spark: SparkSession,
           merges: Seq[(Int, String, String, Long)], dir: String): Unit = {
    require(merges.nonEmpty, "Bpe.save: empty merge table")
    require(merges.map(_._1) == (1 to merges.length),
      "Bpe.save: merge ranks must be contiguous 1..n in training order")
    import spark.implicits._
    merges.toDF("ord", "a", "b", "cnt")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d merge table, re-validated: ranks must be the
    * contiguous 1..n training order (BPE merges are ORDER-SENSITIVE —
    * a silently reordered or truncated artifact would encode a
    * different tokenizer, so a malformed frame fails loudly here rather
    * than mis-tokenizing downstream). Serve-from-artifact encoding is
    * spec-proven bit-equal to encoding with the in-memory table. */
  def load(spark: SparkSession, dir: String): Seq[(Int, String, String, Long)] = {
    val out = spark.read.parquet(dir)
      .select(col("ord").cast("int"), col("a"), col("b"),
        col("cnt").cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    require(out.map(_._1) == (1 to out.length),
      s"Bpe.load: ranks not contiguous 1..${out.length} — corrupt artifact at $dir")
    out
  }

  /** Sequential reference encoder for [[encodeTokenCounts]]'s spec:
    * greedy left-to-right application of the merges in training order to
    * one word. Never used at scale. */
  private[graft] def referenceEncode(word: String, merges: Seq[(String, String)],
                                     endMark: String = "</w>"): Vector[String] = {
    var syms: Vector[String] = word.toVector.zipWithIndex.map { case (c, i) =>
      if (i == word.length - 1) s"$c$endMark" else c.toString
    }
    merges.foreach { case (a, b) =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { x =>
        if (acc.nonEmpty && acc.last == a && x == b) acc(acc.length - 1) = a + b
        else acc += x
      }
      syms = acc.toVector
    }
    syms
  }

  /** Sequential reference BPE on a driver-side vocabulary — the test
    * oracle for [[trainMerges]] (BpeSpec); never used at scale. */
  private[graft] def referenceMerges(vocabulary: Seq[(String, Long)],
                                     numMerges: Int,
                                     endMark: String = "</w>"): Seq[(Int, String, String, Long)] = {
    var v: Seq[(Vector[String], Long)] = vocabulary.map { case (w, f) =>
      (w.toVector.zipWithIndex.map { case (c, i) =>
        if (i == w.length - 1) s"$c$endMark" else c.toString }, f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (ord <- 1 to numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((ord, a, b, cnt))
        v = v.map { case (syms, f) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { x =>
            if (acc.nonEmpty && acc.last == a && x == b)
              acc(acc.length - 1) = a + b
            else acc += x
          }
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }
}
