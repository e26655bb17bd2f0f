package graft.queries

/** DuckDB CTE scaffolding mirroring [[graft.operators.Logit]] training
  * — the unrolled-layer oracle discipline of q137 (PageRank) applied to
  * batch gradient descent. Built once here so q123/q141/q220/q235/q253/
  * q278 share ONE oracle definition of the trained model, exactly like
  * their Spark sides share one pooled trajectory.
  *
  * Every step is BIGINT arithmetic with `//` (trunc toward zero,
  * matching Spark's `DIV`), so the trajectory and every downstream
  * score hash-match bit for bit. The CTE chain ends in `wr{Rounds}` —
  * the served weight vector — and exposes `x` (the centered feature
  * frame with doc_id, y, n_chars, x0..x3) for scoring consumers.
  */
private[queries] object LogitOracle {

  import graft.operators.Logit.{Grid, LrDen, Rounds, SpamLine}

  /** Name of the final-weights CTE (the served model). */
  val FinalW = s"wr$Rounds"

  /** The shared training prefix: aug → fr → xr → mu → x → wr0 →
    * (er/gr/wr)×Rounds. Append consumer SQL selecting FROM x and/or
    * [[FinalW]]. */
  val prefix: String = chain("")

  /** Training chain restricted to a split: the centering means (mu)
    * and every gradient pass (er/gr) aggregate only rows matching
    * `trainWhere`, while `x` still carries EVERY row centered by the
    * train-fitted means — the proper holdout discipline (q279). */
  def trainRestrictedPrefix(trainWhere: String): String = chain(trainWhere)

  private def chain(trainWhere: String): String = {
    val tw = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val head =
      s"""WITH aug AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |         THEN text || repeat(' $SpamLine',
         |                             CAST(doc_id % 3 + 1 AS INT))
         |         ELSE text END AS text,
         |    CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS BIGINT) AS y
         |  FROM documents
         |), fr AS (
         |  SELECT doc_id, y,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text,' '),
         |      x -> x IN ('a','the','of','to'))) AS BIGINT) AS n_stop,
         |    CAST(length(text) AS BIGINT) AS n_chars
         |  FROM aug
         |), xr AS (
         |  SELECT doc_id, y, n_chars,
         |    (n_tok * $Grid) // 100 AS r1,
         |    (n_stop * $Grid) // n_tok AS r2,
         |    ((n_chars - (n_tok - 1)) * $Grid) // (n_tok * 10) AS r3
         |  FROM fr
         |), mu AS (
         |  SELECT CAST(sum(r1) AS BIGINT) // count(*) AS m1,
         |         CAST(sum(r2) AS BIGINT) // count(*) AS m2,
         |         CAST(sum(r3) AS BIGINT) // count(*) AS m3,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM xr$tw
         |), x AS (
         |  SELECT doc_id, y, n_chars, CAST($Grid AS BIGINT) AS x0,
         |         r1 - m1 AS x1, r2 - m2 AS x2, r3 - m3 AS x3
         |  FROM xr, mu
         |), wr0 AS (
         |  SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |         CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3
         |)""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      s""", er$r AS (
         |  SELECT y, x0, x1, x2, x3,
         |    least($Grid, greatest(0, ${Grid / 2}
         |      + ((w0*x0 + w1*x1 + w2*x2 + w3*x3) // $Grid) // 4))
         |      - y * $Grid AS e
         |  FROM x, wr${r - 1}$tw
         |), gr$r AS (
         |  SELECT CAST(sum((e * x0) // $Grid) AS BIGINT) AS g0,
         |         CAST(sum((e * x1) // $Grid) AS BIGINT) AS g1,
         |         CAST(sum((e * x2) // $Grid) AS BIGINT) AS g2,
         |         CAST(sum((e * x3) // $Grid) AS BIGINT) AS g3
         |  FROM er$r
         |), wr$r AS (
         |  SELECT w0 - ((g0 // n) // $LrDen) AS w0,
         |         w1 - ((g1 // n) // $LrDen) AS w1,
         |         w2 - ((g2 // n) // $LrDen) AS w2,
         |         w3 - ((g3 // n) // $LrDen) AS w3
         |  FROM wr${r - 1}, gr$r, mu
         |)""".stripMargin
    }.mkString
    head + rounds
  }

  /** Scored-docs CTE (doc_id, y, n_chars, z) over the final weights —
    * the oracle twin of [[graft.operators.Logit.scoredDocs]]. */
  val scored: String =
    s"""$prefix, scored AS (
       |  SELECT doc_id, y, n_chars,
       |    (w0*x0 + w1*x1 + w2*x2 + w3*x3) // $Grid AS z
       |  FROM x, $FinalW
       |)""".stripMargin
}
