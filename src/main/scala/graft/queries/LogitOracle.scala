package graft.queries

/** DuckDB CTE scaffolding mirroring [[graft.operators.Logit]] training
  * — the unrolled-layer oracle discipline of q137 (PageRank) applied to
  * batch gradient descent. Built once here so q123/q141/q220/q235/q253/
  * q278 share ONE oracle definition of the trained model, exactly like
  * their Spark sides share one pooled trajectory.
  *
  * Every step is BIGINT arithmetic with `//` (trunc toward zero,
  * matching Spark's `DIV`), so the trajectory and every downstream
  * score hash-match bit for bit. Since round 16 the serving model is
  * the HOLDOUT-SELECTED round, not blindly the last: [[scored]] chains
  * a second, split-restricted training pass (CTEs suffixed `v`), the
  * per-round holdout AUC (the q279 rank-sum shape), an argmax
  * selection `bestv` (ties → later round), and `ws` — the full-data
  * weights at the selected round — then scores FROM `ws`. The engine
  * twin is `Logit.servingWeights`.
  */
private[queries] object LogitOracle {

  import graft.operators.Logit.{Grid, HoldoutMod, LrDen, Rounds, SpamLine}

  /** Name of the final-weights CTE of the unrestricted chain (the last
    * trained round — NOT necessarily the served model; see [[scored]]). */
  val FinalW = s"wr$Rounds"

  /** The shared training prefix: aug → fr → xr → mu → x → wr0 →
    * (er/gr/wr)×Rounds. Append consumer SQL selecting FROM x and/or
    * [[FinalW]]. */
  val prefix: String = chain("", "", "WITH ")

  /** Training chain restricted to a split: the centering means (mu)
    * and every gradient pass (er/gr) aggregate only rows matching
    * `trainWhere`, while `x` still carries EVERY row centered by the
    * train-fitted means — the proper holdout discipline (q279). */
  def trainRestrictedPrefix(trainWhere: String): String =
    chain(trainWhere, "", "WITH ")

  /** One full training chain with every CTE name suffixed `sfx`;
    * `lead` is "WITH " for a statement head or ", " to append to an
    * existing WITH list (two chains can then coexist in one query —
    * the [[scored]] validation pass rides suffix `v` beside the
    * unsuffixed full-data pass). */
  private def chain(trainWhere: String, sfx: String, lead: String): String = {
    val tw = if (trainWhere.isEmpty) "" else s" WHERE $trainWhere"
    val head =
      s"""${lead}aug$sfx AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 5 = 0
         |         THEN text || repeat(' $SpamLine',
         |                             CAST(doc_id % 3 + 1 AS INT))
         |         ELSE text END AS text,
         |    CAST(CASE WHEN doc_id % 5 = 0 THEN 0 ELSE 1 END AS BIGINT) AS y
         |  FROM documents
         |), fr$sfx AS (
         |  SELECT doc_id, y,
         |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(string_split(text,' '),
         |      x -> x IN ('a','the','of','to'))) AS BIGINT) AS n_stop,
         |    CAST(length(text) AS BIGINT) AS n_chars
         |  FROM aug$sfx
         |), xr$sfx AS (
         |  SELECT doc_id, y, n_chars,
         |    (n_tok * $Grid) // 100 AS r1,
         |    (n_stop * $Grid) // n_tok AS r2,
         |    ((n_chars - (n_tok - 1)) * $Grid) // (n_tok * 10) AS r3
         |  FROM fr$sfx
         |), mu$sfx AS (
         |  SELECT CAST(sum(r1) AS BIGINT) // count(*) AS m1,
         |         CAST(sum(r2) AS BIGINT) // count(*) AS m2,
         |         CAST(sum(r3) AS BIGINT) // count(*) AS m3,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM xr$sfx$tw
         |), x$sfx AS (
         |  SELECT doc_id, y, n_chars, CAST($Grid AS BIGINT) AS x0,
         |         r1 - m1 AS x1, r2 - m2 AS x2, r3 - m3 AS x3
         |  FROM xr$sfx, mu$sfx
         |), wr0$sfx AS (
         |  SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         |         CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3
         |)""".stripMargin
    val rounds = (1 to Rounds).map { r =>
      s""", er$r$sfx AS (
         |  SELECT y, x0, x1, x2, x3,
         |    least($Grid, greatest(0, ${Grid / 2}
         |      + ((w0*x0 + w1*x1 + w2*x2 + w3*x3) // $Grid) // 4))
         |      - y * $Grid AS e
         |  FROM x$sfx, wr${r - 1}$sfx$tw
         |), gr$r$sfx AS (
         |  SELECT CAST(sum((e * x0) // $Grid) AS BIGINT) AS g0,
         |         CAST(sum((e * x1) // $Grid) AS BIGINT) AS g1,
         |         CAST(sum((e * x2) // $Grid) AS BIGINT) AS g2,
         |         CAST(sum((e * x3) // $Grid) AS BIGINT) AS g3
         |  FROM er$r$sfx
         |), wr$r$sfx AS (
         |  SELECT w0 - ((g0 // n) // $LrDen) AS w0,
         |         w1 - ((g1 // n) // $LrDen) AS w1,
         |         w2 - ((g2 // n) // $LrDen) AS w2,
         |         w3 - ((g3 // n) // $LrDen) AS w3
         |  FROM wr${r - 1}$sfx, gr$r$sfx, mu$sfx
         |)""".stripMargin
    }.mkString
    head + rounds
  }

  /** Per-round holdout Mann–Whitney AUC CTEs over chain suffix `sfx`:
    * h{r} (holdout scores) → hs{r} (distinct-score axis) → hc{r}
    * (cumulative negatives) → ha{r} (round, n_pos, n_neg, u2). The
    * auc_bp assembly (HUGEINT — see [[aucBpExpr]]) is left to the
    * caller so q279 and the serving selection share these bodies. */
  def holdoutAucCtes(sfx: String, holdWhere: String): String =
    (1 to Rounds).map { r =>
      s""", h$r$sfx AS (
         |  SELECT (w0*x0 + w1*x1 + w2*x2 + w3*x3) // $Grid AS z, y
         |  FROM x$sfx, wr$r$sfx WHERE $holdWhere
         |), hs$r$sfx AS (
         |  SELECT z,
         |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_pos,
         |    CAST(sum(CASE WHEN y = 1 THEN 0 ELSE 1 END) AS BIGINT)
         |      AS n_neg
         |  FROM h$r$sfx GROUP BY z
         |), hc$r$sfx AS (
         |  SELECT n_pos, n_neg,
         |    CAST(sum(n_neg) OVER (ORDER BY z
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_neg
         |  FROM hs$r$sfx
         |), ha$r$sfx AS (
         |  SELECT CAST($r AS BIGINT) AS round,
         |    CAST(sum(n_pos) AS BIGINT) AS n_pos,
         |    CAST(sum(n_neg) AS BIGINT) AS n_neg,
         |    CAST(sum(n_pos * (2 * cum_neg - n_neg)) AS BIGINT) AS u2
         |  FROM hc$r$sfx
         |)""".stripMargin
    }.mkString

  /** auc_bp from a (n_pos, n_neg, u2) row — the ×10⁴ multiply runs in
    * HUGEINT (engine twin: DECIMAL(38,0)) so it cannot wrap at u2
    * beyond ~9.2·10¹⁴ (holdouts past ~10⁹ docs), then narrows back to
    * BIGINT: the quotient is ≤ 10⁴ by construction. */
  val aucBpExpr: String =
    "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL " +
      "ELSE CAST((CAST(u2 AS HUGEINT) * 10000) // (2 * n_pos * n_neg) " +
      "AS BIGINT) END"

  /** The round-selection chain appended after [[prefix]]: a second
    * training pass restricted to the doc_id % HoldoutMod ≠ 0 split
    * (suffix `v`), its holdout learning curve, `bestv` = the argmax
    * round (ties → later round — more training at equal validation
    * quality), and `ws` = the FULL-data weights at that round (the
    * validate-then-refit rule: the holdout picks the hyperparameter,
    * the served model trains on everything). */
  val servedSelection: String =
    chain(s"doc_id % $HoldoutMod <> 0", "v", ", ") +
      holdoutAucCtes("v", s"doc_id % $HoldoutMod = 0") +
      s""", curvev AS (
         |${(1 to Rounds).map(r =>
        s"  SELECT round, $aucBpExpr AS auc_bp FROM ha${r}v")
        .mkString("\n  UNION ALL\n")}
         |), bestv AS (
         |  SELECT round FROM curvev WHERE auc_bp IS NOT NULL
         |  ORDER BY auc_bp DESC, round DESC LIMIT 1
         |), ws AS (
         |  SELECT t.w0, t.w1, t.w2, t.w3
         |  FROM (${(1 to Rounds).map(r =>
        s"SELECT CAST($r AS BIGINT) AS round, * FROM wr$r")
        .mkString("\n        UNION ALL ")}) t, bestv
         |  WHERE t.round = bestv.round
         |)""".stripMargin

  /** Scored-docs CTE (doc_id, y, n_chars, z) over the SERVED weights —
    * the oracle twin of [[graft.operators.Logit.scoredDocs]]:
    * full-data training, holdout round selection, score from `ws`. */
  val scored: String =
    s"""$prefix$servedSelection, scored AS (
       |  SELECT doc_id, y, n_chars,
       |    (w0*x0 + w1*x1 + w2*x2 + w3*x3) // $Grid AS z
       |  FROM x, ws
       |)""".stripMargin
}
