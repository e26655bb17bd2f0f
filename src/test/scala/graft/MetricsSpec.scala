package graft

import java.nio.file.Files

/** Planted-semantics checks for the round-10 statistics trio — each
  * formula pinned against an independent computation on a fixture the
  * test fully controls (the oracle gates prove DuckDB parity; these
  * prove the FORMULA, since both engine expressions were written by the
  * same hand and could share a conceptual error):
  *   - q220 exact AUC: brute-force pairwise Mann–Whitney (wins + half
  *     ties over all pos×neg pairs) on a planted corpus equals the
  *     distinct-score rank-statistic the query computes;
  *   - q221 χ²: a hand-computable 2×2 table recovers the textbook
  *     value, and the every-doc degenerate token is excluded;
  *   - q222 OLS: an exactly-linear planted series recovers its slope
  *     and intercept bit-exactly. */
class MetricsSpec extends SparkSpec {

  import spark.implicits._

  // q123's z, reimplemented independently (plain Scala doubles — the
  // same IEEE ops in the same order as both engine expressions)
  private def zOf(text: String, nChars: Long): Double = {
    val tk = text.split(" ", -1)
    val nTok = tk.length.toDouble
    val nStop = tk.count(Set("a", "the", "of", "to")).toDouble
    -1.5 + 0.02 * nTok + 1.6 * (nStop / nTok) -
      0.12 * ((nChars - (nTok - 1)) / nTok)
  }

  test("q220 AUC equals brute-force pairwise Mann-Whitney on a planted corpus") {
    val tmp = Files.createTempDirectory("metrics").toString
    // 12 docs; duplicates planted by exact text repetition (dup label),
    // with texts chosen so some scores collide across labels (ties)
    val texts = Seq(
      "the cat", "the cat", "the cat", // 3-way dup
      "of dog bones here", "of dog bones here", // 2-way dup
      "a b c", "x y z",
      "unique one here", "unique two there", "w", "the the the", "lone doc")
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", s"src${i % 3}", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$tmp/documents.parquet")

    val row = SparkEntry.queries("q220_auc_dup_detection")(spark, tmp)
      .collect().head
    val (np, nn, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))

    // brute force over all pos×neg pairs
    val dupTexts = texts.groupBy(identity).filter(_._2.size > 1).keySet
    val scored = texts.map(t => (zOf(t, t.length.toLong), dupTexts(t)))
    val pos = scored.filter(_._2).map(_._1)
    val neg = scored.filterNot(_._2).map(_._1)
    assert(np === pos.size.toLong && nn === neg.size.toLong)
    val u2Ref = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(u2 === u2Ref)
    assert(auc === u2Ref.toDouble / (2.0 * pos.size * neg.size))
  }

  test("q221 chi-squared recovers the textbook 2x2 value; every-doc tokens are excluded") {
    val tmp = Files.createTempDirectory("metrics").toString
    // 20 docs, 2 sources of 10. "sig" in 5 of srcA + 1 of srcB (df=6);
    // "pad" in all 20 (df = N → must be excluded); fillers df=1 (< 5).
    val docs = (0 until 20).map { i =>
      val src = if (i < 10) "srcA" else "srcB"
      val sig = if (i < 5 || i == 10) "sig " else ""
      (i.toLong, s"${sig}pad filler$i", "en", src, 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("q221_chi2_tokens")(spark, tmp)
      .collect()
      .map(r => (r.getString(0), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(!got.keySet.exists(_._2 == "pad"), "df = N token must be excluded")
    assert(!got.keySet.exists(_._2.startsWith("filler")), "df < 5 must be excluded")
    // srcA: a=5, df=6, ns=10, N=20 → b=1, c=5, d=9
    // χ² = 20·(5·9 − 1·5)² / (6·14·10·10) = 32000/8400
    val refA = (BigInt(20) * BigInt(40).pow(2) * 1000000) /
      (BigInt(6) * 14 * 10 * 10)
    assert(got(("srcA", "sig")) === ((5L, 6L, refA.toLong)))
    // srcB: a=1, b=5, c=9, d=5 → ad−bc = −40; the square (and so χ²)
    // matches srcA — the 2×2 statistic is symmetric in the two columns
    assert(got(("srcB", "sig")) === ((1L, 6L, refA.toLong)))
  }

  test("q222 OLS recovers an exactly-linear planted trend bit-exactly") {
    val tmp = Files.createTempDirectory("metrics").toString
    // y = 3 + 2x exactly on days x = 0..9, two rows per day (no noise:
    // the normal equations must return slope 2, intercept 3 exactly);
    // a one-day type exercises the degenerate NULL branch
    val rows = (0 until 10).flatMap { x =>
      Seq((x.toLong, java.sql.Timestamp.valueOf(f"2024-01-${x + 1}%02d 06:00:00"),
        1L, "lin", 3.0 + 2.0 * x, "{}"),
        (x.toLong + 100, java.sql.Timestamp.valueOf(f"2024-01-${x + 1}%02d 18:30:00"),
          2L, "lin", 3.0 + 2.0 * x, "{}"))
    } ++ Seq((500L, java.sql.Timestamp.valueOf("2024-01-05 12:00:00"),
      3L, "flat", 7.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")

    val got = SparkEntry.queries("q222_ols_value_trend")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    val (nLin, slope, icpt) = got("lin")
    assert(nLin === 20L)
    // fixed-point 10⁹ grid: slope 2.0 → 2e9, intercept 3.0 → 3e9
    assert(slope === Some(2000000000L) && icpt === Some(3000000000L))
    // single-day group: zero x-variance → NULL slope and intercept
    assert(got("flat") === ((1L, None, None)))
  }

  test("q224 histogram estimates match an independent walk; exact column is the true order statistic") {
    val tmp = Files.createTempDirectory("metrics").toString
    // 60 values across 4 bins with deliberately uneven bin loads
    val vals = (0 until 60).map(i => 0.25 + (i % 4) * 1.0 + (i % 7) * 0.05)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"),
        1L, "t", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")

    val got = SparkEntry.queries("q224_hist_quantile_sketch")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // independent reference: micro-units, bins of width 10^6, cum walk
    val micro = vals.map(v =>
      (BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        * 1000000).toLongExact)
    val n = micro.size.toLong
    val bins = micro.groupBy(_ / 1000000L).map { case (b, vs) => b -> vs.size.toLong }
    val sortedBins = bins.toSeq.sortBy(_._1)
    val sortedVals = micro.sorted
    got.foreach { case (p, r, est, exact, err) =>
      assert(r === (p * n + 99L) / 100L)
      var cum = 0L
      val (hitBin, cnt, cumPrev) = sortedBins.collectFirst {
        case (b, c) if { cum += c; cum >= r } => (b, c, cum - c)
      }.get
      assert(est === hitBin * 1000000L + (1000000L * (r - cumPrev)) / cnt,
        s"estimate mismatch at p=$p")
      assert(exact === sortedVals((r - 1).toInt), s"exact mismatch at p=$p")
      assert(err === est - exact)
      // the estimate lands inside the hit bin — the sketch's guarantee
      assert(est >= hitBin * 1000000L && est <= (hitBin + 1) * 1000000L)
    }
  }

  test("q225 KS statistic equals the brute-force CDF sup on a planted two-source corpus") {
    val tmp = Files.createTempDirectory("metrics").toString
    // src0 lengths cluster low, src1 high with overlap, src2 ≡ src0
    // (its D must be 0); ties across sources exercise the merged axis
    val lens0 = Seq(3L, 5L, 5L, 8L, 9L, 12L)
    val lens1 = Seq(5L, 9L, 14L, 15L, 15L, 18L, 20L)
    val lens2 = lens0
    val docs = (lens0.map(("src0", _)) ++ lens1.map(("src1", _)) ++
      lens2.map(("src2", _))).zipWithIndex.map { case ((s0, l), i) =>
      (i.toLong, "x" * l.toInt, "en", s0, l)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("q225_ks_drift")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

    def brute(a: Seq[Long], b: Seq[Long]): Long = {
      val axis = (a ++ b).distinct
      axis.map(x => math.abs(a.count(_ <= x).toLong * b.size -
        b.count(_ <= x).toLong * a.size)).max
    }
    val d1 = brute(lens1, lens0)
    assert(got("src1") === ((lens0.size.toLong, lens1.size.toLong, d1,
      d1.toDouble / (lens1.size.toLong * lens0.size))))
    assert(got("src2") === ((lens0.size.toLong, lens2.size.toLong, 0L, 0.0)))
    assert(!got.contains("src0"), "baseline must not be compared to itself")
  }
}
