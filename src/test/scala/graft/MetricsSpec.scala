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
  /** Driver-side replica of the WHOLE trained-logit pipeline (q278's
    * plant → feature → center → train → score), all exact Long math —
    * the independent reference q220/q235 are checked against. Returns
    * (doc_id, z, y) with y = 1 for clean. */
  private def refScores(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import graft.operators.Logit
    def tdiv(a: Long, b: Long): Long = a / b
    val g = Logit.Grid
    val aug = docs.map { case (id, text) =>
      val t = if (id % 5 == 0)
        text + (" " + Logit.SpamLine) * (1 + (id % 3)).toInt
      else text
      (id, t, if (id % 5 == 0) 0L else 1L)
    }
    val raw = aug.map { case (id, t, y) =>
      val tk = t.split(" ", -1)
      val nTok = tk.length.toLong
      val nStop = tk.count(Set("a", "the", "of", "to")).toLong
      val nChars = t.length.toLong
      (id, y, tdiv(nTok * g, 100), tdiv(nStop * g, nTok),
        tdiv((nChars - (nTok - 1)) * g, nTok * 10))
    }
    val n = raw.length.toLong
    val (m1, m2, m3) = (tdiv(raw.map(_._3).sum, n),
      tdiv(raw.map(_._4).sum, n), tdiv(raw.map(_._5).sum, n))
    val feats = raw.map { case (_, y, r1, r2, r3) =>
      (g, r1 - m1, r2 - m2, r3 - m3, y)
    }
    val w = Logit.referenceTrain(feats, Logit.Rounds, Logit.LrDen).last
    raw.zip(feats).map { case ((id, y, _, _, _), (x0, x1, x2, x3, _)) =>
      (id, tdiv(w.w0 * x0 + w.w1 * x1 + w.w2 * x2 + w.w3 * x3, g), y)
    }
  }

  test("q220 AUC equals brute-force pairwise Mann-Whitney on a planted corpus") {
    val tmp = Files.createTempDirectory("metrics").toString
    // 12 docs: ids 0/5/10 get the boilerplate plant (the doc_id % 5
    // training axis), texts varied so scores spread and some tie
    val docs = (0 until 12).map { i =>
      (i.toLong, Seq.fill(4 + i % 5)(s"w${i % 3}").mkString(" "),
        "en", s"src${i % 3}", 10L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.parquet(s"$tmp/documents.parquet")

    val row = SparkEntry.queries("q220_auc_dup_detection")(spark, tmp)
      .collect().head
    val (np, nn, u2, auc) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getDouble(3))

    // brute force over all pos×neg pairs of the reference-trained score
    val scored = refScores((0 until 12).map(i =>
      (i.toLong, Seq.fill(4 + i % 5)(s"w${i % 3}").mkString(" "))))
    val pos = scored.filter(_._3 == 1L).map(_._2) // clean = positive class
    val neg = scored.filter(_._3 == 0L).map(_._2)
    assert(np === pos.size.toLong && nn === neg.size.toLong)
    val u2Ref = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    assert(u2 === u2Ref)
    assert(auc === u2Ref.toDouble / (2.0 * pos.size * neg.size))
    graft.operators.FramePool.release()
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

  test("q226 confirms planted triples and Apriori-prunes candidates with an infrequent face") {
    val tmp = Files.createTempDirectory("metrics").toString
    // baskets: {1,2,3} ×3 (triple support 3; all faces frequent),
    // {1,2,4} once + pair (1,4) once more and (2,4) NOWHERE else —
    // faces (1,2) and (1,4) are frequent but (2,4) has support 1, so
    // candidate (1,2,4) must be PRUNED by the closure property, not
    // reported with support 1
    val baskets = Seq(
      Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), Seq(1L, 2L, 3L),
      Seq(1L, 2L, 4L), Seq(1L, 4L, 9L))
    val rows = baskets.zipWithIndex.flatMap { case (parts, ok) =>
      parts.map(pk => (ok.toLong, pk))
    }.toDF("l_orderkey", "l_partkey")
    rows.write.parquet(s"$tmp/lineitem.parquet")

    val got = SparkEntry.queries("q226_frequent_triples")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        r.getLong(3)).toMap
    assert(got === Map((1L, 2L, 3L) -> 3L))
  }

  test("q227 splits conversion credit equally among 24h-window views, exact boundaries") {
    val tmp = Files.createTempDirectory("metrics").toString
    def ev(id: Long, user: Long, typ: String, ts: String) =
      (id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")
    val pTs = "2024-03-10 12:00:00"
    val rows = Seq(
      // user 1: purchase with 3 in-window views (hours 13, 9, 12 prev
      // day), one view exactly AT the 24h boundary (included: >= pts-24h),
      // one view a second past it (excluded), one view at pts (excluded)
      ev(1, 1, "purchase", pTs),
      ev(2, 1, "view", "2024-03-10 09:30:00"),
      ev(3, 1, "view", "2024-03-10 11:59:59"),
      ev(4, 1, "view", "2024-03-09 13:00:00"),
      ev(5, 1, "view", "2024-03-09 12:00:00"),   // boundary: included
      ev(6, 1, "view", "2024-03-09 11:59:59"),   // past window: excluded
      ev(7, 1, "view", pTs),                     // at purchase: excluded
      // user 2: purchase with ONE view → full 10^6 credit
      ev(10, 2, "purchase", "2024-03-10 12:00:00"),
      ev(11, 2, "view", "2024-03-10 09:45:00"),
      // user 3: view with no purchase → no credit anywhere
      ev(20, 3, "view", "2024-03-10 09:00:00"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")

    val got = SparkEntry.queries("q227_multitouch_attribution")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // user 1's k = 4 (three inner views + the boundary view) → 250000
    // each; user 2's k = 1 → 1000000
    assert(got(9L) === ((2L, 2L, 250000L + 1000000L))) // 09:30 + 09:45
    assert(got(11L) === ((1L, 1L, 250000L)))           // 11:59:59
    assert(got(13L) === ((1L, 1L, 250000L)))           // prev-day 13:00
    assert(got(12L) === ((1L, 1L, 250000L)))           // boundary view
    assert(got.values.map(_._3).sum === 2000000L)      // credit conserves
    assert(!got.contains(20L) && got.size === 4)
  }

  test("q229 counts planted orphans and unreferenced parents per FK edge") {
    val tmp = Files.createTempDirectory("metrics").toString
    // nation 0-2; customer 10 (nation 0), 11 (nation 1), 12 (nation 99
    // — ORPHAN); nation 2 unreferenced. orders: cust 10 twice, cust 77
    // (orphan); customer 11/12 orderless. lineitem edges all clean.
    Seq((0L, "A"), (1L, "B"), (2L, "C")).toDF("n_nationkey", "n_name")
      .write.parquet(s"$tmp/nation.parquet")
    Seq((10L, 0L), (11L, 1L), (12L, 99L))
      .toDF("c_custkey", "c_nationkey").write.parquet(s"$tmp/customer.parquet")
    Seq((100L, 10L), (101L, 10L), (102L, 77L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$tmp/orders.parquet")
    Seq((500L, "p")).toDF("p_partkey", "p_name")
      .write.parquet(s"$tmp/part.parquet")
    Seq((600L, "s")).toDF("s_suppkey", "s_name")
      .write.parquet(s"$tmp/supplier.parquet")
    Seq((100L, 500L, 600L), (101L, 500L, 600L))
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$tmp/lineitem.parquet")

    val got = SparkEntry.queries("q229_ref_integrity")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("customer.c_nationkey->nation") === ((3L, 3L, 1L, 1L)))
    assert(got("orders.o_custkey->customer") === ((3L, 2L, 1L, 2L)))
    assert(got("lineitem.l_orderkey->orders") === ((2L, 2L, 0L, 1L)))
    assert(got("lineitem.l_partkey->part") === ((2L, 1L, 0L, 0L)))
    assert(got("lineitem.l_suppkey->supplier") === ((2L, 1L, 0L, 0L)))
  }

  test("q230 reconciles exact orders to zero diff and measures planted drift exactly") {
    val tmp = Files.createTempDirectory("metrics").toString
    // order 1: 2 lineitems, total EXACTLY Σ e(1-d)(1+t) → diff 0.
    // order 2: stated total off by exactly one cent (NOT a mismatch —
    // the tolerance is strict >1 cent)
    // order 3: off by +1.00 → mismatch of exactly 10^6 units.
    // order 4: no lineitems → full stated total is the diff.
    val l = Seq(
      (1L, 100.00, 0.10, 0.05), // 100·0.90·1.05 = 94.50
      (1L, 50.00, 0.00, 0.08),  // 50·1.08 = 54.00 → order 1 = 148.50
      (2L, 10.25, 0.00, 0.00),
      (3L, 20.00, 0.50, 0.00))  // 10.00
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
    l.write.parquet(s"$tmp/lineitem.parquet")
    Seq((1L, "O", 148.50), (2L, "O", 10.26), (3L, "F", 11.00),
      (4L, "F", 7.25))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$tmp/orders.parquet")

    val got = SparkEntry.queries("q230_order_total_audit")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // status O: order 1 diff 0; order 2 diff exactly 0.01 = 10^4 units
    assert(got("O") === ((2L, 0L, 10000L, 10000L)))
    // status F: order 3 diff 1.00 = 10^6; order 4 diff 7.25 = 7.25·10^6
    assert(got("F") === ((2L, 2L, 1000000L + 7250000L, 7250000L)))
  }

  test("q231 aligns exactly the mutual top-1 pairs across the label divide") {
    val tmp = Files.createTempDirectory("metrics").toString
    // label 0: a1=(1,0), a2=(0.9,0.1), a3=(0,1); label 1: b1=(1,0.01),
    // b2=(0.1,1). a1↔b1 mutual (cos≈1). a2's NN is b1 too — but b1's
    // NN is a1, so a2 stays unmatched. a3↔b2 mutual.
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.0f, 1.0f), 0),
      (11L, Array(1.0f, 0.01f), 1), (12L, Array(0.1f, 1.0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")

    val got = SparkEntry.queries("q231_rnn_alignment")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 11L), (3L, 12L)))
  }

  test("q232 trains on pre-boundary successors only and scores the planted test pairs") {
    val tmp = Files.createTempDirectory("metrics").toString
    def ev(id: Long, user: Long, typ: String, ts: String) =
      (id, java.sql.Timestamp.valueOf(ts), user, typ, 1.0, "{}")
    // TRAIN (successor before 01-22): user 1 contributes a->b, a->b,
    // b->a; user 2 contributes a->c. Model: a predicts b (2 > 1),
    // b predicts a. TEST: user 1's b->b (miss) and the CROSS-BOUNDARY
    // a->b pair (hit; its successor is post-boundary so it must NOT
    // have trained), user 3's c->a (c absent from training -> NULL
    // prediction, scored as a miss).
    val rows = Seq(
      ev(1, 1, "a", "2024-01-10 10:00:00"),
      ev(2, 1, "b", "2024-01-10 11:00:00"),
      ev(3, 1, "a", "2024-01-11 10:00:00"),
      ev(4, 1, "b", "2024-01-11 11:00:00"),
      ev(5, 1, "a", "2024-01-12 10:00:00"),  // b->a trains too
      ev(20, 2, "a", "2024-01-15 10:00:00"),
      ev(21, 2, "c", "2024-01-15 11:00:00"),
      // cross-boundary: prev at 01-21, successor at 01-23 -> TEST
      ev(6, 1, "a", "2024-01-21 10:00:00"),
      ev(7, 1, "b", "2024-01-23 10:00:00"),
      ev(8, 1, "b", "2024-01-24 10:00:00"),  // b->b test miss
      ev(30, 3, "c", "2024-01-25 10:00:00"),
      ev(31, 3, "a", "2024-01-25 11:00:00")) // c->a, c untrained
    // the 01-21 a-event's PREDECESSOR pair (a at 01-12... wait: user 1
    // stream is a,b,a,b,a,a,b,b -> pairs: a->b, b->a, a->b, b->a,
    // a->a (01-12 -> 01-21, successor pre-boundary TRAIN), a->b
    // (cross-boundary TEST), b->b (TEST).
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")

    val got = SparkEntry.queries("q232_markov_backtest")(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3),
          r.getDouble(4)))).toMap
    // train pairs: a->b x2, b->a x2, a->a x1, a->c x1 => a: b wins
    // (2 > 1 = a, 1 = c); b predicts a
    assert(got("a") === ((Some("b"), 1L, 1L, 1.0))) // the cross-boundary hit
    assert(got("b") === ((Some("a"), 1L, 0L, 0.0))) // b->b miss
    assert(got("c") === ((None, 1L, 0L, 0.0)))      // untrained prev
  }

  test("q233 recovers hand-computed cohesion/separation on planted unit vectors") {
    val tmp = Files.createTempDirectory("metrics").toString
    // label 0: two copies of e_x (cohesion 1); label 1: two copies of
    // e_y; label 2: one e_x + one e_y (cohesion 0). cross(0,1) = 0,
    // cross(0,2) = cross(1,2) = 0.5 -> labels 0/1 are nearest to 2
    // with margin 0.5; label 2's crosses tie at 0.5 -> nearest is the
    // smaller label 0, margin -0.5.
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(1.0f, 0.0f), 2), (6L, Array(0.0f, 1.0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$tmp/embeddings.parquet")

    val got = SparkEntry.queries("q233_label_cohesion")(spark, tmp)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getInt(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    assert(got(0) === ((2L, 1.0, 2, 0.5, 0.5)))
    assert(got(1) === ((2L, 1.0, 2, 0.5, 0.5)))
    assert(got(2) === ((2L, 0.0, 0, 0.5, -0.5)))
  }

  test("q235 buckets by exact global rank and reports per-decile dup rates") {
    val tmp = Files.createTempDirectory("metrics").toString
    // 20 docs, ids 0/5/10/15 planted (the doc_id % 5 axis); texts vary
    // in length and stopword mix so the trained score spreads
    val texts = (0 until 20).map(i =>
      (i.toLong, (Seq.fill(3 + i % 7)(s"w$i") ++
        Seq.fill(i % 3)("the")).mkString(" ")))
    texts.map { case (id, t) => (id, t, "en", "s", 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")

    val got = SparkEntry.queries("q235_calibration_deciles")(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).toSeq

    // independent reference: rank the reference-trained scores by
    // (z, doc_id), decile = ((rn-1)*10)/n, exact per-decile aggregates
    val ranked = refScores(texts).sortBy(s => (s._2, s._1)).zipWithIndex
    val n = ranked.length.toLong
    val ref = ranked.map { case ((_, z, y), i) =>
      ((i.toLong * 10L) / n, z, if (y == 0L) 1L else 0L)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, rows) =>
      (d, rows.length.toLong, rows.map(_._3).sum,
        rows.map(_._3).sum.toDouble / rows.length,
        rows.map(_._2).min, rows.map(_._2).max)
    }
    assert(got === ref)
    assert(got.map(_._1) === (0L to 9L)) // all ten deciles present
    assert(got.map(_._3).sum === 4L) // the four planted docs accounted for
    graft.operators.FramePool.release()
  }
}
