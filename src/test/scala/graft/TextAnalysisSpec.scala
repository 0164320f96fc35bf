package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the text-retrieval queries (their value
  * correctness is DuckDB-oracled; these pin what SQL equality can't:
  * retrieval sanity and ranking shape). */
class TextAnalysisSpec extends SparkSpec {

  test("bm25: hits share a term with their query, ranks dense, scores non-increasing") {
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), " ").as("ts"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val hits = q("q_text_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(hits.nonEmpty)
    hits.foreach { case (qid, _, did, score) =>
      assert(qid % 100 == 0 && did % 100 != 0, "query/corpus sides swapped")
      assert(docs(qid).intersect(docs(did)).nonEmpty,
        s"hit $did shares no term with query $qid")
      assert(score > 0.0)
    }
    hits.groupBy(_._1).foreach { case (qid, rows) =>
      val byRank = rows.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to byRank.length),
        s"ranks not dense for query $qid")
      val scores = byRank.map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"scores not non-increasing for query $qid")
    }
  }

  test("lm score: one row per multi-token doc, n_bigrams = tokens-1, scores negative") {
    val toks = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = q("q_text_lmscore").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet == toks.filter(_._2 >= 2).keySet)
    rows.foreach { case (id, nb, score) =>
      assert(nb == toks(id) - 1, s"doc $id: $nb bigrams for ${toks(id)} tokens")
      // every probability is < 1 under add-one smoothing, so each log
      // term and hence the mean is strictly negative
      assert(score < 0.0, s"doc $id: non-negative lm score $score")
    }
    // a doc of corpus-common bigrams must outscore one of rare bigrams:
    // the score orders docs, which is the operator's entire purpose
    val byScore = rows.sortBy(_._3)
    assert(byScore.head._3 < byScore.last._3)
  }

  test("line dedup: counts consistent, clean text drops exactly the shared segments") {
    val rows = q("q_dedup_lines").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nSegs, nDup, frac, md5hex) =>
      assert(nSegs > 0 && nDup >= 0 && nDup <= nSegs, s"doc $id counts")
      assert(math.abs(frac - nDup.toDouble / nSegs) < 1e-6, s"doc $id frac")
      assert(md5hex.length == 32)
    }
    // cross-check one doc end to end: recompute its unique-segment
    // rewrite from first principles and compare digests
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val segsOf = docs.map { case (id, text) =>
      id -> text.split(" ").grouped(8).map(_.mkString(" ")).toVector
    }
    val dfCount = segsOf.values.flatMap(_.distinct).groupBy(identity)
      .map { case (s, o) => s -> o.size }
    val (probe, segs) = segsOf.head
    val expectClean = segs.filter(dfCount(_) == 1).mkString(" ")
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectClean.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = rows.find(_._1 == probe).get
    assert(got._5 == expectMd5, s"doc $probe rewrite digest")
    assert(got._3 == segs.count(dfCount(_) > 1).toLong, s"doc $probe dup count")
  }

  /** Plain-Scala BPE reference (greedy left-to-right non-overlapping
    * apply, count-desc/pair-asc argmax) over the sf fixture — shared by
    * the train and encode tests. Returns (word, cnt, final symbols). */
  private lazy val referenceBpe: Seq[(String, Long, Vector[String])] = {
    val words = sources.Tables.documents(spark, sf)
      .select(lower(col("text"))).collect().map(_.getString(0))
      .flatMap(_.split(" ")).filter(_.matches("^[a-z]{2,20}$"))
      .groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val top = words.toSeq.sortBy { case (w, c) => (-c, w) }.take(2000)
    var seqs = top.map { case (w, c) => (w, c, w.map(_.toString).toVector) }
    for (_ <- 1 to 6) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (_, c, ts) =>
        ts.zip(ts.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
      }
      val (ba, bb) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
      seqs = seqs.map { case (w, c, ts) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < ts.length) {
          if (i + 1 < ts.length && ts(i) == ba && ts(i + 1) == bb) {
            out += ts(i) + ts(i + 1); i += 2
          } else { out += ts(i); i += 1 }
        }
        (w, c, out.result())
      }
    }
    seqs
  }

  test("bpe: matches a from-first-principles 6-round merge train exactly") {
    val rows = q("q_text_bpe").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (w, _, enc, n) =>
      assert(enc.split(" ").mkString == w, s"$w: encoding must concat back")
      assert(n == enc.split(" ").length.toLong, s"$w: token count")
    }
    assert(rows.exists { case (w, _, _, n) => n < w.length },
      "six merges must shorten at least one top word")
    // independent reimplementation — the query's string-replace
    // encoding must match cell-for-cell, proving replace() really is
    // the BPE merge
    val expect = referenceBpe
      .map { case (w, c, ts) => (w, c, ts.mkString(" "), ts.length.toLong) }
      .sortBy { case (w, c, _, _) => (-c, w) }.take(150)
    assert(rows.toSeq == expect,
      "query encodings must equal the first-principles BPE train")
  }

  test("bpe encode: per-doc token counts recompute from the reference train") {
    val rows = q("q_text_bpe_encode").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ntOf = referenceBpe.map { case (w, _, ts) => w -> ts.length.toLong }
      .toMap
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, nWords, nTokens, nOov) =>
      val ws = docs(id).split(" ").filter(_.matches("^[a-z]{2,20}$"))
      assert(nWords == ws.length.toLong, s"doc $id word count")
      val expTok = ws.map(w => ntOf.getOrElse(w, w.length.toLong)).sum
      assert(nTokens == expTok, s"doc $id token count")
      assert(nOov == ws.count(!ntOf.contains(_)).toLong, s"doc $id oov")
      assert(nTokens >= nWords && nOov >= 0)
    }
    // every document with any clean word must appear
    assert(rows.length == docs.count(_._2.split(" ")
      .exists(_.matches("^[a-z]{2,20}$"))))
  }

  test("rank fusion: RRF replays exactly from the two retrieval legs") {
    val bm25 = operators.TextAnalysis.bm25Ranking(spark, sf, 7L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val cos = operators.TextSimilarity.cosineRanking(spark, sf, 7L, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    def c(rnk: Long) = math.round(1e6 / (60.0 + rnk))
    val expected = (bm25.keySet ++ cos.keySet).map { k =>
      k -> (bm25.get(k).map(c).getOrElse(0L) + cos.get(k).map(c).getOrElse(0L),
        bm25.contains(k) && cos.contains(k))
    }.toMap
    val rows = q("q_rank_fusion").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      // dense ranks from 1, ordered by fused score then doc_id
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"query $qid fusion order")
        case _ =>
      }
      sorted.foreach { case (_, _, doc, micro, both) =>
        val (em, eb) = expected((qid, doc))
        assert(micro == em, s"query $qid doc $doc fused score")
        assert(both == eb, s"query $qid doc $doc in_both")
      }
      // the fused top-10 is exactly the 10 best fused candidates
      // NB: .toSeq first — Map#collect returning pairs would rebuild a
      // Map keyed by the fused score and silently drop tied scores
      val bestTen = expected.toSeq.collect { case ((q2, d), (m, _))
        if q2 == qid => (m, d) }.sortBy { case (m, d) => (-m, d) }
        .take(rs.length)
      assert(sorted.map(r => (r._4, r._3)).toSeq == bestTen,
        s"query $qid top-k selection")
    }
    // consensus exists somewhere (both systems retrieve from the same
    // corpus with correlated signals) and single-system hits exist too
    assert(rows.exists(_._5) && rows.exists(!_._5),
      "fixture must exercise both consensus and single-system hits")
  }

  test("fertility: per-lang ratios replay from the per-doc encode rollup") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val langOf = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // per-doc rollup from the sibling query (same token filter, same
    // trained table) — fertility must be its per-lang telescoping
    val perDoc = q("q_text_bpe_encode").collect()
      .map(r => (langOf(r.getLong(0)), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val docsAll = sources.Tables.documents(spark, sf)
      .select(col("lang"), lower(col("text"))).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val charsByLang = docsAll.groupBy(_._1).map { case (l, ds) =>
      l -> ds.flatMap(_._2.split(" "))
        .filter(_.matches("^[a-z]{2,20}$")).map(_.length.toLong).sum
    }
    val byLang = perDoc.groupBy(_._1).map { case (l, xs) =>
      l -> (xs.map(_._2).sum, xs.map(_._3).sum, xs.map(_._4).sum)
    }
    val rows = q("q_text_fertility").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.map(_._1).toSet == byLang.keySet, "one row per language")
    rows.foreach { case (l, nw, nt, fert, cpt, oov) =>
      val (ew, et, eo) = byLang(l)
      assert(nw == ew && nt == et, s"$l counts must telescope from docs")
      assert(fert == r6(et.toDouble / ew), s"$l fertility")
      assert(cpt == r6(charsByLang(l).toDouble / et), s"$l chars/token")
      assert(oov == r6(eo.toDouble / ew), s"$l oov rate")
      assert(fert >= 1.0 && oov >= 0.0 && oov <= 1.0)
    }
  }

  test("pmi: top-50 under total order, min count honored, scores replay") {
    val rows = q("q_text_pmi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 50, "top-50 collocations")
    assert(rows.forall(_._2 >= 5), "min bigram count 5")
    rows.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1),
        "descending rounded-pmi order with bigram tie-break")
    }
    // replay from first-principles counts (split keeps interior
    // empties, like Spark's split-on-regex)
    val texts = sources.Tables.documents(spark, sf)
      .select(lower(col("text"))).collect().map(_.getString(0))
    val uni = new scala.collection.mutable.HashMap[String, Long]()
    val bi = new scala.collection.mutable.HashMap[String, Long]()
    var nu = 0L
    var nb = 0L
    texts.foreach { t =>
      val ts = t.split(" ", -1)
      ts.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      nu += ts.length
      if (ts.length >= 2) {
        nb += ts.length - 1
        ts.sliding(2).foreach { p =>
          val k = p.mkString(" ")
          bi(k) = bi.getOrElse(k, 0L) + 1
        }
      }
    }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (bg, n, pmi) =>
      assert(bi(bg) == n, s"bigram count for '$bg'")
      val Array(w1, w2) = bg.split(" ", 2)
      val expect = round6(math.log(
        (n.toDouble * nu * nu) / (nb.toDouble * uni(w1) * uni(w2))))
      assert(math.abs(pmi - expect) < 1e-9, s"pmi for '$bg'")
    }
    // collocations carry positive association by construction of the
    // top-50 on this fixture
    assert(rows.head._3 > 0, "strongest collocation must be positive")
  }

  test("zipf: slope/intercept replay from a first-principles rank-frequency fit") {
    val r = q("q_text_zipf").collect().head
    val (n, slope, icept) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(slope < 0.0, "rank-frequency slope must be negative")
    // replay: term counts → (freq desc, term) rank → least squares
    val counts = new scala.collection.mutable.HashMap[String, Long]()
    sources.Tables.documents(spark, sf)
      .select(lower(col("text"))).collect().foreach { row =>
        row.getString(0).split(" ", -1).foreach { w =>
          counts(w) = counts.getOrElse(w, 0L) + 1
        }
      }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    assert(n == top.length.toLong, "top-N term count")
    val pts = top.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble))
    }
    def m9(x: Double) = math.round(x * 1e9)
    val (sx, sy) = (pts.map(p => m9(p._1)).sum / 1e9,
      pts.map(p => m9(p._2)).sum / 1e9)
    val sxy = pts.map(p => m9(p._1 * p._2)).sum / 1e9
    val sxx = pts.map(p => m9(p._1 * p._1)).sum / 1e9
    val eSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val eIcept = (sy - eSlope * sx) / n
    assert(math.abs(slope - eSlope) < 1e-5, s"slope $slope != $eSlope")
    assert(math.abs(icept - eIcept) < 1e-5, s"intercept $icept != $eIcept")
  }

  test("llr: top-50 G² replays from contingency counts; evidence-weighted vs PMI") {
    val rows = q("q_text_llr").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 50)
    assert(rows.forall(_._2 >= 5), "min bigram count 5")
    assert(rows.forall(_._3 >= 0.0), "G² is non-negative")
    // replay from first-principles bigram prefix/suffix counts
    val texts = sources.Tables.documents(spark, sf)
      .select(lower(col("text"))).collect().map(_.getString(0))
    val bi = new scala.collection.mutable.HashMap[(String, String), Long]()
    texts.foreach { t =>
      val ts = t.split(" ", -1)
      if (ts.length >= 2) ts.sliding(2).foreach { p =>
        bi((p(0), p(1))) = bi.getOrElse((p(0), p(1)), 0L) + 1
      }
    }
    val pre = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val suf = bi.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nb = bi.values.sum
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def term(k: Long, r: Long, c: Long): Double =
      if (k > 0) k.toDouble * math.log((k.toDouble * nb) / (r.toDouble * c))
      else 0.0
    rows.foreach { case (bg, n, g2) =>
      val Array(w1, w2) = bg.split(" ", 2)
      assert(bi((w1, w2)) == n, s"count for '$bg'")
      val (r1, c1) = (pre(w1), suf(w2))
      val expect = round6(2.0 * (term(n, r1, c1) +
        term(r1 - n, r1, nb - c1) + term(c1 - n, nb - r1, c1) +
        term(nb - r1 - c1 + n, nb - r1, nb - c1)))
      assert(math.abs(g2 - expect) < 1e-6, s"G² for '$bg': $g2 != $expect")
    }
    rows.sliding(2).foreach { w =>
      val (a, b) = (w(0), w(1))
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1),
        "descending rounded-G² order with bigram tie-break")
    }
  }

  test("entropy: per-source H replays and the normalized form is in [0,1]") {
    val rows = q("q_text_entropy").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val srcs = sources.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    assert(rows.length == srcs.toInt, "one row per source")
    val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
    sources.Tables.documents(spark, sf)
      .select(col("source"), lower(col("text"))).collect()
      .foreach { r =>
        r.getString(1).split(" ", -1).foreach { w =>
          val k = (r.getString(0), w)
          counts(k) = counts.getOrElse(k, 0L) + 1
        }
      }
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { case (src, n, v, h, hn) =>
      val cs = counts.collect { case ((s, _), c) if s == src => c }.toSeq
      assert(n == cs.sum, s"$src token total")
      assert(v == cs.size.toLong, s"$src vocab size")
      // the query's exact micro-sum pipeline, replayed
      val micro = cs.map(c =>
        math.round(c.toDouble * math.log(c.toDouble) * 1e9)).sum
      val expect = round6(math.log(n.toDouble) - (micro.toDouble / 1e9) / n)
      assert(math.abs(h - expect) < 1e-9, s"$src entropy")
      assert(hn >= 0.0 && hn <= 1.0, s"$src normalized entropy in [0,1]")
      assert(math.abs(hn - round6(
        (math.log(n.toDouble) - (micro.toDouble / 1e9) / n) /
          math.log(v.toDouble))) < 1e-6, s"$src normalized entropy value")
    }
  }

  test("quality train: classifier genuinely learns — separation, signal, replay") {
    val rows = q("q_quality_train").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs.toInt, "one score per document")
    assert(rows.forall(r => r._3 > 0.0 && r._3 < 1.0), "scores in (0,1)")
    assert(rows.forall(r => r._2 == 0L || r._2 == 1L), "binary label")
    assert(rows.forall(r => r._4 == (r._3 > 0.5)), "pred consistent with score")
    // the trained scores must actually separate the classes — a
    // degenerate fit (all scores at the base rate) fails here
    val pos = rows.filter(_._2 == 1L).map(_._3)
    val neg = rows.filter(_._2 == 0L).map(_._3)
    assert(pos.nonEmpty && neg.nonEmpty, "both classes present")
    val sep = pos.sum / pos.length - neg.sum / neg.length
    assert(sep > 0.1, s"class separation $sep too small — GD learned nothing")
    // the dominant signal is document length (w1 > 0): long docs must
    // score higher than short ones
    val byLen = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sorted = rows.sortBy(r => byLen(r._1))
    val q1 = sorted.take(rows.length / 4).map(_._3)
    val q4 = sorted.takeRight(rows.length / 4).map(_._3)
    assert(q4.sum / q4.length > q1.sum / q1.length + 0.05,
      "longest-quartile docs must outscore the shortest quartile")
    // fixed-round full-batch GD is deterministic
    val again = q("q_quality_train").collect().map(_.getDouble(2))
    assert(rows.map(_._3).toSeq == again.toSeq, "training must replay exactly")
  }

  test("quality eval: AUC/ECE/accuracy/Brier replay from the scored corpus") {
    val scored = q("q_quality_train").collect()
      .map(r => (r.getLong(1), r.getDouble(2))) // (y, score6)
    val m = q("q_quality_auc").collect().head
    val (nPos, nNeg, auc, acc, brier, ece) = (m.getLong(0), m.getLong(1),
      m.getDouble(2), m.getDouble(3), m.getDouble(4), m.getDouble(5))
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(nPos == scored.count(_._1 == 1L).toLong &&
      nNeg == scored.count(_._1 == 0L).toLong)
    // AUC replay: exact concordant-pair counting on the same 1000-bin
    // quantization the operator is DEFINED over
    def bin(s: Double) = math.min(math.floor(s * 1000).toLong, 999L)
    val pos = scored.filter(_._1 == 1L).map(x => bin(x._2))
    val neg = scored.filter(_._1 == 0L).map(x => bin(x._2))
    val num2 = pos.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p).toLong).sum
    assert(auc == r6(num2.toDouble / (2.0 * pos.length * neg.length)),
      "AUC must equal exact pair counting on the binned scores")
    // measured 0.744 at sf0.001 — floor just under, so a ranking
    // regression fails while fixture noise doesn't
    assert(auc > 0.72, s"the learned model must rank well (auc=$auc)")
    // accuracy / Brier replay
    val correct = scored.count { case (y, s0) => (s0 > 0.5) == (y == 1L) }
    assert(acc == r6(correct.toDouble / scored.length))
    val brierMicro = scored.map { case (y, s0) =>
      BigDecimal((s0 - y) * (s0 - y) * 1e9)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong }.sum
    assert(brier == r6(brierMicro.toDouble / 1e9 / scored.length))
    // ECE replay from the 10-bin reliability table, and the table's own
    // internal consistency
    val cal = q("q_quality_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(cal.map(_._2).sum == scored.length.toLong)
    cal.foreach { case (_, nB, npB, a, c, g) =>
      assert(npB <= nB && a >= 0.0 && a <= 1.0 && c >= 0.0 && c <= 1.0)
      assert(g >= 0.0 && g <= 1.0)
    }
    val eceMicro = cal.map { case (cb, nB, npB, _, _, _) =>
      val confMicro = scored.filter(x =>
        math.min(math.floor(x._2 * 10).toLong, 9L) == cb)
        .map(x => BigDecimal(x._2 * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
      math.abs(npB * 1000000L - confMicro)
    }.sum
    assert(ece == r6(eceMicro.toDouble / 1e6 / scored.length),
      "ECE must replay from the reliability bins")
  }

  test("docsim: sparse cosine top-5 replays from a brute-force tf-idf ranking") {
    val rows = q("q_text_docsim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    def microSum(xs: Iterable[Double]): Long = xs.map(x =>
      BigDecimal(x * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).sum
    // brute-force tf-idf weights driver-side
    val docs = sources.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split(" ").toSeq).toMap
    val n = docs.size.toDouble
    val tf = docs.map { case (d, ts) =>
      d -> ts.groupBy(identity).map { case (t, g) => t -> g.length } }
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, g) => t -> g.size }
    val w = tf.map { case (d, m) =>
      d -> m.map { case (t, f) => t -> f * math.log(n / df(t)) } }
    val normC = w.map { case (d, m) =>
      d -> microSum(m.values.map(x => x * x)) }
    val queries = docs.keys.filter(d => d % 100 == 7 && d < 5000).toSeq.sorted
    val expect = queries.flatMap { qd =>
      val wq = w(qd)
      val cands = docs.keys.filter(_ != qd).flatMap { d =>
        val shared = wq.keySet.intersect(w(d).keySet)
        if (shared.isEmpty) None
        else {
          val dotC = microSum(shared.toSeq.sorted.map(t => wq(t) * w(d)(t)))
          val cos = BigDecimal((dotC.toDouble / 1e9) /
            (math.sqrt(normC(qd).toDouble / 1e9) *
              math.sqrt(normC(d).toDouble / 1e9)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((d, cos))
        }
      }.toSeq
      cands.sortBy { case (d, c) => (-c, d) }.take(5).zipWithIndex
        .map { case ((d, c), i) => (qd, (i + 1).toLong, d, c) }
    }
    assert(rows.toSeq == expect, "docsim top-5 must replay")
  }

  test("phrase search: posting-list joins equal a sliding-window scan") {
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ").toSeq))
    val queries = Seq("key agg row", "slow fast table", "value table part",
      "window stream sort", "query big table", "spark join merge")
    val expect = queries.sorted.map { p =>
      val ws = p.split(" ").toSeq
      val hits = docs.flatMap { case (id, ts) =>
        ts.sliding(3).filter(_ == ws).map(_ => id)
      }
      (p, hits.length.toLong,
        hits.distinct.length.toLong,
        if (hits.isEmpty) -1L else hits.min)
    }
    val got = q("q_text_phrase").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expect, "phrase matches must replay from a naive scan")
    // the fixture must exercise both sides: some phrase matches, and
    // the zero-match path is kept by the left join
    assert(got.map(_._2).sum > 0, "at least one phrase must occur")
  }

  test("rank fusion: staged-tf and per-leg paths emit identical rows") {
    // the corpus-size auto-switch must be invisible to results: every
    // leg quantity is an exact integer derivation of the shared
    // (doc, term, tf) table, so both paths are row-identical
    val shared = operators.TextSimilarity
      .fusedTopK(spark, sf, shareTf = true).collect().toSeq
    val perLeg = operators.TextSimilarity
      .fusedTopK(spark, sf, shareTf = false).collect().toSeq
    assert(shared == perLeg,
      "shareTf staging must be bit-identical to per-leg recompute")
    assert(shared.nonEmpty)
  }

  test("diversity: distinct-n counts replay exactly in plain Scala") {
    val rows = q("q_eval_diversity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    val docs = sources.Tables.documents(spark, sf)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val bySrc = docs.groupBy(_._1)
    assert(rows.map(_._1).toSet == bySrc.keySet)
    rows.foreach { case (src, nDocs, t1, d1, t2, d2, r1, r2) =>
      val toks = bySrc(src).map(_._2.toLowerCase.split(" ").toSeq)
      assert(nDocs == bySrc(src).length)
      val unis = toks.flatten
      val bis = toks.flatMap(ts => ts.zip(ts.tail).map { case (a, b) => s"$a $b" })
      assert(t1 == unis.length && d1 == unis.distinct.length, s"$src unigrams")
      assert(t2 == bis.length && d2 == bis.distinct.length, s"$src bigrams")
      assert(math.abs(r1 - d1.toDouble / t1) < 1e-6)
      assert(math.abs(r2 - d2.toDouble / t2) < 1e-6)
    }
  }

  test("unigram: Viterbi segmentation and log-likelihood replay exactly in plain Scala") {
    val rows = q("q_text_unigram").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty && rows.length <= 150)
    val docs = sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val wordFreq = docs.flatMap(_.toLowerCase.split(" "))
      .filter(_.matches("^[a-z]{2,20}$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(2000)
    def form(w: String, st: Int, l: Int): String =
      if (st == 0) w.substring(0, l) else "##" + w.substring(st, st + l)
    val cands = wordFreq.flatMap { case (w, c) =>
      for (st <- 0 until w.length; l <- 1 to math.min(4, w.length - st))
        yield (form(w, st, l), l, c)
    }
    val charW = cands.filter(_._2 == 1).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq
    val multiW = cands.filter(_._2 >= 2).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(200)
    val total = (charW ++ multiW).map(_._2).sum
    val lpq = (charW ++ multiW).map { case (p, n) =>
      p -> BigDecimal(math.log(n.toDouble / total.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
    val freq = wordFreq.toMap
    rows.foreach { case (w, cnt, encoded, n, ll) =>
      assert(freq(w) == cnt, s"$w count drifted")
      // independent imperative Viterbi over the micro-int log-probs
      val best = Array.fill(w.length + 1)(Long.MinValue)
      val back = Array.fill(w.length + 1)(0)
      best(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(4, i)) {
        lpq.get(form(w, i - l, l)).foreach { v =>
          val cand = best(i - l) + v
          // engine tie rule: max value, ties to the LONGEST piece;
          // l ascending here, so >= keeps the longest winner
          if (best(i - l) != Long.MinValue &&
              (cand > best(i) || (cand == best(i) && l >= back(i)))) {
            best(i) = cand; back(i) = l
          }
        }
      }
      val out = scala.collection.mutable.Buffer[String]()
      var p = w.length
      while (p > 0) { out.prepend(form(w, p - back(p), back(p))); p -= back(p) }
      assert(out.mkString(" ") == encoded,
        s"$w viterbi mismatch: got '$encoded', replay '${out.mkString(" ")}'")
      assert(out.length.toLong == n)
      assert(best(w.length) == ll, s"$w ll_micro ${ll} != replay ${best(w.length)}")
      assert(out.map(_.stripPrefix("##")).mkString == w)
    }
  }

  test("wordpiece: pieces reassemble the word; greedy is maximal-munch vs a replayed vocab") {
    val rows = q("q_text_wordpiece").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 150)
    // replay vocab induction + greedy in plain Scala (an independent
    // implementation — no Spark, no SQL)
    val docs = sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val wordFreq = docs.flatMap(_.toLowerCase.split(" "))
      .filter(_.matches("^[a-z]{2,20}$"))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(2000)
    val cands = wordFreq.flatMap { case (w, c) =>
      for (st <- 0 until w.length; l <- 1 to math.min(4, w.length - st))
        yield (if (st == 0) w.substring(0, l)
               else "##" + w.substring(st, st + l), l, c)
    }
    val chars = cands.filter(_._2 == 1).map(_._1).toSet
    val multi = cands.filter(_._2 >= 2).groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(200).map(_._1).toSet
    val vocab = chars ++ multi
    val freq = wordFreq.toMap
    def pieceAt(w: String, p: Int, l: Int): String =
      if (p == 0) w.substring(0, l) else "##" + w.substring(p, p + l)
    rows.foreach { case (w, cnt, encoded, n) =>
      assert(freq(w) == cnt, s"$w count drifted")
      val pieces = encoded.split(" ").toSeq
      assert(pieces.length.toLong == n, s"$w n_pieces != encoded length")
      assert(pieces.map(_.stripPrefix("##")).mkString == w,
        s"$w: '$encoded' does not reassemble the word")
      var p = 0
      val out = scala.collection.mutable.Buffer[String]()
      while (p < w.length) {
        val l = (4 to 1 by -1).find(l =>
          p + l <= w.length && vocab.contains(pieceAt(w, p, l))).get
        out += pieceAt(w, p, l)
        p += l
      }
      assert(out.toSeq == pieces, s"$w greedy mismatch: " +
        s"got '$encoded', replay says '${out.mkString(" ")}'")
    }
    // output is the top-150 cut by (cnt desc, word)
    assert(rows.sortBy { case (w, c, _, _) => (-c, w) }.toSeq == rows.toSeq)
  }

  test("gopher rules: injected artifacts trip their rules; keep is the conjunction") {
    val rows = q("q_quality_gopher").collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7),
        r.getBoolean(8), r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))
    }.toMap
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(rows.size == nDocs, "one row per doc (map-only, no drops)")
    rows.foreach { case (id, (nw, meanLen, symR, alphaR, stops,
        rWords, rMean, rSym, rAlpha, rStop, keep)) =>
      // injected symbol run ('#' per 4 words) must trip the 0.1 ratio
      if (id % 7 == 0)
        assert(!rSym && symR > 0.1, s"doc $id: symbol rule missed injection")
      else assert(symR == 0.0, s"doc $id: phantom symbols")
      // injected numeric run (a '42' per 3 words) must trip alpha < 0.8
      if (id % 11 == 0)
        assert(!rAlpha && alphaR < 0.8, s"doc $id: alpha rule missed injection")
      // booleans must be exactly the integer-arithmetic forms of the
      // reported ratios/counts
      assert(rWords == (nw >= 50 && nw <= 100000))
      assert(rSym == (symR <= 0.1 + 1e-9))
      assert(rStop == (stops >= 2))
      assert(rMean == (meanLen >= 3.0 - 1e-9 && meanLen <= 10.0 + 1e-9),
        s"doc $id: mean rule / ratio drift ($meanLen)")
      assert(keep == (rWords && rMean && rSym && rAlpha && rStop))
    }
    // the cascade must discriminate on this fixture, not rubber-stamp
    assert(rows.values.exists(_._11) && rows.values.exists(!_._11),
      "gopher cascade keeps everything or drops everything")
  }

  test("gopher required-stop set: default is the paper's list; the " +
      "fixture override is opt-in and scoped") {
    // the production default is Rae et al. arXiv:2112.11446 §A.1.1's
    // English list, verbatim and in the paper's order — a deploy that
    // omits the parameter can never silently inherit the 2-word
    // fixture set (r12 verdict item 5)
    assert(operators.TextAnalysis.GopherRequiredStops ==
      Seq("the", "be", "to", "of", "and", "that", "have", "with"))
    assert(operators.TextAnalysis.GopherFixtureStops == Seq("the", "a"))
    // the override is genuinely fixture-motivated: with the DEFAULT
    // set, the stop rule is dead on this corpus (fires nowhere), which
    // is exactly why the QueryDef opts into the fixture set
    import org.apache.spark.sql.functions._
    val aug = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text").as("gtext"))
    val withDefault = operators.TextAnalysis.gopherCascade(aug)
    assert(withDefault.where(col("r_stop_words")).count() == 0,
      "paper list unexpectedly fires on the fixture corpus — " +
        "the QueryDef override may no longer be needed")
    val withFixture = operators.TextAnalysis.gopherCascade(
      aug, requiredStops = operators.TextAnalysis.GopherFixtureStops)
    assert(withFixture.where(col("r_stop_words")).count() > 0)
  }
}
