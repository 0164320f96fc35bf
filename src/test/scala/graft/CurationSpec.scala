package graft

import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("data split: complete, disjoint, ~90/5/5, and replay-stable") {
    val rows = q("q_data_split").collect()
    val total = sources.Tables.documents(spark, sf).count()
    assert(rows.length == total, "every doc gets exactly one subset")
    val frac = rows.groupBy(_.getString(2)).view.mapValues(_.length.toDouble / total)
    assert(frac.keySet.subsetOf(Set("train", "val", "test")))
    // md5 buckets are uniform; at 500 docs allow generous sampling slack
    assert(math.abs(frac("train") - 0.90) < 0.06, s"train frac ${frac("train")}")
    assert(frac.getOrElse("val", 0.0) < 0.12 && frac.getOrElse("test", 0.0) < 0.12)
    // replay-stable: assignment is a pure function of doc_id
    val again = q("q_data_split").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).toSeq)
  }

  test("domain mixture: rates follow the recipe, kept counts bounded, replay-stable") {
    val rows = q("q_mix_domains").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // recompute the recipe's expected rate from the per-source counts
    // and pin the query's target_rate against it (6dp, as emitted)
    val total = rows.map(_._2).sum
    val wgt = rows.map { case (src, _, _, _) => src -> (src.drop(3).toLong % 4 + 1) }.toMap
    val sumw = wgt.values.sum
    rows.foreach { case (src, nDocs, nKept, rate) =>
      val expect = math.min(1.0, total.toDouble * 0.5 * wgt(src) / sumw / nDocs)
      assert(math.abs(rate - expect) < 5e-7, s"$src rate $rate != $expect")
      assert(nKept <= nDocs)
      // the 16-bit md5 bucket is uniform: realized kept-count sits near
      // rate·n (binomial-style slack, generous for tiny sf strata)
      val slack = math.max(4.0, 4 * math.sqrt(rate * nDocs))
      assert(math.abs(nKept - rate * nDocs) <= slack,
        s"$src kept $nKept far from ${rate * nDocs}")
    }
    // membership is a pure function of (doc_id, recipe)
    val again = q("q_mix_domains").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("dataset card: totals consistent with the corpus, dup and lang counts sane") {
    val rows = q("q_dataset_card").collect()
    val docs = sources.Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count(), "cards cover the corpus")
    rows.foreach { r =>
      val (nDocs, nDups, nLangs) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDups >= 0 && nDups < nDocs)
      assert(nLangs >= 1 && nLangs <= nDocs)
      assert(r.getLong(6) <= r.getLong(7), "min_tokens <= max_tokens")
    }
  }

  test("sequence packing: packs are contiguous and bounded by budget + longest doc") {
    val docs = sources.Tables.documents(spark, sf)
    val maxDoc = docs
      .select(size(functions.TextFns.tokens(col("text"))).cast("long").as("n"))
      .agg(max(col("n"))).first().getLong(0)
    val packs = q("q_pack_sequences").collect()
    assert(packs.nonEmpty)
    assert(packs.map(_.getLong(2)).sum == docs.count(), "every doc lands in one pack")
    packs.foreach { r =>
      assert(r.getLong(3) < 2048L + maxDoc,
        s"pack ${r.getLong(0)}/${r.getLong(1)} holds ${r.getLong(3)} tokens")
    }
    // within a shard, pack ids are dense from 0 and doc ranges never overlap
    packs.groupBy(_.getLong(0)).foreach { case (_, ps) =>
      val sorted = ps.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq)
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(0).getLong(5) < pair(1).getLong(4),
          "doc ranges of consecutive packs must not overlap")
      }
    }
  }

  test("curation pipeline: subsets partition the kept docs, quality floor holds") {
    val rows = q("q_pipeline_curation").collect()
    assert(rows.nonEmpty && rows.map(_.getString(0)).toSet.subsetOf(
      Set("train", "val", "test")))
    val total = sources.Tables.documents(spark, sf).count()
    val kept = rows.map(_.getLong(1)).sum
    assert(kept > 0 && kept < total,
      s"pipeline must filter something: kept $kept of $total")
    rows.foreach { r =>
      // every survivor passed the 0.31 quality cut, so subset means hold it
      assert(r.getDouble(3) >= 0.31 && r.getDouble(3) <= 1.0,
        s"${r.getString(0)} avg_quality ${r.getDouble(3)}")
    }
  }

  test("pack materialization agrees with the assignment summary, payloads replay-stable") {
    val summary = q("q_pack_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val mat = q("q_pack_materialize").collect()
    assert(mat.map(r => (r.getLong(0), r.getLong(1))).toSet == summary.keySet)
    mat.foreach { r =>
      assert(summary((r.getLong(0), r.getLong(1))) == ((r.getLong(2), r.getLong(3))))
    }
    val again = q("q_pack_materialize").collect().map(_.getString(4)).toSeq
    assert(mat.map(_.getString(4)).toSeq == again,
      "payload md5s must be deterministic across runs")
  }

  test("chunking: stride-48 windows cover every token, ids dense, sizes bounded") {
    val docs = sources.Tables.documents(spark, sf)
    val nToks = docs
      .select(col("doc_id"),
        size(functions.TextFns.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = q("q_chunk_documents").collect()
    val expected = nToks.values.map(n => (n + 47) / 48).sum
    assert(rows.length.toLong == expected, "one chunk per stride window")
    rows.groupBy(_.getLong(0)).foreach { case (doc, cs) =>
      val sorted = cs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq ==
        (0L until sorted.length).toSeq, s"doc $doc chunk ids not dense")
      sorted.foreach { c =>
        val sz = c.getLong(2)
        assert(sz >= 1 && sz <= 64, s"doc $doc chunk ${c.getLong(1)} size $sz")
      }
      // every chunk except trailing partials is exactly 64 tokens; the
      // window starting before n-64 must be full
      sorted.foreach { c =>
        if (c.getLong(1) * 48 + 64 <= nToks(doc))
          assert(c.getLong(2) == 64)
      }
    }
  }

  test("outlier trim: bounds bracket the median, kept is a strict majority") {
    val rows = q("q_filter_outliers").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, lo, hi, kept) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(lo < hi, s"${r.getString(0)} bounds inverted")
      assert(kept <= total)
      // Tukey fences keep at least the inner two quartiles by construction
      assert(kept >= total / 2,
        s"${r.getString(0)} kept only $kept of $total")
    }
  }

  test("weighted sample: exactly k per source, set matches first-principles A-Res") {
    val rows = q("q_sample_weighted").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val perSrc = rows.groupBy(_._1)
    assert(perSrc.nonEmpty && perSrc.values.forall(_.length == 10),
      "every source contributes exactly k=10 docs")
    // recompute the exponential keys from scratch (MessageDigest md5,
    // same salt) and confirm the query picked exactly the k smallest
    // (rounded-key, doc_id) per source
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(docId: Long, w: Long): BigDecimal = {
      val hex = md.digest(s"wrs:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967296.0
      BigDecimal(-math.log(u) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val docs = sources.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val expect = ds.map { case (_, id, w) => (key(id, w), id) }
        .sorted.take(10).map(_._2).toSet
      assert(perSrc(src).map(_._2).toSet == expect,
        s"$src sample diverges from first-principles selection")
    }
  }

  test("drift PSI: recomputed from raw docs per source, batches partition the corpus") {
    val rows = q("q_drift_psi").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    val md = java.security.MessageDigest.getInstance("MD5")
    def batchOf(docId: Long): Int = {
      val hex = md.digest(s"drift:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      (java.lang.Integer.parseInt(hex, 16) % 2)
    }
    val docs = sources.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (src, nA, nB, psi, drifted) =>
      val ds = docs.filter(_._1 == src)
      assert(nA + nB == ds.length, s"$src batches must partition the source")
      val bins = ds.map { case (_, id, nc) =>
        (batchOf(id), math.min(nc / 100, 5L)) }
      val terms = (0L to 5L).map { b =>
        val ca = bins.count(x => x._1 == 0 && x._2 == b)
        val cb = bins.count(x => x._1 == 1 && x._2 == b)
        val pa = (ca + 1.0) / (nA + 6); val pb = (cb + 1.0) / (nB + 6)
        math.round((pa - pb) * math.log(pa / pb) * 1e9)
      }
      val expect = BigDecimal(terms.sum / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(psi - expect) < 2e-6, s"$src psi $psi != $expect")
      assert(drifted == (psi >= 0.1), s"$src flag inconsistent at psi=$psi")
    }
  }

  test("stratified sample: every stratum lands near the smallest stratum's size") {
    val rows = q("q_sample_stratified").collect()
    assert(rows.nonEmpty)
    val target = rows.map(_.getLong(1)).min // n_total of the smallest stratum
    rows.foreach { r =>
      val (tpe, total, sampled) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(sampled <= total, s"$tpe sampled $sampled of $total")
      // 16-bit hash granularity: allow 25% relative + small absolute slack
      assert(math.abs(sampled - target) <= math.max(8L, (target * 0.25).toLong),
        s"$tpe sampled $sampled, want ~$target")
    }
  }

  test("interleave: reproducible round-robin, no contiguous same-source run") {
    val rows = q("q_interleave").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val n = sources.Tables.documents(spark, sf).count()
    assert(rows.length == n.toInt, "every doc ordered")
    // pos values are distinct (a strict total order over the feed)
    assert(rows.map(_._4).distinct.length == rows.length, "pos unique")
    // emitted in pos order and no two ADJACENT rows share a source
    // (sources are balanced in this fixture, so perfect round-robin)
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.toSeq)
    rows.sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0)._2 != w(1)._2,
          s"adjacent rows both from ${w(0)._2} at pos ${w(1)._4}")
    }
    // position replays from (rank within source, source index)
    val nSrc = rows.map(_._2).distinct.length
    // source index = 1-based rank of the source name (JOIN-rank)
    val srcRank = rows.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    rows.groupBy(_._2).foreach { case (src, g) =>
      val si = srcRank(src)
      g.sortBy(_._1).zipWithIndex.foreach { case ((_, _, r, pos), i) =>
        assert(r == i + 1, s"$src rank")
        assert(pos == i.toLong * nSrc + si, s"$src pos formula")
      }
    }
  }

  test("budget selection: greedy-by-quality prefix per source, budget binds") {
    val rows = q("q_select_budget").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val nDocs = sources.Tables.documents(spark, sf).count()
    assert(rows.length < nDocs, "the budget must actually prune")
    rows.groupBy(_._1).foreach { case (src, g) =>
      val sel = g.sortBy(_._5)
      // cumsum consistent and within budget
      var cum = 0L
      sel.foreach { case (_, _, _, nt, ct) =>
        cum += nt
        assert(ct == cum, s"$src cumsum mismatch")
        assert(ct <= 800L, s"$src over budget")
      }
      // the selected rows form one contiguous rank-prefix: their token
      // counts sum exactly to the last cumsum (no gaps in the window)
      assert(sel.map(_._4).sum == sel.last._5, "prefix property")
    }
    // quality ordering within each source: q non-increasing along the
    // selection order
    rows.groupBy(_._1).foreach { case (src, g) =>
      val qs = g.sortBy(_._5).map(_._3)
      qs.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0) >= w(1), s"$src selection not in quality order")
      }
    }
  }

  test("dsir: full top-100 replays from first principles; shifts toward target") {
    val rows = q("q_select_dsir").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getLong(4)))
    assert(rows.length == 100)
    // keys descend under the emitted order
    assert(rows.map(_._4).sliding(2).forall(p => p(0) >= p(1)),
      "selection must be emitted in key order")

    // ---- first-principles replay: md5 buckets, two histograms,
    // micro-int log-ratios, Gumbel keys, global top-100 ----
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val words = docs.flatMap { case (id, lang, text) =>
      text.toLowerCase.split(" ", -1).map(w =>
        (id, lang, java.lang.Long.parseLong(md5hex(w).take(4), 16) % 64))
    }
    val rcnt = words.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val tcnt = words.filter(_._2 == "en")
      .groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val (rTot, tTot) = (words.length.toLong,
      words.count(_._2 == "en").toLong)
    val dl = rcnt.keys.map { b =>
      b -> (math.round(math.log(
        (tcnt.getOrElse(b, 0L) + 1.0) / (tTot + 64.0)) * 1e6) -
        math.round(math.log((rcnt(b) + 1.0) / (rTot + 64.0)) * 1e6))
    }.toMap
    val keyed = words.groupBy(_._1).map { case (id, ws) =>
      val score = ws.groupBy(_._3).map { case (b, g) =>
        g.length * dl(b) }.sum
      val h = java.lang.Long.parseLong(md5hex(s"dsir:$id").take(8), 16)
      val u = (h + 0.5) / 4294967296.0
      val g = math.round(-math.log(-math.log(u)) * 1e6)
      (id, score, score + g)
    }.toSeq
    val expect = keyed.sortBy { case (id, _, k) => (-k, id) }.take(100)
    assert(rows.map(r => (r._1, r._4)).toSeq ==
      expect.map { case (id, _, k) => (id, k) },
      "DSIR top-100 (ids and keys) must replay exactly")
    expect.zip(rows).foreach { case ((_, score, _), (_, _, logw, _)) =>
      val want = BigDecimal(score.toDouble / 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(logw - want) < 1e-9, "logw must replay")
    }

    // ---- the method's point: selection shifts toward the target ----
    val corpusEn = docs.count(_._2 == "en").toDouble / docs.length
    val selectedEn = rows.count(_._2 == "en").toDouble / rows.length
    assert(selectedEn > corpusEn,
      s"DSIR must over-sample target-like docs " +
        s"(selected en $selectedEn vs corpus $corpusEn)")
  }

  test("negative sampling: per-slot bijection, never self, replays from positions") {
    val rows = q("q_sample_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val vecs = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val n = vecs.length
    assert(rows.length == n * 4, "every anchor gets exactly 4 slots")
    rows.foreach { case (a, _, al, nid, nl, valid) =>
      assert(nid != a, s"anchor $a drew itself")
      assert(valid == (al != nl), s"anchor $a validity flag wrong")
    }
    // each slot is a rotation: every doc serves as a negative exactly
    // once per slot (balanced load)
    rows.groupBy(_._2).foreach { case (slot, g) =>
      assert(g.map(_._4).distinct.length == n,
        s"slot $slot is not a bijection")
    }
    // replay from first principles: positions by sorted vec_id,
    // shifts from the same md5 derivation
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sorted = vecs.sortBy(_._1)
    val posOf = sorted.map(_._1).zipWithIndex.toMap
    val atPos = sorted.map(_._1)
    val labelOf = vecs.toMap
    val shifts = (0 until 4).map(i =>
      1L + java.lang.Long.parseLong(md5hex(s"negshift:$i").take(8), 16)
        % (n - 1))
    val expect = sorted.flatMap { case (a, al) =>
      shifts.zipWithIndex.map { case (sh, i) =>
        val nid = atPos(((posOf(a) + sh) % n).toInt)
        (a, i.toLong, al, nid, labelOf(nid), al != labelOf(nid))
      }
    }
    assert(rows.toSeq == expect.toSeq, "negatives must replay from positions")
  }

  test("temperature mix: sqrt-damping holds; rates and kept sets replay") {
    val rows = q("q_mix_temperature").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = docs.length.toLong
    val wMicro = byLang.view
      .mapValues(n => math.round(math.sqrt(n.toDouble) * 1e9)).toMap
    val sumw = wMicro.values.sum
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { case (lang, n, natShare, tempShare, nKept, rate) =>
      assert(n == byLang(lang))
      assert(natShare == r6(n.toDouble / total))
      assert(tempShare == r6(wMicro(lang).toDouble / sumw))
      val wantRate = math.min(1.0,
        0.5 * total.toDouble * wMicro(lang).toDouble / sumw / n)
      assert(rate == r6(wantRate), s"$lang rate")
      // the α-rule's point: damp above-average langs, boost below
      if (natShare > tempShare + 1e-9)
        assert(n.toDouble / total > 1.0 / byLang.size,
          s"$lang damped but not high-resource")
      // kept set replays point-wise from the md5 draw
      val expectKept = docs.filter(_._2 == lang).count { case (id, _) =>
        java.lang.Long.parseLong(md5hex(s"temp:$id").take(4), 16) <
          wantRate * 65536.0
      }
      assert(nKept == expectKept.toLong, s"$lang kept count")
    }
    // shares are both distributions
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
  }

  test("epoch plan: replays from doc token counts; needed tokens sum to the budget") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = sources.Tables.documents(spark, sf)
      .select(col("source"), lower(col("text"))).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val bySrc = docs.groupBy(_._1).map { case (src, xs) =>
      src -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val totalTok = bySrc.values.map(_._2).sum
    val sumw = bySrc.values
      .map(v => math.round(math.sqrt(v._2.toDouble) * 1e9)).sum
    val rows = q("q_mix_epochs").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6)))
    assert(rows.map(_._1).toSet == bySrc.keySet)
    rows.foreach { case (src, nd, nt, nat, tgt, ep, cap) =>
      val (ed, et) = bySrc(src)
      assert(nd == ed && nt == et, s"$src counts")
      val w = math.round(math.sqrt(et.toDouble) * 1e9)
      assert(nat == r6(et.toDouble / totalTok), s"$src natural share")
      assert(tgt == r6(w.toDouble / sumw), s"$src target share")
      assert(ep == r6((totalTok * 2).toDouble * w / sumw / et), s"$src epochs")
      assert(cap == (ep > 4.0), s"$src over_cap")
      assert(ep > 0.0)
    }
    // the plan spends exactly the budget: Σ needed = Σ epochs·available
    // = 2× the corpus (up to the 6-dp rounding of each term)
    val spent = rows.map(r => r._6 * r._3).sum // epochs × tokens, scaled
    val needed = rows.map(r => r._6 * bySrc(r._1)._2).sum
    assert(math.abs(needed - 2.0 * totalTok) < 1e-3 * totalTok,
      s"plan spends $needed of ${2L * totalTok}")
    assert(spent > 0)
    // temperature damping: the largest source's epochs < the smallest's
    val maxSrc = rows.maxBy(r => r._3)
    val minSrc = rows.minBy(r => r._3)
    assert(maxSrc._6 < minSrc._6,
      "sqrt-damping must repeat small sources more than large ones")
  }

  test("k-anonymity: lattice levels replay; coarsening shrinks the risk") {
    val qi = sources.Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def audit[K](key: ((Long, String, Long)) => K): (Long, Long, Long, Long) = {
      val sizes = qi.groupBy(key).values.map(_.length.toLong)
      (sizes.size.toLong, sizes.count(_ < 5).toLong,
        sizes.filter(_ < 5).sum, sizes.min)
    }
    val expect = Map(
      "nation+segment+band" -> audit(identity),
      "nation+segment" -> audit(t => (t._1, t._2)),
      "nation" -> audit(_._1))
    val got = q("q_privacy_kanon").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expect, "lattice audit must replay from first principles")
    // coarsening merges classes: a row at risk at a coarse level is at
    // risk at every finer level, so rows_at_risk is monotone down the
    // lattice and class sizes only grow
    val fine = got("nation+segment+band")
    val mid = got("nation+segment")
    val coarse = got("nation")
    assert(fine._3 >= mid._3 && mid._3 >= coarse._3,
      "rows_at_risk must shrink as QI generalizes")
    assert(fine._4 <= mid._4 && mid._4 <= coarse._4,
      "min class size must grow as QI generalizes")
    assert(fine._1 >= mid._1 && mid._1 >= coarse._1,
      "class count must shrink as QI generalizes")
  }

  test("dp release: keyed Laplace draws replay; noise is two-sided and ledgered") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val grid = sources.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val releases = grid.keys.groupBy(_._1).map { case (t, g) => t -> g.size.toLong }
    def r(x: Double, dp: Int): Double =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = grid.toSeq.map { case ((typ, day), n) =>
      val u48 = java.lang.Long.parseLong(
        md5hex(s"dp:$typ:$day").take(12), 16)
      val t = (u48 + 0.5) / 281474976710656.0 - 0.5
      val noise = -2.0 * (if (t < 0) -1.0 else 1.0) * math.log(1.0 - 2.0 * math.abs(t))
      (typ, day, n, r(n.toDouble + noise, 6),
        releases(typ), r(releases(typ).toDouble * 0.5, 2))
    }.sortBy(t => (t._1, t._2))
    val rows = q("q_privacy_dp").collect()
      .map(row => (row.getString(0), row.getString(1), row.getLong(2),
        row.getDouble(3), row.getLong(4), row.getDouble(5))).toSeq
    assert(rows.nonEmpty && rows == expect)
    // the draw must actually perturb (noise ~never exactly 0) and be
    // two-sided; the ledger must count every released cell once
    assert(rows.forall(row => row._4 != row._3.toDouble))
    assert(rows.exists(row => row._4 > row._3) &&
      rows.exists(row => row._4 < row._3),
      "Laplace noise must land on both sides across the grid")
    assert(rows.map(_._1).distinct.map(t => releases(t)).sum == rows.length)
  }

  test("bradley-terry fit recovers the latent skill order") {
    val rows = q("q_pref_bradleyterry").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val n = rows.length
    // every item compared against every other exactly once
    assert(rows.forall(_._4 == n - 1))
    assert(rows.map(_._3).sum == n.toLong * (n - 1) / 2, "total wins == total pairs")
    // ratings are zero-sum up to micro rounding (gradient pairs cancel)
    assert(math.abs(rows.map(_._2).sum) < 1e-3, "BT ratings must be ~zero-sum")
    // the fit must recover the latent skill q = ln(n_chars/100):
    // Spearman rank correlation between rating and latent skill
    val latent = sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 64)
      .select(col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ranks(xs: Seq[(Long, Double)]): Map[Long, Double] =
      xs.sortBy(_._2).zipWithIndex.map { case ((id, _), i) => id -> i.toDouble }.toMap
    val rr = ranks(rows.map(r => (r._1, r._2)).toSeq)
    val lr = ranks(rows.map(r => (r._1, latent(r._1).toDouble)).toSeq)
    val d2 = rows.map(r => math.pow(rr(r._1) - lr(r._1), 2)).sum
    val rho = 1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n - 1))
    assert(rho > 0.6, s"BT ratings must track latent skill (spearman=$rho)")
    // and ratings must track the observed win counts even more tightly
    val wr = ranks(rows.map(r => (r._1, r._3.toDouble)).toSeq)
    val d2w = rows.map(r => math.pow(rr(r._1) - wr(r._1), 2)).sum
    val rhoW = 1.0 - 6.0 * d2w / (n.toDouble * (n.toDouble * n - 1))
    assert(rhoW > 0.9, s"BT ratings must track win counts (spearman=$rhoW)")
  }

  test("pii scrub: counts match the injection arithmetic; redacted text is actually clean") {
    val rows = q("q_curate_pii").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, ne, np, nip, _, clean) =>
      assert(ne == 1, s"doc $id: exactly one injected email, got $ne")
      assert(np == (if (id % 3 == 0) 1 else 0), s"doc $id phone count $np")
      assert(nip == (if (id % 5 == 0) 1 else 0), s"doc $id ip count $nip")
      assert(!clean, s"doc $id carries PII by construction")
    }
    // the redaction really scrubs: rebuild the redacted text the same
    // way the query does and prove a fresh scan finds ZERO matches and
    // the md5 agrees with the reported one
    import org.apache.spark.sql.functions._
    val emailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
    val phoneRe = """\b555-[0-9]{4}\b"""
    val ipRe = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""
    val aug = sources.Tables.documents(spark, sf).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" call 555-"), lit(1000) + col("doc_id") % 9000))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" from 10."), col("doc_id") % 256, lit("."),
            (col("doc_id") / 7).cast("long") % 256, lit("."),
            col("doc_id") % 254 + 1))
          .otherwise(lit(""))).as("pii_text"))
    val audit = aug.select(col("doc_id"),
        regexp_replace(regexp_replace(regexp_replace(col("pii_text"),
          lit(emailRe), lit("<EMAIL>")),
          lit(phoneRe), lit("<PHONE>")),
          lit(ipRe), lit("<IP>")).as("red"))
      .select(col("doc_id"), md5(col("red")).as("h"),
        (regexp_count(col("red"), lit(emailRe)) +
          regexp_count(col("red"), lit(phoneRe)) +
          regexp_count(col("red"), lit(ipRe))).as("residual"),
        col("red").contains("<EMAIL>").as("has_tok"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getBoolean(3))).toMap
    rows.foreach { case (id, _, _, _, h, _) =>
      val (h2, residual, hasTok) = audit(id)
      assert(h2 == h, s"doc $id: reported redacted_md5 drifted")
      assert(residual == 0, s"doc $id: redacted text still matches a PII pattern")
      assert(hasTok, s"doc $id: placeholder missing after redaction")
    }
  }

  test("domain curation: blocklist enforced, tracking paths dropped, cap + rank shape") {
    val rows = q("q_curate_domains").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val blocked = Set("site13", "site26", "site39")
    rows.foreach { case (id, domain, _, _) =>
      assert(!blocked.contains(domain.takeWhile(_ != '.')),
        s"doc $id: blocklisted domain $domain survived")
      assert(id % 11 != 0, s"doc $id: /track/ path survived the filter")
      // registered domain = name + public suffix under the FULL PSL
      // semantics (r13 verdict item 5): normal suffixes up to 3 labels
      // (act.edu.au), wildcard *.ck (the registrable key KEEPS the
      // subdomain — site7.ck is itself a public suffix), exception
      // !www.ck (www.ck is registrable outright)
      assert(domain.matches(
        "(bigportal|site[0-9]+)\\.(com|org|net|io|co\\.uk|com\\.au|edu\\.au|act\\.edu\\.au)" +
          "|(www|blog|cdn)\\.(bigportal|site[0-9]+)\\.ck" +
          "|www\\.ck"),
        s"bad registered domain $domain")
      // the www/blog/cdn subdomain never keys a NORMAL-suffix domain
      // (the ck family is the PSL-mandated exception to this)
      if (!domain.endsWith(".ck"))
        assert(!Set("www", "blog", "cdn").contains(domain.takeWhile(_ != '.')),
          s"subdomain leaked into the curation key: $domain")
    }
    // multi-label public suffixes are actually exercised AND parsed as
    // suffixes (site7.co.uk, not co.uk or site7.co)
    assert(rows.exists(_._2.endsWith(".co.uk")), "no co.uk rows in fixture")
    assert(rows.exists(_._2.endsWith(".com.au")), "no com.au rows in fixture")
    assert(!rows.exists(r => r._2 == "co.uk" || r._2 == "com.au"),
      "bare public suffix keyed as a domain")
    assert(!rows.exists(_._2.matches("[a-z0-9]+\\.co")),
      "two-label regex parse leaked (x.co instead of x.co.uk)")
    // r13 item 5's new rule classes, each exercised and parsed right:
    // LONGEST match wins the au chain (siteN.act.edu.au, never
    // siteN.edu.au for an act.edu.au host — and 2-label edu.au hosts
    // still parse at their own depth)
    assert(rows.exists(_._2.matches("(bigportal|site[0-9]+)\\.act\\.edu\\.au")),
      "no act.edu.au rows in fixture")
    assert(rows.exists(_._2.matches("(bigportal|site[0-9]+)\\.edu\\.au")),
      "no plain edu.au rows in fixture")
    assert(!rows.exists(_._2.matches("(act|edu)\\.edu\\.au|edu\\.au|act\\.edu\\.au")),
      "public-suffix tail of the au chain keyed as a domain")
    // wildcard *.ck: registrable = subdomain + site + ck; a bare
    // site7.ck (the wildcard public suffix itself) must never key
    assert(rows.exists(_._2.matches("(www|blog|cdn)\\.(bigportal|site[0-9]+)\\.ck")),
      "no wildcard *.ck rows in fixture")
    assert(!rows.exists(_._2.matches("(bigportal|site[0-9]+)\\.ck")),
      "wildcard public suffix site<k>.ck keyed as a domain")
    // exception !www.ck: hosts under www.ck collapse to exactly www.ck
    assert(rows.exists(_._2 == "www.ck"), "no !www.ck exception rows")
    // the hot portal is present and capped like everyone else
    assert(rows.exists(_._2.startsWith("bigportal.")))
    rows.groupBy(_._2).foreach { case (domain, grp) =>
      assert(grp.length <= 20, s"$domain exceeds the per-domain cap")
      // rank contiguous from 1, scores non-increasing along it
      val byRank = grp.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to grp.length).toSeq,
        s"$domain ranks not contiguous")
      assert(byRank.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
        s"$domain scores not non-increasing by rank")
    }
  }

  test("psl parse: exception > longest match > wildcard > default, suffix-only hosts null") {
    // table-driven contract for operators.Curation.pslRegisteredDomain
    // (r13 verdict item 5) — publicsuffix.org's own algorithm examples
    // adapted to the fixture rule list
    import operators.Curation
    val cases = Seq(
      "shop.example.co.uk"   -> Some("example.co.uk"),   // 2-label rule
      "x.site1.act.edu.au"   -> Some("site1.act.edu.au"),// 3-label rule wins over edu.au/au
      "a.b.edu.au"           -> Some("b.edu.au"),        // 2-label au chain
      "b.edu.au"             -> Some("b.edu.au"),
      "edu.au"               -> None,                    // host IS a public suffix
      "act.edu.au"           -> None,
      "foo.bar.ck"           -> Some("foo.bar.ck"),      // *.ck: bar.ck is the suffix
      "site7.ck"             -> None,                    // wildcard public suffix itself
      "ck"                   -> None,
      "www.ck"               -> Some("www.ck"),          // !www.ck exception
      "deep.www.ck"          -> Some("www.ck"),
      "foo.unknowntld"       -> Some("foo.unknowntld"),  // prevailing '*' default
      "unknowntld"           -> None)
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._1)))
      .toDF("host")
      .select(col("host"), Curation.pslRegisteredDomain(col("host")).as("d"))
    val got = df.collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
    }
  }

  test("url dedup: variants conserved, canonical form clean, groups match the key space") {
    val rows = q("q_dedup_url").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(rows.map(_._3).sum == docs.length, "every doc lands in exactly one group")
    // a doc keeps '?page=2' iff its fixture query was the MIXED form
    // (page + tracking) — the tracking half must be gone either way
    val keepsPage = (id: Long) => id % 4 != 0 && id % 9 == 0
    rows.foreach { case (canon, keeper, n) =>
      assert(n >= 1)
      // fully normalized: https, no www, no tracking params, no
      // fragment, no trailing slash; the kept non-tracking param
      // survives
      assert(canon.matches("https://host[0-9]+\\.com/p/[0-9]+(\\?page=2)?"),
        s"canonical url not normalized: $canon")
      val page = if (keepsPage(keeper)) "?page=2" else ""
      // keeper reproduces the canonical form under the fixture derivation
      assert(canon ==
        s"https://host${keeper % 20}.com/p/${(keeper / 7) % 13}$page",
        s"keeper $keeper does not derive $canon")
    }
    // group count equals the fixture's canonical key space actually hit:
    // variants differing only in scheme/www/tracking/fragment/slash MERGED
    val keyOf = (id: Long) => (id % 20, (id / 7) % 13, keepsPage(id))
    val expected = docs.map(keyOf).distinct.length
    assert(rows.length == expected,
      s"${rows.length} canonical groups != $expected distinct keys")
    val minByKey = docs.groupBy(keyOf).view.mapValues(_.min).toMap
    rows.foreach { case (_, keeper, _) =>
      assert(minByKey(keyOf(keeper)) == keeper, s"keeper $keeper is not the group min")
    }
  }
}
