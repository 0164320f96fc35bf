package graft

import org.apache.spark.sql.functions._

/** First-principles replays of the second-stage retrieval operators
  * (Retrieval.scala): the RM3 pseudo-relevance-feedback expansion and
  * the MMR diversification are both recomputed driver-side from the
  * raw fixtures with the exact double-op sequence the Spark plans use,
  * so any drift in join shape, tie-breaks, or float discipline fails
  * the exact comparison — the rank-fusion-spec pattern.
  */
class RetrievalSpec extends SparkSpec {

  private def r(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def micro(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("prf: expanded reranking replays exactly from first principles") {
    val docs = sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(row => row.getLong(0) -> row.getString(1).toLowerCase
        .split(" ").toSeq).toMap
    val isQ = (id: Long) => id % 100 == 0 && id < 5000
    val qTerms = docs.filter { case (id, _) => isQ(id) }
      .map { case (id, ts) => id -> ts.distinct.toSet }
    val corpus = docs.filter { case (id, _) => !isQ(id) }
    val tf = corpus.toSeq.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.size.toLong) }
    }
    val dfm = tf.groupBy(_._2).map { case (t, g) => t -> g.size.toLong }
    val dl = corpus.map { case (id, ts) => id -> ts.size.toLong }
    val n = corpus.size.toLong
    val avgdl = dl.values.sum.toDouble / n
    // the exact Spark association: ((wq·ln)·tf)·2.2 / den, then ·1e9
    def cm(wq: Double, t: String, tfv: Long, dlv: Long): Long = {
      val df = dfm(t)
      micro(wq * math.log(1.0 + ((n.toDouble - df) + 0.5) / (df.toDouble + 0.5)) *
        tfv.toDouble * 2.2 /
        (tfv.toDouble + 1.2 * (0.25 + 0.75 * dlv.toDouble / avgdl)) * 1e9)
    }
    val expected = qTerms.toSeq.flatMap { case (qid, terms) =>
      val s1 = tf.flatMap { case (doc, t, tfv) =>
        if (terms(t)) Some(doc -> cm(1.0, t, tfv, dl(doc))) else None
      }.groupBy(_._1).map { case (doc, g) => doc -> g.map(_._2).sum }
      val fb = s1.toSeq.sortBy { case (doc, sm) => (-sm, doc) }
        .take(5).map(_._1).toSet
      val wm = tf.filter { case (doc, _, _) => fb(doc) }
        .map { case (doc, t, tfv) =>
          t -> micro(tfv.toDouble / dl(doc).toDouble * 1e9) }
        .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
      val exp = wm.toSeq.filter { case (t, _) => !terms(t) }
        .sortBy { case (t, w) => (-w, t) }.take(5).map(_._1)
      val weighted = terms.map(_ -> 1.0).toMap ++ exp.map(_ -> 0.5)
      val s2 = tf.flatMap { case (doc, t, tfv) =>
        weighted.get(t).map(wq => doc -> cm(wq, t, tfv, dl(doc)))
      }.groupBy(_._1).map { case (doc, g) => doc -> g.map(_._2).sum }
      s2.toSeq.sortBy { case (doc, sm) => (-sm, doc) }.take(10)
        .zipWithIndex.map { case ((doc, sm), i) =>
          (qid, (i + 1).toLong, doc, sm, r(sm.toDouble / 1e9, 4)) }
    }.sortBy(t => (t._1, t._2))
    val rows = q("q_rank_prf").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getDouble(4))).toSeq
    assert(rows.nonEmpty && rows == expected)
    // the fixture must actually exercise expansion: some query's final
    // top-10 must differ from its pure-BM25 top-10 (else PRF is a
    // no-op and the test proves nothing about the second pass)
    val plain = qTerms.toSeq.flatMap { case (qid, terms) =>
      val s1 = tf.flatMap { case (doc, t, tfv) =>
        if (terms(t)) Some(doc -> cm(1.0, t, tfv, dl(doc))) else None
      }.groupBy(_._1).map { case (doc, g) => doc -> g.map(_._2).sum }
      s1.toSeq.sortBy { case (doc, sm) => (-sm, doc) }.take(10)
        .zipWithIndex.map { case ((doc, _), i) => (qid, (i + 1).toLong, doc) }
    }.toSet
    assert(rows.exists(row => !plain((row._1, row._2, row._3))),
      "expansion must reorder at least one result")
  }

  test("mmr: greedy diversified selection replays exactly") {
    val embs = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(row => row.getLong(0) ->
        row.getSeq[Float](1).toArray).toMap
    def cos6(a: Array[Float], b: Array[Float]): Double = {
      def fold(xs: Iterator[Double]) = xs.foldLeft(0.0)(_ + _)
      val dot = fold(a.iterator.zip(b.iterator)
        .map { case (x, y) => x.toDouble * y.toDouble })
      val na = fold(a.iterator.map(x => x.toDouble * x.toDouble))
      val nb = fold(b.iterator.map(x => x.toDouble * x.toDouble))
      r(dot / (math.sqrt(na) * math.sqrt(nb)), 6)
    }
    val expected = (0L until 8L).flatMap { qid =>
      val cand = embs.keys.filter(_ != qid).toSeq
        .map(nid => (nid, cos6(embs(qid), embs(nid))))
        .sortBy { case (nid, c) => (-c, nid) }.take(12)
        .map { case (nid, c) => (nid, c, micro(c * 1e6)) }
      val sim = (for ((a, _, _) <- cand; (b, _, _) <- cand if a != b)
        yield (a, b) -> micro(cos6(embs(a), embs(b)) * 1e6)).toMap
      var rem = cand.map { case (nid, c, rel) => (nid, c, rel, -1000000L) }
      (1 to 5).map { rnk =>
        val (pn, pc, _, _) = rem
          .maxBy { case (nid, _, rel, ms) => (7 * rel - 3 * ms, -nid) }
        rem = rem.filter(_._1 != pn).map { case (nid, c, rel, ms) =>
          (nid, c, rel, math.max(ms, sim((nid, pn)))) }
        (qid, rnk.toLong, pn, pc)
      }
    }
    val rows = q("q_rank_mmr").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2),
        row.getDouble(3))).toSeq
    assert(rows.nonEmpty && rows == expected)
    // diversification must bite somewhere: some query's MMR picks
    // differ from its plain relevance top-5
    val plainTop5 = (0L until 8L).flatMap { qid =>
      embs.keys.filter(_ != qid).toSeq
        .map(nid => (nid, cos6(embs(qid), embs(nid))))
        .sortBy { case (nid, c) => (-c, nid) }.take(5)
        .map { case (nid, _) => (qid, nid) }
    }.toSet
    assert(rows.exists(row => !plainTop5((row._1, row._3))),
      "fixture must exercise diversification")
  }
}
