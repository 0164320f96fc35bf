package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall of every approximate dedup/ANN operator against its exact
  * counterpart, as data rather than just a spec gate: `Bench` stamps
  * these into the bench artifact so recall/cost trades (e.g. IVF probe
  * counts, LSH band shape) are tracked round-over-round, and LlmOpsSpec
  * asserts its floors over the same computation.
  *
  * All sets are collected pair sets — the exact references are small
  * (near-dup pairs / strong-similarity pairs), so driver-side set math
  * is the right tool; the queries themselves stay distributed.
  */
object Recall {

  case class Entry(name: String, recall: Double, exactPairs: Long)

  private def pairSet(s: SparkSession, dir: String, query: String,
                      a: String, b: String): Set[(Long, Long)] =
    Registry.byName(query).fn(s, dir).select(col(a), col(b))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** recall of `found` over `exact`, orientation-insensitive; vacuously
    * 1.0 when there is nothing to find */
  private def recallOf(exact: Set[(Long, Long)],
                       found: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0
    else exact.count { case (a, b) =>
      found.contains((a, b)) || found.contains((b, a))
    }.toDouble / exact.size

  /** Every approximate operator scored against its exact reference:
    * minhash + simhash vs the exact n-gram Jaccard pairs, ANN + IVF +
    * embedding-LSH vs the brute-force cosine pairs. */
  def compute(s: SparkSession, dir: String): Seq[Entry] = {
    // one run of the exact-pair query serves both reference sets (all
    // pairs, and the strong >= 0.9 subset for simhash) — collecting
    // twice would re-execute the whole pair derivation
    val ngramRows = Registry.byName("q_dedup_ngram").fn(s, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ngram = ngramRows.map(t => (t._1, t._2)).toSet
    val nearNgram = ngramRows.filter(_._3 >= 0.9).map(t => (t._1, t._2)).toSet
    val cosine = pairSet(s, dir, "q_dedup_embedding", "vec_a", "vec_b")
    Seq(
      Entry("minhash", recallOf(ngram,
        pairSet(s, dir, "q_dedup_minhash", "doc_a", "doc_b")), ngram.size),
      Entry("simhash", recallOf(nearNgram,
        pairSet(s, dir, "q_dedup_simhash", "doc_a", "doc_b")), nearNgram.size),
      Entry("embedding_lsh", recallOf(cosine,
        pairSet(s, dir, "q_dedup_embedding_lsh", "vec_a", "vec_b")), cosine.size),
      Entry("ann", recallOf(cosine,
        pairSet(s, dir, "q_similarity_ann", "qid", "nid")), cosine.size),
      Entry("ivf", recallOf(cosine,
        pairSet(s, dir, "q_similarity_ivf", "qid", "nid")), cosine.size))
  }
}
