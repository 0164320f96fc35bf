package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *
  * Truth-op scale contract (r11): above `Dedup.EmbedAnchorCap` the
  * exact cosine reference (`q_dedup_embedding`) contains only pairs
  * touching a deterministic hash-chosen anchor set — O(cap·n), not
  * n²/2 — so the recalls graded against it become unbiased
  * anchored-subset estimates. Every gate/bench corpus sits at or under
  * the cap (sf0.1 = 2000 vectors), where the reference is the full
  * pair set and all stamps are bit-identical to the unbounded form.
  */
object Recall {

  case class Entry(name: String, recall: Double, exactPairs: Long)

  /** The queries whose results feed the recall computation. `Bench`
    * dumps exactly these to parquet during its warm-up pass so the
    * recall report reads the already-executed results instead of
    * running each input a third time (they are the expensive dedup/ANN
    * tail — ~2-3.5 s apiece at sf0.1). */
  val inputs: Set[String] = Set(
    "q_dedup_ngram", "q_dedup_embedding", "q_dedup_minhash",
    "q_dedup_simhash", "q_dedup_embedding_lsh",
    "q_similarity_ann", "q_similarity_ivf", "q_dedup_semantic",
    "q_similarity_pqadc", "q_similarity_ivfadc", "q_similarity_topk")

  /** A recall input: the caller's parquet dump when one exists (same
    * deterministic query, already executed), else a fresh run. */
  private def resultOf(s: SparkSession, dir: String, query: String,
                       dumps: Option[String]): DataFrame =
    dumps.map(d => java.nio.file.Paths.get(d, query))
      .filter(p => java.nio.file.Files.exists(p))
      .map(p => s.read.parquet(p.toString))
      .getOrElse(Registry.byName(query).fn(s, dir))

  private def pairSet(s: SparkSession, dir: String, query: String,
                      a: String, b: String,
                      dumps: Option[String]): Set[(Long, Long)] =
    resultOf(s, dir, query, dumps).select(col(a), col(b))
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
  def compute(s: SparkSession, dir: String,
              dumps: Option[String] = None): Seq[Entry] = {
    // one run of the exact-pair query serves both reference sets (all
    // pairs, and the strong >= 0.9 subset for simhash) — collecting
    // twice would re-execute the whole pair derivation
    val ngramRows = resultOf(s, dir, "q_dedup_ngram", dumps)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ngram = ngramRows.map(t => (t._1, t._2)).toSet
    val nearNgram = ngramRows.filter(_._3 >= 0.9).map(t => (t._1, t._2)).toSet
    val cosine = pairSet(s, dir, "q_dedup_embedding", "vec_a", "vec_b", dumps)
    // the three embedding-space found-sets serve BOTH the truth-set
    // recalls below and the planted-tier stamps (plantedEntries)
    val lshFound = pairSet(s, dir, "q_dedup_embedding_lsh", "vec_a", "vec_b", dumps)
    val annFound = pairSet(s, dir, "q_similarity_ann", "qid", "nid", dumps)
    val ivfFound = pairSet(s, dir, "q_similarity_ivf", "qid", "nid", dumps)
    Seq(
      Entry("minhash", recallOf(ngram,
        pairSet(s, dir, "q_dedup_minhash", "doc_a", "doc_b", dumps)), ngram.size),
      Entry("simhash", recallOf(nearNgram,
        pairSet(s, dir, "q_dedup_simhash", "doc_a", "doc_b", dumps)), nearNgram.size),
      Entry("embedding_lsh", recallOf(cosine, lshFound), cosine.size),
      Entry("ann", recallOf(cosine, annFound), cosine.size),
      Entry("ivf", recallOf(cosine, ivfFound), cosine.size),
      // PQ-ADC answers the fixed query set, so its reference is the
      // EXACT top-10 for those queries (recall@10 — the retrieval
      // metric), not the corpus-wide near-dup pairs ann/ivf emit
      {
        val exactTopk = pairSet(s, dir, "q_similarity_topk", "qid", "nid", dumps)
        Entry("pq_adc", recallOf(exactTopk,
          pairSet(s, dir, "q_similarity_pqadc", "qid", "nid", dumps)),
          exactTopk.size)
      },
      {
        val exactTopk = pairSet(s, dir, "q_similarity_topk", "qid", "nid", dumps)
        Entry("ivf_adc", recallOf(exactTopk,
          pairSet(s, dir, "q_similarity_ivfadc", "qid", "nid", dumps)),
          exactTopk.size)
      },
      // semantic dedup is scored on DROPPED IDS, not pairs: the brute
      // rule drops exactly the vec_b side of the exact cosine pairs
      // (pairs are emitted vec_a < vec_b), and the clustered operator's
      // drops are provably a subset (LlmOpsSpec) — recall is the
      // fraction of brute drops the cluster partition still catches
      semanticEntry(s, dir, cosine, dumps)) ++ {
      val planted = collectPlanted(s, dir)
      plantedEntries(planted,
        Seq("planted_lsh" -> lshFound, "planted_ann" -> annFound,
          "planted_ivf" -> ivfFound)) ++
        plantedIvfadcEntries(s, dir, planted)
    }
  }

  /** PLANTED-pair recall stamps (r12 verdict item 3, self-gating form
    * of tools/planted_recall.py): probe replicas built by make_probe.py
    * plant one near-dup pair per 100-id block (partner = previous id;
    * strength tier cycles with the block, cosines ~0.99/0.91/0.74).
    * When the SF dir carries planted ids, each embedding-space
    * operator is graded on exactly those pairs, overall and per tier —
    * the OPERATOR-quality signal at probe scale, separate from
    * truth-set recall (which SCALEPROBE r12 showed is dominated by
    * borderline isotropic pairs near the 0.45 threshold). sf0.1 and
    * all fixture corpora carry no planted ids, so the bench block is
    * absent there and every existing stamp is unchanged. */
  private[graft] def plantedPairs(ids: DataFrame): DataFrame = {
    val off = 1000000000L
    ids.select(col("vec_id"))
      .where(col("vec_id") >= off && pmod(col("vec_id"), lit(100L)) === 1)
      .select((col("vec_id") - 1).as("a"), col("vec_id").as("b"),
        expr(s"CAST(((vec_id % $off) div 100 + vec_id div $off) % 3 AS INT)")
          .as("tier"))
      // a replica's FIRST block pairs with id k·OFF+0, which exists
      // only if the source corpus carries vec_id 0 — a planted row
      // whose partner is absent is not a gradable pair (ADVICE r12)
      .join(ids.select(col("vec_id").as("a")), Seq("a"), "left_semi")
  }

  /** Driver-side planted-pair budget (r13 verdict nit 4): planted
    * pairs are n/100, ~2k at the 100× probe — but the collect should
    * survive another probe decade, so above the cap the graded set is
    * a deterministic hash-sample (the anchored-truth precedent:
    * xxhash64-ranked, partitioning-invariant, unbiased per tier in
    * expectation). Every current dir sits far under the cap, so all
    * existing stamps are unchanged. */
  val PlantedPairCap = 65536

  private def collectPlanted(s: SparkSession,
                             dir: String): Array[(Long, Long, Int)] =
    plantedPairs(
      sources.Tables.embeddings(s, dir).select(col("vec_id")))
      .orderBy(xxhash64(col("b"), lit(0x9a14L)), col("b"))
      .limit(PlantedPairCap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  private def plantedEntries(planted: Array[(Long, Long, Int)],
                             found: Seq[(String, Set[(Long, Long)])])
      : Seq[Entry] = {
    if (planted.isEmpty) Seq.empty
    else found.flatMap { case (name, f) =>
      def entryOf(suffix: String, pairs: Array[(Long, Long, Int)]) =
        Entry(name + suffix,
          recallOf(pairs.map(p => (p._1, p._2)).toSet, f), pairs.length)
      entryOf("", planted) +:
        planted.groupBy(_._3).toSeq.sortBy(_._1).map { case (tier, ps) =>
          entryOf(s"_t$tier", ps)
        }
    }
  }

  /** Per-tier query budget for the planted IVF-ADC stamp (r13 verdict
    * item 6): unlike the dump-graded stamps above, grading the COMPLETE
    * retrieval architecture on planted pairs must RUN the pipeline with
    * the planted ids as its query slice — so the slice is a bounded
    * deterministic hash-sample (the anchored-truth precedent), keeping
    * candidate volume at |queries| × probed-fraction × n × AdcAssignK
    * regardless of corpus size. The coarse index is memoized
    * (Similarity.ivfadcIndex), so this adds ONE bounded search over the
    * already-built index per bench pass, not a second index build. */
  val PlantedIvfadcPerTier = 64

  private def plantedIvfadcEntries(s: SparkSession, dir: String,
                                   planted: Array[(Long, Long, Int)])
      : Seq[Entry] = {
    if (planted.isEmpty) return Seq.empty
    // deterministic per-tier sample, keyed on a driver-side mix of the
    // planted id (partitioning-independent; same pairs every run)
    def mix(x: Long): Long = {
      val z = (x ^ (x >>> 33)) * 0x9e3779b97f4a7c15L
      z ^ (z >>> 29)
    }
    val sampled = planted.groupBy(_._3).toSeq.flatMap { case (_, ps) =>
      ps.sortBy(p => (mix(p._2), p._2)).take(PlantedIvfadcPerTier)
    }.toArray
    val qids = sampled.map(_._1).toSeq
    // query = the planted partner's anchor side; the pipeline's top-10
    // for that query must contain the planted near-dup (recall@10 of
    // the KNOWN nearest neighbor — tiers 0/1 plant cosines ~0.99/0.91,
    // far above background; tier 2 ~0.74 vs background max ~0.62)
    val found = operators.Similarity
      .ivfadcTopk(s, dir, col("vec_id").isInCollection(qids))
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def entryOf(suffix: String, pairs: Array[(Long, Long, Int)]) =
      Entry("planted_ivfadc" + suffix,
        recallOf(pairs.map(p => (p._1, p._2)).toSet, found), pairs.length)
    entryOf("", sampled) +:
      sampled.groupBy(_._3).toSeq.sortBy(_._1).map { case (tier, ps) =>
        entryOf(s"_t$tier", ps)
      }
  }

  private def semanticEntry(s: SparkSession, dir: String,
                            cosine: Set[(Long, Long)],
                            dumps: Option[String]): Entry = {
    val droppedBrute = cosine.map(_._2)
    val droppedSem = resultOf(s, dir, "q_dedup_semantic", dumps)
      .filter(!col("kept")).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val r = if (droppedBrute.isEmpty) 1.0
      else droppedSem.intersect(droppedBrute).size.toDouble / droppedBrute.size
    Entry("semantic_dedup", r, droppedBrute.size.toLong)
  }
}
