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
}
