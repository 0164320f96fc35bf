package graft

import org.apache.spark.sql.functions._

/** Null and edge-input behavior of the custom pieces — the test data has
  * no nulls, so these pins come from constructed frames. */
class NullHandlingSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  test("cosine_sim: null array, mismatched length, and zero vector give null") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType), nullable = true),
      StructField("b", ArrayType(DoubleType), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, 2.0), null),
      Row(Seq(1.0, 2.0), Seq(1.0)),
      Row(Seq(0.0, 0.0), Seq(1.0, 1.0)),
      Row(Seq(1.0, 0.0), Seq(1.0, 0.0)))
    val df = spark.createDataFrame(rows, schema)
      .withColumn("cos", expr("cosine_sim(a, b)"))
    val out = df.select(col("cos")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
    assert(out(3).getDouble(0) == 1.0)
  }

  test("shingle_hashes: null text is null; short text yields empty array") {
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(null), Row("two words"), Row("now three words")),
      StructType(Seq(StructField("t", StringType, nullable = true))))
      .withColumn("sh", expr("shingle_hashes(t, 3)"))
    val out = df.select(col("sh")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Long](0).isEmpty)
    assert(out(2).getSeq[Long](0).length == 1)
  }

  test("shingle_hashes matches split()-token classes incl. trailing space") {
    import spark.implicits._
    // "a b " tokenizes to ["a","b",""] in both Spark split and DuckDB
    // string_split — 3 tokens means exactly one 3-shingle
    val n = Seq("a b ").toDF("t")
      .select(size(expr("shingle_hashes(t, 3)"))).first().getInt(0)
    assert(n == 1)
  }

  test("as-of join: keys with no earlier right rows keep null payload") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 5L)).toDF("k", "ts")
    val right = Seq((1L, 8L, 100L)).toDF("k", "ts", "payload")
    val out = operators.AsOf.lastEarlier(left, right, "k", "ts", "payload")
      .orderBy(col("k")).collect()
    assert(out(0).getLong(2) == 100L) // k=1 sees ts=8 <= 10
    assert(out(1).isNullAt(2))        // k=2 has no right rows at all
  }

  test("topKPerKey: null order values sort deterministically, never crash") {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("id", LongType, nullable = false)))
    val rows = java.util.Arrays.asList(
      Row(1L, null, 1L), Row(1L, 5.0, 2L), Row(1L, 7.0, 3L), Row(1L, null, 4L))
    val df = spark.createDataFrame(rows, schema)
    val out = operators.TopK.topKPerKey(df, Seq("k"),
      Seq(("v", false), ("id", true)), 3).orderBy(col("rank")).collect()
    assert(out.length == 3)
    // descending with default NULLS LAST semantics: 7.0, 5.0, then a null row
    assert(out(0).getDouble(1) == 7.0 && out(1).getDouble(1) == 5.0)
  }
}
