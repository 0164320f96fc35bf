package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Similarity
import graft.operators.Similarity.{PqD, PqM}

/** [[graft.functions.PqArgmin]] (r12 verdict item 4): the fused
  * codegen argmin must be BIT-identical — code and sqerr — to the
  * interpreted HOF pipeline it replaced
  * (`transform(cb, c -> Σ(x−y)²)` + `array_min` +
  * `element_at(cb, array_position(...)).cell`), including first-
  * minimum tie-breaks. Checked both on adversarial synthetic rows
  * (exact ties, empty codebooks) and on the real trained codebook ×
  * the real corpus at sf0.001. */
class PqArgminSpec extends SparkSpec {

  private def hofBest(sv: org.apache.spark.sql.Column,
                      cb: org.apache.spark.sql.Column) = {
    val dist2 = (a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, d) => acc + d)
    val scored = transform(cb, c => dist2(sv, c.getField("cent")))
    val best = array_min(scored)
    struct(
      element_at(cb, array_position(scored, best).cast("int"))
        .getField("cell").as("code"),
      best.as("sqerr"))
  }

  test("pq_argmin == HOF transform/array_min/array_position, incl. exact ties") {
    val rnd = new scala.util.Random(0xbeefL)
    def vec() = Seq.fill(4)(math.rint(rnd.nextDouble() * 8) / 4.0)
    val rows = (1 to 120).map { i =>
      val k = 1 + rnd.nextInt(12)
      val cents = Seq.tabulate(k)(c => Row(c.toLong, vec()))
      // force exact ties: duplicate an earlier centroid under a HIGHER
      // cell id — the first (lowest-cell) minimum must win in both forms
      val withTie =
        if (i % 3 == 0 && k >= 2) cents.updated(k - 1, Row((k - 1).toLong, cents.head.getSeq[Double](1)))
        else cents
      Row(i, vec(), withTie)
    }
    val cbType = ArrayType(StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("cent", ArrayType(DoubleType, containsNull = false)))))
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("sv", ArrayType(DoubleType, containsNull = false)),
      StructField("cb", cbType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val both = df.select(col("id"),
        call_function("pq_argmin", col("sv"), col("cb")).as("got"),
        hofBest(col("sv"), col("cb")).as("ref"))
      .collect()
    both.foreach { r =>
      val got = r.getStruct(1); val ref = r.getStruct(2)
      assert(got.getLong(0) == ref.getLong(0),
        s"id ${r.getInt(0)}: code ${got.getLong(0)} != HOF ${ref.getLong(0)}")
      assert(java.lang.Double.doubleToRawLongBits(got.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(ref.getDouble(1)),
        s"id ${r.getInt(0)}: sqerr not bit-identical")
    }
  }

  test("null codebook entries / null cent arrays are skipped, matching HOF null-skip") {
    // ADVICE r13: pq_argmin is session-registered, so arbitrary SQL
    // can feed codebooks with null slots — those candidates must be
    // SKIPPED (the HOF form null-scores them and array_min ignores
    // nulls), never NPE.
    val cbType = ArrayType(StructType(Seq(
      StructField("cell", LongType, nullable = false),
      StructField("cent", ArrayType(DoubleType), nullable = true))),
      containsNull = true)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("sv", ArrayType(DoubleType)),
      StructField("cb", cbType)))
    val rows = Seq(
      // null entry slot, then a real candidate
      Row(1, Seq(1.0, 2.0), Seq(null, Row(7L, Seq(1.0, 1.0)))),
      // null cent array inside an entry, then a real candidate
      Row(2, Seq(1.0, 2.0), Seq(Row(3L, null), Row(9L, Seq(0.0, 2.0)))),
      // only unusable candidates -> null result (HOF: all null-scored)
      Row(3, Seq(1.0, 2.0), Seq(null, Row(4L, null))))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val got = df.select(col("id"),
        call_function("pq_argmin", col("sv"), col("cb")).as("g"))
      .collect().map(r => r.getInt(0) -> Option(r.getStruct(1))).toMap
    assert(got(1).map(_.getLong(0)).contains(7L))
    assert(got(2).map(_.getLong(0)).contains(9L))
    assert(got(3).isEmpty, "all-null codebook must yield null, not NPE")
  }

  test("real corpus: trained codebook encodes identically under both forms") {
    val (cents, coded) = Similarity.pqModel(spark, sf)
    val cb = cents.groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(col("cell"), col("cent"))))
        .as("cb"))
    val e = sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val subs = e.select(col("vec_id"), posexplode(array(
        (0 until PqM).map(m => slice(col("v"), m * PqD + 1, PqD)): _*))
      .as(Seq("sub", "sv")))
    val ref = subs.join(broadcast(cb), "sub")
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        hofBest(col("sv"), col("cb")).as("b"))
      .select(col("vec_id"), col("sub"),
        col("b").getField("code").as("code"),
        col("b").getField("sqerr").as("sqerr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), java.lang.Double.doubleToRawLongBits(r.getDouble(3))))
      .toMap
    val got = coded
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("code"), col("sqerr"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), java.lang.Double.doubleToRawLongBits(r.getDouble(3))))
      .toMap
    assert(got.keySet == ref.keySet)
    val diff = got.count { case (k, v) => ref(k) != v }
    assert(diff == 0, s"$diff of ${got.size} (vec,sub) codes/sqerrs drifted")
  }
}
