package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted join == plain join (row multiset)") {
    val li = sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = sources.Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    val salted = Skew.saltedJoin(li, o, "l_orderkey", factor = 7,
        saltSource = Seq("l_orderkey", "l_linenumber"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    assert(salted == plain)
  }

  test("salt spreads a hot key across buckets") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "id")
    val spread = hot.withColumn("__salt",
        pmod(xxhash64(col("k"), col("id")), lit(8)))
      .groupBy(col("__salt")).count().collect()
    assert(spread.length == 8, "hot key should land in all 8 salt buckets")
    assert(spread.map(_.getLong(1)).max < 1000 * 0.3, "no bucket should dominate")
  }
}
