package tmpdebug
import org.apache.spark.sql.functions._
object RefScale {
  def main(a: Array[String]): Unit = {
    val spark = graft.Sessions.build("local[32]", 32)
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"RSDEBUG $label%-22s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val TwoPow64 = math.pow(2.0, 64)
    def u01(c: org.apache.spark.sql.Column, salt: Int) = (xxhash64(c, lit(salt)) / lit(TwoPow64)) + lit(0.5)
    val names = graft.sources.Timeseries.Names.toArray
    def pruned() = {
      val base = spark.range(0, 86400L * 1000, 1, 1000)
      val id = col("id")
      base.select(
        element_at(lit(names), (pmod(xxhash64(id, lit(100)), lit(26)) + 1).cast("int")).as("name"),
        (u01(id, 104) * 2.0 - 1.0).as("y"))
        .groupBy(col("name")).agg(avg(col("y")).as("mean_y"))
        .agg(round(stddev_samp(col("mean_y")), 9).as("std_of_means"))
    }
    val cur = graft.Registry.byName("q_reference_scale").fn
    t("hand-pruned-1")(pruned().write.format("noop").mode("overwrite").save())
    t("hand-pruned-2")(pruned().write.format("noop").mode("overwrite").save())
    t("current-1")(cur(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save())
    t("current-2")(cur(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save())
    t("hand-pruned-3")(pruned().write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
