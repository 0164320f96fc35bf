package graft

import org.apache.spark.sql.functions._

/** `Dataset.observe` — pipeline metrics without a second pass (the
  * production way to count/validate rows inside an ETL job at scale,
  * rather than re-running an aggregate over 100 TB). */
class ObserveSpec extends SparkSpec {

  test("observe collects row metrics in the same pass as the job") {
    val li = sources.Tables.lineitem(spark, sf)
    val observed = li.observe("metrics",
      count(lit(1)).as("rows"),
      sum(col("l_quantity")).as("qty"),
      max(col("l_shipdate")).as("latest_ship"))
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      @volatile var metrics: Option[org.apache.spark.sql.Row] = None
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.get("metrics").foreach(r => metrics = Some(r))
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      observed.write.format("noop").mode("overwrite").save()
      // listener delivery is async; poll briefly
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.metrics.isEmpty && System.nanoTime() < deadline)
        Thread.sleep(50)
      val m = listener.metrics.getOrElse(fail("no observed metrics delivered"))
      assert(m.getAs[Long]("rows") == li.count())
      assert(m.getAs[Double]("qty") > 0.0)
    } finally spark.listenerManager.unregister(listener)
  }
}
