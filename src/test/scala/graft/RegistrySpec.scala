package graft

/** Every declared query must execute at sf0.001 and produce rows.
  * Auto-covers new registry entries as modules fill in. */
class RegistrySpec extends SparkSpec {
  Registry.all.foreach { qd =>
    test(s"${qd.name} runs and returns rows at sf0.001") {
      val df = qd.fn(spark, sf)
      assert(df.columns.distinct.length == df.columns.length, "duplicate column names")
      assert(df.count() > 0)
    }
  }
}
