package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for suites needing a session: one shared local session for the
  * whole test JVM (suites run in one forked JVM — build.sbt forks). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"

  def q(name: String): org.apache.spark.sql.DataFrame =
    Registry.byName(name).fn(spark, sf)
}

object SparkSpec {
  lazy val session: SparkSession = Sessions.build("local[4]", 4)
}
