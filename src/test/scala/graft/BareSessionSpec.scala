package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver contract must hold on a SparkSession built WITHOUT any
  * graft configuration (no nanosAsLong, no registered functions or
  * strategies) — SparkEntry queries self-configure via
  * Sessions.ensureConfigured. */
class BareSessionSpec extends AnyFunSuite {

  test("entry + a nanos-reading + custom-operator query run on a bare session") {
    // reuse the shared JVM session's context but strip to a fresh
    // session state with none of graft's registrations
    val base = SparkSpec.session
    val bare: SparkSession = base.newSession()
    assert(bare.sessionState ne base.sessionState)

    assert(SparkEntry.entry(bare).count() > 0)
    // events.ts is TIMESTAMP(NANOS): fails on an unconfigured session
    assert(SparkEntry.queries("q_join_asof")(bare, "/root/testdata/sf0.001").count() > 0)
    // needs cosine_sim registration
    assert(SparkEntry.queries("q_similarity_topk")(bare, "/root/testdata/sf0.001").count() > 0)
    // needs TopKStrategy
    assert(SparkEntry.queries("q_topk_per_key")(bare, "/root/testdata/sf0.001").count() > 0)
  }
}
