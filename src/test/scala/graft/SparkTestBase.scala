package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM — sbt forks a single test
  * JVM; getOrCreate returns the same session everywhere). Built with task
  * retries (`local[4, 2]`) so the suite matches cluster behavior — real
  * clusters retry up to spark.task.maxFailures=4 — and fault-injection
  * specs (FaultRecoverySpec) can observe a retried task instead of a dead
  * job. Retries are latent elsewhere: no other suite injects failures. */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.localResilient(4)
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
}
