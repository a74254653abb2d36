package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM — sbt forks a single test
  * JVM; getOrCreate returns the same session everywhere). */
object TestSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local(4)
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf0001 = "/root/testdata/sf0.001"
}
