package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.concurrent.TimeLimitedTests
import org.scalatest.time.{Seconds, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites; one JVM-wide SparkSession (sbt forks one
  * test JVM), streaming-capable, UTC. Built by the one session factory
  * (GraftSession), so every streaming spec runs on the RocksDB state store
  * the factory configures — the scale claim is executed code, not a comment. */
object TestSession {
  lazy val spark: SparkSession =
    graft.core.GraftSession.builder(4, "graft-test").getOrCreate()
}

abstract class SparkSpec extends AnyFunSuite with TimeLimitedTests {
  lazy val spark: SparkSession = TestSession.spark
  def sf(dir: String): String = s"/root/testdata/$dir"

  /** Fail fast instead of wedging CI: no single test (incl. streaming ones
    * driving micro-batches) may run longer than this. */
  override val timeLimit: Span = Span(120, Seconds)
}
