package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — sbt
  * forks a single test JVM, so getOrCreate dedupes across suites).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  implicit lazy val sparkImplicit: SparkSession = spark
}

object SparkSpec {
  lazy val session: SparkSession = graft.core.GraftSession.local(cores = 4, appName = "graft-test")
}
