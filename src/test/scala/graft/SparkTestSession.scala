package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (sbt forks a single test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.local("graft-test", Some("4"))
  val sf0001 = "/root/testdata/sf0.001"
}
