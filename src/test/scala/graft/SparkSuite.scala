package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites: one local session, UTC, small shuffle
  * width (suites run on tiny data; wide shuffles just add latency). */
object SharedSpark {
  lazy val spark: SparkSession = LocalSession.build("4")
}

trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  /** Driver-generated smallest fixture (TESTDATA.md). */
  val sf: String = "/root/testdata/sf0.001"

  def rows(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] =
    df.collect().toSeq
}
