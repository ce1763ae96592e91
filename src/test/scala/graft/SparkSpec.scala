package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM, built from
  * [[GraftSession]] so tests observe exactly the semantics the driver's
  * correctness gate (Verify) and benchmark (Bench) do. Never stopped — the
  * forked JVM exits after the run.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", "4").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark

  /** Rows of a single-column DataFrame as a list of values. */
  def column[T](df: DataFrame): Seq[T] =
    df.collect().toSeq.map(_.getAs[T](0))

  def rows(df: DataFrame): Seq[Row] = df.collect().toSeq
}
