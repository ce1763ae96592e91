package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM, configured
  * identically to Verify/Bench (ANSI off, UTC, sizeOfNull, nanosAsLong,
  * InferFiltersFromGenerate excluded) so tests observe the same semantics
  * the driver's correctness gate does. Never stopped — the forked JVM exits
  * after the run.
  */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.sizeOfNull", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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
