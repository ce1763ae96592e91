package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The engine's `SparkSessionExtensions` entry point — the documented way
  * to add Catalyst extensions without forking the session builder. Register
  * with `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Currently injects the one custom expression ([[SimHash64]]); the same
  * hook would carry custom optimizer `Rule`s or `SparkStrategy`s if an
  * operator ever outgrows the DataFrame vocabulary (none has — SURVEY §4).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(
        classOf[SimHash64].getName, null, "simhash64",
        "_FUNC_(tokens) - 64-bit SimHash of a string array (xxhash64 votes).",
        ""),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children.head)))
  }
}
