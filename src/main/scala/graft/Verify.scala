package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Session semantics
  * come from [[GraftSession]] (shared with Bench and the test suite). */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [queryName...]")
    val sfDir = args(0)
    val outDir = args(1)
    val nameFilter = args.drop(2)
    // optional trailing args select a query subset for local iteration
    // (oracle_sql.json is filtered to match so tools/check.py accepts a
    // partial dump); the driver always passes exactly two args
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.isEmpty || nameFilter.contains(n) }
    val unknown = nameFilter.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // Fail LOUDLY: still write a dump for the query — a 1-row frame
        // whose schema can never match an oracle — so the driver's
        // correctness gate records an explicit failure instead of the
        // query silently vanishing from the round report (round-2 q17/q18).
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        import spark.implicits._
        Seq(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}")
          .toDF("_verify_error")
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => nameFilter.isEmpty || nameFilter.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
