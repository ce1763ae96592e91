package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Catalog-wide execution-parameter invariance gate (r16 verdict tasks 2+4):
  * every `SparkEntry.queries` entry must produce the IDENTICAL result
  * multiset under `spark.sql.shuffle.partitions=1` vs the session default
  * (32) and under `spark.sql.adaptive.enabled` flipped off. Individual
  * operators pin this locally (t36 partition parity, BPE regime parity);
  * this gate catches latent partitioning/order-dependence debt in EVERY
  * catalog query — sums that should be fixed-point, windows missing
  * tie-breaks, accidental reliance on partition-arrival order — for free.
  *
  * Fingerprint = (row count, sum, xor) over `xxhash64(to_json(struct(*)))`
  * per row: order-insensitive (multiset), but sensitive to any value or
  * schema change. `to_json` renders doubles via their shortest round-trip
  * form, so bit-identical doubles (the repo's cross-engine discipline
  * already guarantees value determinism) fingerprint identically.
  *
  * Usage: `runMain graft.ParityGate <sfDir> [queryName...]`. Exits 1 on any
  * mismatch, printing per-query PARITY lines; `[parity] PASS` on success.
  * Shuffle partitions and AQE are RUNTIME confs, so one session runs all
  * variants — each query re-plans under the active conf.
  */
object ParityGate {

  private def fingerprint(df: DataFrame): (Long, Long, Long) = {
    val h = df.select(
      xxhash64(to_json(struct(df.columns.map(col).toIndexedSeq: _*))).as("h"))
    val row = h.agg(count(lit(1)).as("n"), sum(col("h")).as("s"),
      expr("bit_xor(h)").as("x")).head()
    (row.getLong(0),
      if (row.isNullAt(1)) 0L else row.getLong(1),
      if (row.isNullAt(2)) 0L else row.getLong(2))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ParityGate <sfDir> [queryName...]")
    val sfDir = args(0)
    val nameFilter = args.drop(1)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => nameFilter.isEmpty || nameFilter.contains(n) }
    val unknown = nameFilter.toSet.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val variants = Seq(
      "shuffle.partitions=1" ->
        (() => spark.conf.set("spark.sql.shuffle.partitions", "1")),
      "adaptive.enabled=false" ->
        (() => spark.conf.set("spark.sql.adaptive.enabled", "false")),
      // interpreted-expression parity: forces the eval() path of every
      // expression — including the six custom Catalyst kernels, whose
      // doGenCode and eval are separate implementations — catalog-wide
      "codegen=off" -> (() => {
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      }))
    def reset(): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", cpus)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    var failures = 0
    selected.foreach { case (name, fn) =>
      try {
        reset()
        val base = fingerprint(fn(spark, sfDir))
        val bad = variants.flatMap { case (label, set) =>
          reset(); set()
          val v = fingerprint(fn(spark, sfDir))
          if (v == base) None else Some(s"$label -> $v")
        }
        if (bad.isEmpty)
          println(s"[parity] OK   $name n=${base._1}")
        else {
          failures += 1
          println(s"[parity] FAIL $name base=$base ${bad.mkString("; ")}")
        }
      } catch {
        case e: Throwable =>
          failures += 1
          println(s"[parity] ERR  $name ${e.getClass.getName}: " +
            String.valueOf(e.getMessage).take(200))
      }
    }
    reset()
    println(if (failures == 0) s"[parity] PASS ${selected.size} queries"
      else s"[parity] $failures/${selected.size} FAILED")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
