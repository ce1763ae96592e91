package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping statistics manifest — the Delta/Iceberg data-skipping
  * story as an executed artifact next to [[graft.functions.ZOrder]]:
  * per-FILE min/max of chosen columns written as a `_stats_manifest.json`
  * sidecar at save time, consulted at read time to hand Spark only the
  * files whose [min, max] intervals can intersect the predicate — so a
  * point/range/box query on a well-layouted table reads a strict subset
  * of files BEFORE any scan starts (file-granularity pruning, one level
  * below the hive-partition pruning FormatsSpec already proves).
  *
  * Scale shape: the stats pass is one column-pruned scan of the
  * freshly-written files grouped by `input_file_name()` — at 100 TB this
  * rides the same maintenance job as OPTIMIZE/ZORDER (which rewrites the
  * data anyway) and reads only the indexed columns; the manifest itself
  * is a numFiles×numCols-row control table (the FieldRegistry size
  * class), held on the driver at read time exactly like Delta's log
  * replay. Pruning correctness never depends on layout: a file whose
  * intervals intersect the predicate is always read, so an unsorted
  * table degrades to a full read, never to row loss — layout
  * (repartitionByRange for one column, z-order for a multi-column box)
  * is what makes the intervals DISJOINT and the subset strict.
  */
object StatsManifest {

  private val ManifestName = "_stats_manifest.json"

  /** One (file, column) entry: path, file row count, column min/max. */
  final case class FileColStats(file: String, rows: Long, col: String,
      min: Long, max: Long)

  /** Write `df` as parquet to `dir` and collect the per-file min/max
    * manifest for the LONG-typed `statsCols` alongside it — one manifest
    * line per (file, column).
    */
  def write(df: DataFrame, dir: String, statsCols: String*): Seq[FileColStats] = {
    require(statsCols.nonEmpty, "at least one stats column")
    df.write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    val aggs: Seq[Column] = count(lit(1)).as("rows") +: statsCols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"mn_$c"),
        max(col(c)).cast("long").as(s"mx_$c")))
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .flatMap { r =>
        statsCols.map(c => FileColStats(r.getAs[String]("file"),
          r.getAs[Long]("rows"), c,
          r.getAs[Long](s"mn_$c"), r.getAs[Long](s"mx_$c")))
      }
      .sortBy(s => (s.file, s.col)).toSeq
    val json = stats.map { s =>
      s"""{"file":"${s.file}","rows":${s.rows},"col":"${s.col}","min":${s.min},"max":${s.max}}"""
    }.mkString("\n")
    Files.write(Paths.get(dir, ManifestName),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    stats
  }

  /** Read the manifest back (numFiles×numCols rows — driver-side control
    * data, the Delta-log-replay size class).
    */
  def readManifest(dir: String): Seq[FileColStats] =
    Files.readAllLines(Paths.get(dir, ManifestName)).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty).map { line =>
      def grab(k: String): String = {
        val m = java.util.regex.Pattern
          .compile("\"" + k + "\":(\"([^\"]*)\"|[-0-9]+)").matcher(line)
        require(m.find(), s"manifest line missing $k: $line")
        if (m.group(2) != null) m.group(2) else m.group(1)
      }
      FileColStats(grab("file"), grab("rows").toLong, grab("col"),
        grab("min").toLong, grab("max").toLong)
    }

  /** Box read with file skipping: only files whose per-column [min, max]
    * intervals intersect EVERY queried range reach the scan (conjunction
    * semantics — the Delta data-skipping rule). Returns (frame, files
    * handed to the scan, total files) so callers can assert the executed
    * subset. Columns absent from `ranges` don't constrain; a queried
    * column missing from the manifest fails loudly rather than silently
    * reading everything.
    */
  def readBox(spark: SparkSession, dir: String,
      ranges: Map[String, (Long, Long)]): (DataFrame, Seq[String], Int) = {
    val manifest = readManifest(dir)
    val byFile = manifest.groupBy(_.file)
    val cols = manifest.map(_.col).toSet
    val missing = ranges.keySet.diff(cols)
    require(missing.isEmpty, s"manifest has no stats for: ${missing.mkString(", ")}")
    val keep = byFile.toSeq.sortBy(_._1).collect {
      case (file, entries) if ranges.forall { case (c, (lo, hi)) =>
        entries.find(_.col == c).exists(s => s.max >= lo && s.min <= hi)
      } => file
    }
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(keep: _*)
    (df, keep, byFile.size)
  }

  /** Single-range convenience over [[readBox]] for a one-column manifest. */
  def readRange(spark: SparkSession, dir: String, lo: Long, hi: Long)
      : (DataFrame, Seq[String], Int) = {
    val cols = readManifest(dir).map(_.col).distinct
    require(cols.size == 1,
      s"readRange needs a one-column manifest, found: ${cols.mkString(", ")}")
    readBox(spark, dir, Map(cols.head -> (lo, hi)))
  }
}
