package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping statistics manifest — the Delta/Iceberg data-skipping
  * story as an executed artifact next to [[graft.functions.ZOrder]]:
  * per-FILE min/max of a chosen column written as a `_stats_manifest.json`
  * sidecar at save time, consulted at read time to hand Spark only the
  * files whose [min, max] interval can intersect the predicate — so a
  * point/range query on a range-layouted table reads a strict subset of
  * files BEFORE any scan starts (file-granularity pruning, one level
  * below the hive-partition pruning FormatsSpec already proves).
  *
  * Scale shape: the stats pass is one column-pruned scan of the
  * freshly-written files grouped by `input_file_name()` — at 100 TB this
  * rides the same maintenance job as OPTIMIZE/ZORDER (which rewrites the
  * data anyway) and reads only the indexed column; the manifest itself is
  * a numFiles-row control table (the FieldRegistry size class), held on
  * the driver at read time exactly like Delta's log replay. Pruning
  * correctness never depends on layout: a file whose interval intersects
  * the predicate is always read, so an unsorted table degrades to a full
  * read, never to row loss — layout (repartitionByRange / z-order) is
  * what makes the intervals DISJOINT and the subset strict.
  */
object StatsManifest {

  private val ManifestName = "_stats_manifest.json"

  /** One file's entry: path, row count, min/max of the indexed column. */
  final case class FileStats(file: String, rows: Long, min: Long, max: Long)

  /** Write `df` as parquet to `dir` and collect the per-file min/max
    * manifest for LONG-typed `statsCol` alongside it.
    */
  def write(df: DataFrame, dir: String, statsCol: String): Seq[FileStats] = {
    df.write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    val stats = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(statsCol)).cast("long").as("mn"),
        max(col(statsCol)).cast("long").as("mx"))
      .collect()
      .map(r => FileStats(r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_.file).toSeq
    val json = stats.map { s =>
      s"""{"file":"${s.file}","rows":${s.rows},"min":${s.min},"max":${s.max}}"""
    }.mkString("\n")
    Files.write(Paths.get(dir, ManifestName),
      (json + "\n").getBytes(StandardCharsets.UTF_8))
    stats
  }

  /** Read the manifest back (numFiles rows — driver-side control data). */
  def readManifest(dir: String): Seq[FileStats] =
    Files.readAllLines(Paths.get(dir, ManifestName)).toArray(Array.empty[String])
      .toSeq.filter(_.nonEmpty).map { line =>
      def grab(k: String): String = {
        val m = java.util.regex.Pattern
          .compile("\"" + k + "\":(\"([^\"]*)\"|[-0-9]+)").matcher(line)
        require(m.find(), s"manifest line missing $k: $line")
        if (m.group(2) != null) m.group(2) else m.group(1)
      }
      FileStats(grab("file"), grab("rows").toLong, grab("min").toLong,
        grab("max").toLong)
    }

  /** Range read with file skipping: only files whose [min, max] interval
    * intersects [lo, hi] reach the scan. Returns (frame, files handed to
    * the scan, total files) so callers can assert the executed subset.
    */
  def readRange(spark: SparkSession, dir: String, lo: Long, hi: Long)
      : (DataFrame, Seq[String], Int) = {
    val manifest = readManifest(dir)
    val keep = manifest.filter(s => s.max >= lo && s.min <= hi).map(_.file)
    val df =
      if (keep.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(keep: _*)
    (df, keep, manifest.size)
  }
}
