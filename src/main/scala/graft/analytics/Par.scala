package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Distinct, Join, RepartitionOperation, Sort, Window}

/** Parallelism helper shared by the CPU-bound per-row operators. */
object Par {

  /** Ensure at least one task per core before a CPU-bound per-row stage.
    * Spark sizes scan partitions by BYTES (`files.maxPartitionBytes`), so a
    * byte-small but compute-heavy corpus arrives as ONE split and the whole
    * per-row pipeline runs single-threaded. At real scale the input already
    * has more splits than cores and this is a no-op (no shuffle); the
    * round-robin shuffle it adds below the threshold moves only the raw
    * rows once.
    *
    * Only SCAN-shaped inputs are inspected: for a plan with an upstream
    * shuffle (join/agg/sort/…), `.rdd.getNumPartitions` under AQE would
    * materialize the upstream query stages eagerly — executing the
    * pipeline once just to count partitions and again for real. Shuffled
    * inputs already run at `spark.sql.shuffle.partitions`-way parallelism,
    * so no spread is needed there.
    */
  def spreadForCpu(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df // no .rdd on streaming frames; micro-batches re-enter here as batch frames
    val hasShuffleUpstream = df.queryExecution.optimizedPlan.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Distinct | _: RepartitionOperation |
                _: Sort | _: Window) => p
    }.isDefined
    if (hasShuffleUpstream) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
