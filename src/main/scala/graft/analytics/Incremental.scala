package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Incremental aggregate maintenance — the materialized-view refresh
  * pattern: keep per-key ALGEBRAIC partial states (count, exact decimal
  * sum, min, max), fold a new batch's state into the stored state, and
  * derive display aggregates (avg) only at finish. At 100 TB the point is
  * that a daily refresh costs one scan of the DELTA plus a key-sized
  * state merge — the historical corpus is never re-aggregated (d17/d20's
  * rolling-build economics applied to aggregation; Structured Streaming's
  * stateful aggs are the streaming twin of this same decomposition).
  *
  * Correctness rests on the merge being exact: counts and extremes are
  * trivially associative, and the sum is carried as DECIMAL(28,10)
  * partials (exact, order-independent — the q01/q44 discipline), so
  * merge(state(old), state(delta)) is bit-identical to state(old ∪ delta)
  * for ANY split of the input. q48's oracle asserts exactly that: the
  * merged two-part state against DuckDB's single-pass recompute.
  */
object Incremental {

  /** One key's algebraic partial state over `valueCol`. */
  def state(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key)).agg(
      count(col(valueCol)).as("n"),
      sum(col(valueCol).cast("decimal(28,10)")).as("s"),
      min(col(valueCol)).as("mn"),
      max(col(valueCol)).as("mx"))

  /** Fold two states (same shape as [[state]] output) into one. Keys
    * present in only one side pass through unchanged — a shuffle keyed on
    * the (pre-aggregated, key-sized) state tables, never on raw rows.
    */
  def merge(a: DataFrame, b: DataFrame, key: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(key)).agg(
        sum(col("n")).as("n"),
        sum(col("s")).as("s"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Derive display aggregates from a state: the exact decimal total as
    * DOUBLE and the 6-dp mean of exact operands (q44's formula).
    */
  def finish(st: DataFrame, key: String): DataFrame =
    st.select(col(key), col("n"),
      col("s").cast(DoubleType).as("total"),
      col("mn"), col("mx"),
      round(col("s").cast(DoubleType) / col("n"), 6).as("avg_v"))

  /** Incremental JOIN maintenance — the delta rule for insert-only
    * refreshes of a materialized join view (Blakeley et al. 1986):
    *
    *   Δ(R ⋈ S) = ΔR ⋈ S_old  ∪  R_old ⋈ ΔS  ∪  ΔR ⋈ ΔS
    *
    * so a daily refresh joins each delta against the OTHER side's
    * snapshot (plus the delta-delta corner), never re-joining the two
    * historical snapshots — the term that dominates at 100 TB is gone.
    * Returns V_old ∪ Δ V as the refreshed view. Exactness is
    * structural: the three delta terms partition exactly the new join
    * rows ((r,s) pairs split by which side each row arrived in), so the
    * result is row-identical to the full re-join for ANY split —
    * downstream exact-decimal aggregation then matches bit-for-bit
    * (q67's oracle is the single-pass recompute).
    *
    * At scale, keep the snapshots bucketed on the join key (the d21
    * persisted-band-index economics): each delta term is then one
    * exchange on the delta side only.
    */
  def incrementalJoin(vOld: DataFrame, rOld: DataFrame, rDelta: DataFrame,
      sOld: DataFrame, sDelta: DataFrame, keys: Seq[String]): DataFrame =
    vOld
      .unionByName(rDelta.join(sOld, keys))
      .unionByName(rOld.join(sDelta, keys))
      .unionByName(rDelta.join(sDelta, keys))

  /** Changelog compaction (q92): collapse a CDC stream of upserts (`U`)
    * and tombstones (`D`) to the final per-key state — the Debezium /
    * Delta-CDF consumer's materialization step. ONE key-grouped
    * aggregate: `max(struct(ts, seq, op, value))` picks the LAST
    * operation under (tsCol, seqCol) lexicographic order (seqCol breaks
    * timestamp ties, so an upsert and a tombstone in the same instant
    * resolve deterministically by sequence), and a key whose last op is
    * a tombstone is DROPPED from the output, not emitted with a null —
    * the contract a spec holds. op/value ride inside the struct, so no
    * second pass re-reads the winning row.
    * Output: (keyCol, n_ops, n_deletes, last_ts, value).
    */
  def applyChangelog(cl: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, opCol: String, valueCol: String): DataFrame =
    cl.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_ops"),
        sum(when(col(opCol) === "D", 1L).otherwise(0L)).as("n_deletes"),
        max(struct(col(tsCol).as("ts"), col(seqCol).as("seq"),
          col(opCol).as("op"), col(valueCol).as("value"))).as("last"))
      .where(col("last").getField("op") === "U")
      .select(col(keyCol), col("n_ops"), col("n_deletes"),
        col("last").getField("ts").as("last_ts"),
        col("last").getField("value").as("value"))
}
