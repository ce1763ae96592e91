package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins for keys whose row counts are heavy-tailed.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) splits oversized SORT-MERGE partitions at runtime and is
  * the first line of defense. Salting is the explicit fallback for the
  * cases AQE cannot fix — a single key too large for ANY one task, or a
  * broadcast-ineligible dimension joined on a hot key: the fact side
  * spreads each key over `factor` sub-keys, the dimension side is
  * replicated `factor`×, and the join key becomes (key, salt).
  */
object SkewJoin {

  /** Inner equi-join of a skewed fact table against a dimension, salted.
    *
    * The fact row's salt is a round-robin position within its partition
    * (`monotonically_increasing_id`), NOT a hash of the row's values: a hot
    * key whose skew comes from byte-identical duplicate rows (repeated
    * events, default-filled records) would hash every duplicate to the SAME
    * salt, collapsing the (key, salt) space back onto one task. Position-
    * based salting spreads even identical rows evenly, and stays
    * reproducible under task retry (the id is a function of partition index
    * and row position, both stable on re-execution of a partition). The
    * dimension is exploded `factor`× via posexplode of a constant array —
    * acceptable when |dim| × factor stays dimension-sized.
    *
    * Result equals `fact.join(dim, keys, "inner")` row-for-row
    * (equivalence-tested in OperatorsSpec); only the partitioning changes:
    * the shuffle key space is `factor`× finer, so one hot key lands on
    * `factor` tasks instead of one.
    */
  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    require(factor > 1, "salting needs factor > 1")
    val saltCol = "__graft_salt"
    val salted = fact.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(factor)).cast("int"))
    val replicated = dim.select(
      col("*"),
      explode(typedLit((0 until factor).toArray)).as(saltCol))
    salted.join(replicated, keys :+ saltCol, "inner").drop(saltCol)
  }
}
