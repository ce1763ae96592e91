package graft.policy

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.schemas.NefSchemas

/** D1/D2 — the policy gate as a compiled Catalyst projection.
  *
  * The reference makes one `process_data` RPC per record and rebuilds the
  * record from the response: denied rows dropped, surviving rows get their
  * tag/metric values possibly rewritten (hashed / redacted) and keys absent
  * from the response removed (reference receiver.py:412–433; the transform
  * vocabulary — "field filtering, hashing, redaction" — is README.md:10).
  *
  * At 100 TB a per-row RPC is a non-starter; the engine compiles the policy
  * rule set ONCE into a Catalyst predicate + projection, so the gate runs
  * inside whole-stage codegen with zero network calls on the data path.
  */
object Policy {

  /** A compiled policy. `deny` is a row predicate over the envelope columns
    * (`tags`, `metrics`, `event`, …). Tag rewrites are restricted to the
    * string-typed tag fields (the closed tag universe, NefSchemas.tags);
    * metric drops remove keys from the metrics map.
    */
  case class Rules(
      deny: Column = lit(false),
      hashTags: Set[String] = Set.empty,
      redactTags: Set[String] = Set.empty,
      dropTags: Set[String] = Set.empty,
      dropMetrics: Set[String] = Set.empty)

  object Rules { val allowAll: Rules = Rules() }

  private val stringTagFields: Seq[String] =
    NefSchemas.tags.fields.filter(_.dataType.typeName == "string").map(_.name).toSeq

  /** Rebuild the `tags` struct applying hash / redact / drop per field —
    * a pure `select`, exactly the reference's dict rebuild
    * (receiver.py:427–433) without the RPC.
    */
  private def rewriteTags(tags: Column, rules: Rules): Column = {
    val fields = NefSchemas.tags.fields.map { f =>
      val v = tags.getField(f.name)
      val out =
        if (rules.dropTags.contains(f.name)) lit(null).cast(f.dataType)
        else if (rules.hashTags.contains(f.name) && stringTagFields.contains(f.name))
          when(v.isNotNull, sha2(v, 256)).otherwise(lit(null))
        else if (rules.redactTags.contains(f.name) && stringTagFields.contains(f.name))
          when(v.isNotNull, lit("***")).otherwise(lit(null))
        else v
      out.as(f.name)
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** Apply a compiled rule set to a normalized-envelope DataFrame:
    * row filter (D1) then column rewrite/drop (D2).
    */
  def apply(records: DataFrame, rules: Rules): DataFrame = {
    val filtered = records.where(!rules.deny)
    val dropped = rules.dropMetrics
    val metricsOut =
      if (dropped.isEmpty) col("metrics")
      else map_filter(col("metrics"), (k, _) => !k.isin(dropped.toSeq: _*))
    filtered
      .withColumn("tags", rewriteTags(col("tags"), rules))
      .withColumn("metrics", metricsOut)
  }
}
