package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level crawl hygiene — the curation staple applied before any
  * content-level dedup: web corpora are wildly skewed by site, so a
  * per-registered-domain document cap keeps one boilerplate-heavy host
  * from dominating the training mix.
  *
  * Extraction is pure per-row regex (scan-parallel, no shuffle); the cap
  * rides the q36/q37 deterministic-quota machinery: ONE shuffle on the
  * domain key and a per-domain window ordered by the portable md5
  * permutation, so the kept subset is reproducible run-to-run and
  * engine-to-engine regardless of partitioning. The regexes avoid
  * lookaround, so the SQL twin runs them verbatim.
  */
object Domains {

  /** Hostname of a URL (scheme-mandatory, port/path/query stripped). */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)

  /** Registered (registrable) domain of a hostname under `publicSuffix`:
    * the suffix plus ONE label — e.g. `deep.cdn.src0.example.com` with
    * suffix `example.com` → `src0.example.com`. A full implementation
    * swaps the single literal for the public-suffix list (a broadcast
    * lookup keyed by longest matching suffix); the extraction shape —
    * per-row, no shuffle — is unchanged.
    */
  def registeredDomain(hostCol: Column, publicSuffix: String): Column =
    regexp_extract(hostCol,
      "([^.]+\\." + java.util.regex.Pattern.quote(publicSuffix) + ")$", 1)

  /** Per-registered-domain quota: keep at most `k` documents per domain,
    * selected by the portable md5 permutation ([[Sampling]]'s
    * reproducibility contract). Emits the input columns plus `host`,
    * `domain`, and the within-domain `sample_rank`, quota-filtered.
    */
  def domainQuota(docs: DataFrame, urlCol: String, publicSuffix: String,
      k: Int, idCol: String = "doc_id"): DataFrame = {
    val withDomain = docs
      .withColumn("host", host(col(urlCol)))
      .withColumn("domain", registeredDomain(col("host"), publicSuffix))
    Sampling.deterministicStratified(withDomain, stratumCol = "domain",
      k = k, idCol = idCol)
  }
}
