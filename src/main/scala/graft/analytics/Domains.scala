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

  /** Registered (registrable) domain of a hostname under a public-suffix
    * rule list: the LONGEST proper suffix of the host present in `psl`
    * wins (the PSL longest-match rule — `github.io` beats `io`,
    * `co.uk` beats `uk`), and the registered domain is that suffix plus
    * ONE label — e.g. `deep.cdn.src0.example.com` with matching suffix
    * `example.com` → `src0.example.com`. Hosts matching no rule fall
    * back to the last two labels (the PSL's implicit `*` rule: an
    * unlisted TLD is itself a public suffix); single-label hosts pass
    * through unchanged.
    *
    * Pure per-row projection — candidate proper suffixes come from a
    * label-count-bounded array HOF and membership is a literal-array
    * lookup, so there is still no join and no shuffle. The real PSL is
    * ~10k rules: that still fits a plan literal / broadcast comfortably
    * at fleet scale; wildcard (`*.ck`) and exception (`!www.ck`) rules
    * would ride as two more literal arrays checked before this one.
    */
  def registeredDomain(hostCol: Column, psl: Seq[String]): Column = {
    val pslLit = array(psl.map(lit): _*)
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    // proper suffixes, longest first: k leading labels dropped, k = 1..n-1
    val suffixes = transform(sequence(lit(1), n - 1),
      k => array_join(slice(labels, k + 1, n - k), "."))
    val matched = filter(suffixes, s => array_contains(pslLit, s))
    val best = element_at(matched, 1) // first surviving = longest
    val m = size(split(best, "\\."))
    val reg = array_join(slice(labels, n - m, m + 1), ".")
    // n == 1 guard also keeps sequence(1, 0) (which descends) out of play
    when(n >= 2,
      when(size(matched) >= 1, reg)
        .otherwise(array_join(slice(labels, n - 1, lit(2)), ".")))
      .otherwise(hostCol)
  }

  /** URL canonicalization — the normalization every URL-level dedup runs
    * BEFORE comparing (the same page arrives as `HTTP://Host/p/`,
    * `https://host:443/p?utm_source=feed`, `https://host/p#frag`, …):
    *  1. drop the fragment (`#…` — client-side only),
    *  2. drop `utm_*` tracking params, keeping real ones, then any
    *     dangling `?`/`&`,
    *  3. collapse the default https port (`:443/` → `/`),
    *  4. lowercase the authority (host names are case-insensitive;
    *     paths are NOT and stay untouched),
    *  5. strip one trailing slash.
    * Pure per-row regex chain (no lookaround, no capture-group
    * replacements — the twin runs the same patterns modulo engine
    * replacement syntax); scan-parallel, no shuffle. Dedup on the
    * canonical form is then d01's hash-groupBy.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val noUtm = regexp_replace(
      regexp_replace(noFrag, "utm_[^&#]*&", ""), "utm_[^&#]*", "")
    val clean = regexp_replace(noUtm, "[?&]+$", "")
    val noPort = regexp_replace(clean, ":443/", "/")
    val lowered = concat(lit("https://"),
      lower(regexp_extract(noPort, "^https://([^/]*)", 1)),
      regexp_replace(noPort, "^https://[^/]*", ""))
    regexp_replace(lowered, "/$", "")
  }

  /** Per-registered-domain quota: keep at most `k` documents per domain,
    * selected by the portable md5 permutation ([[Sampling]]'s
    * reproducibility contract). Emits the input columns plus `host`,
    * `domain`, and the within-domain `sample_rank`, quota-filtered.
    */
  def domainQuota(docs: DataFrame, urlCol: String, psl: Seq[String],
      k: Int, idCol: String = "doc_id"): DataFrame = {
    val withDomain = docs
      .withColumn("host", host(col(urlCol)))
      .withColumn("domain", registeredDomain(col("host"), psl))
    Sampling.deterministicStratified(withDomain, stratumCol = "domain",
      k = k, idCol = idCol)
  }
}
