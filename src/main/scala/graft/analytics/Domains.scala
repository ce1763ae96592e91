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
    * BEFORE comparing (the same page arrives as `HTTPS://Host:443/p/`,
    * `https://host/p?utm_source=feed`, `https://host/p#frag`, …):
    *  1. drop the fragment (`#…` — client-side only),
    *  2. lowercase the SCHEME first (schemes are case-insensitive), so
    *     every later anchor can assume `^https?://` — non-http(s)
    *     strings pass through steps 4–5 untouched instead of being
    *     corrupted (the round-12 defect: every anchor assumed literal
    *     lowercase `https://` and prepended a fresh one otherwise),
    *  3. drop `utm_*` tracking params ANCHORED to a `?`/`&` separator
    *     (`xutm_source=…` is a real param and survives), keeping real
    *     ones, then any dangling `?`/`&`,
    *  4. lowercase the authority and collapse the scheme's DEFAULT port
    *     (`:443` for https, `:80` for http) anchored to the authority —
    *     a path segment containing `:443/` is untouched,
    *  5. strip one trailing slash (paths stay case-sensitive).
    * http and https remain DISTINCT canonical forms — they are
    * different origins; unifying them is a policy decision this
    * normalizer does not take. Pure per-row regex chain (no lookaround,
    * no capture-group replacements — the twin runs the same patterns
    * modulo engine flag syntax); scan-parallel, no shuffle. Dedup on
    * the canonical form is then d01's hash-groupBy.
    */
  def canonicalizeUrl(url: Column): Column = {
    // Each intermediate is BOUND once per row via a 1-element transform
    // lambda (r17 optimization round): as plain `val`s the steps embedded
    // their producer's whole subtree at every reference — `noFrag` twice
    // in schemeNorm, `clean` in auth (×3 via authNorm) and rebuilt (×2),
    // all multiplied by the caller's url expression — which blew the
    // generated method past the JVM's 64 KB limit (d30: codegen FAILED,
    // the stage ran interpreted AND re-ran each regex per reference).
    // Bound, every regex runs exactly once per row.
    def bind(c: Column)(f: Column => Column): Column =
      element_at(transform(array(c), f), 1)
    bind(regexp_replace(url, "#.*", "")) { noFrag =>
      bind(lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))) { sch =>
        bind(when(sch === "", noFrag)
            .otherwise(concat(sch, lit("://"),
              regexp_replace(noFrag, "^[A-Za-z]+://", "")))) { schemeNorm =>
          // utm params in three separator-anchored passes: every `&utm_…`,
          // then a leading `?utm_…&` (promote the follower), then a lone
          // `?utm_…` — covers any run of consecutive utm params without
          // capture-group replacement
          bind(regexp_replace(regexp_replace(regexp_replace(
              schemeNorm, "&utm_[^&#]*", ""), "\\?utm_[^&#]*&", "?"),
              "\\?utm_[^&#]*", "")) { noUtm =>
            bind(regexp_replace(noUtm, "[?&]+$", "")) { clean =>
              bind(lower(regexp_extract(clean, "^https?://([^/?]*)", 1))) { authL =>
                val authNorm =
                  when(sch === "https", regexp_replace(authL, ":443$", ""))
                    .when(sch === "http", regexp_replace(authL, ":80$", ""))
                    .otherwise(authL)
                val rebuilt = when(sch.isin("http", "https"),
                    concat(sch, lit("://"), authNorm,
                      regexp_replace(clean, "^https?://[^/?]*", "")))
                  .otherwise(clean)
                regexp_replace(rebuilt, "/$", "")
              }
            }
          }
        }
      }
    }
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
