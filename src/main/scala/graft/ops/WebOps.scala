package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain-level curation operators — the web-corpus half of a
  * cleaning pipeline (the public C4 / RefinedWeb / Dolma recipes all
  * open with them): host extraction, registered-domain reduction
  * (public-suffix-lite), domain blocklists, and the RefinedWeb-style
  * per-domain page cap that stops one crawl-heavy site from dominating
  * the training mix.
  *
  * Everything is codegen'd column expressions (`regexp_extract`,
  * `split`, `slice`) over one scan — no UDFs — and every decision is
  * deterministic and engine-replayable (the caps rank by the portable
  * content fingerprint, the same diversity key the sampling family
  * uses), so a DuckDB oracle can pin the full keep/drop set.
  *
  * The reference engine has no URL operators (its expression language is
  * `=`/`AND` over scalars, reference `sql2ra/functionality.py:76`); this
  * module is part of the training-data-pipeline breadth layer.
  */
object WebOps {

  /** Host component of a URL: `scheme://[userinfo@]host[:port]/…` →
    * the host capture, lowercased; userinfo, port, path, query and
    * fragment all stripped by the character classes. One
    * `regexp_extract` (codegen'd, single scan); the DuckDB oracle runs
    * the IDENTICAL pattern — it uses only non-capturing groups and
    * negated classes, semantics shared by java.util.regex and RE2.
    * Non-URLs (no `scheme://`) yield the empty string, never an error.
    */
  val HostPattern: String =
    "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

  def urlHost(url: Column): Column =
    lower(regexp_extract(url, HostPattern, 1))

  /** Multi-label public suffixes honored by [[registeredDomain]] — the
    * public-suffix-LITE posture: the real Mozilla PSL is ~10k rules and
    * ships as data; the operator takes the rule SET as config so a
    * deployment can load the full list, and defaults to the handful of
    * common two-label suffixes that make the reduction logic honest
    * (a `last-two-labels` heuristic calls every `*.co.uk` site one
    * domain — exactly the failure a per-domain cap must not have).
    */
  val DefaultMultiSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "com.au", "com.br",
    "github.io")

  /** Registered (pay-level) domain of a host: the last two labels,
    * or the last THREE when the last two form a configured public
    * suffix (`site7.co.uk`, not `co.uk`; `user.github.io`, not
    * `github.io`). Hosts with a single label (localhost, bare TLD)
    * pass through unchanged. Pure `split`/`slice`/`when` — `slice`
    * with a negative start clamps to empty below 0, so no branch can
    * index out of range under ANSI.
    */
  def registeredDomain(
      host: Column,
      multiSuffixes: Seq[String] = DefaultMultiSuffixes): Column = {
    val parts = split(host, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", slice(parts, -2, 2))
    val last3 = concat_ws(".", slice(parts, -3, 3))
    when(n >= 3 && last2.isin(multiSuffixes: _*), last3)
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Drop every document whose registered domain is on the blocklist.
    * Config-sized lists (the usual case: curated spam/SEO/adult domain
    * lists) compile to a literal `IN` — a scan predicate, pushed like
    * any other filter, zero joins. For blocklists too large to inline
    * (a 100M-domain reputation feed) use [[domainBlocklistDf]].
    */
  def domainBlocklist(df: DataFrame, domain: Column,
                      blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df else df.filter(!domain.isin(blocked: _*))

  /** Relation-sized blocklist variant: LEFT ANTI join against a
    * `(domain)` relation. Spark broadcasts it when it fits
    * (`autoBroadcastJoinThreshold`), else hashes both sides on the
    * domain key — either way the corpus is filtered in one pass with no
    * driver-side materialization. OpsSpec pins ≡ the literal-IN form.
    */
  def domainBlocklistDf(df: DataFrame, domain: Column,
                        blocked: DataFrame): DataFrame = {
    val b = blocked.toDF("__blocked_domain")
    df.withColumn("__dom_bl", domain)
      .join(b, col("__dom_bl") === col("__blocked_domain"), "left_anti")
      .drop("__dom_bl")
  }

  /** RefinedWeb-style per-domain page cap: keep at most `n` documents
    * of each registered domain, chosen deterministically by the salted
    * portable content fingerprint (ties to the smaller id) — the same
    * diversity key the sampling family uses, so byte-identical pages
    * rank adjacently and reruns are byte-identical.
    *
    * Scale shape: ONE corpus scan into a per-domain `row_number` rank
    * filtered at `n`, which Spark plans with map-side
    * `WindowGroupLimit(Partial)` — every input partition is pruned to
    * its own top-`n` per domain BEFORE the single domain-key exchange,
    * so the shuffle carries at most n×partitions rows per domain
    * regardless of how crawl-heavy the domain is (the skew that
    * motivates the cap is exactly the skew the pruning absorbs;
    * PlanSpec pins the partial/final pair and the single exchange).
    * Domain cardinality is UNBOUNDED — nothing is counted to the
    * driver or broadcast (the [[TextOps.stratifiedSample]] two-phase
    * prune needs its maxStrata driver bound; a per-domain cap at web
    * scale is precisely the workload that bound exists to reject).
    *
    * Output: the input columns plus `domain`.
    */
  def perDomainCap(df: DataFrame, domain: Column, idCol: String,
                   textCol: String, n: Int): DataFrame = {
    require(n > 0, s"perDomainCap: n must be positive, got $n")
    val clash = Seq("domain", "__key", "__rnk")
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"perDomainCap adds columns ${clash.mkString(", ")} that already " +
        "exist in the input — rename or drop them first")
    val key = TextOps.fingerprint(
      concat(lit("domcap:"), coalesce(col(textCol).cast("string"), lit(""))))
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("__key").asc, col(idCol).asc)
    df.withColumn("domain", domain)
      .withColumn("__key", key)
      .withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= n)
      .drop("__key", "__rnk")
  }

  /** Query parameters stripped by [[urlCanonicalize]] — REGEX fragments
    * matched against the full `key` or `key=value` unit (anchored by the
    * caller): the common cross-site tracking/attribution params whose
    * presence hides byte-identical pages from URL-keyed dedup. A
    * deployment extends the list the way it loads a full public-suffix
    * list for [[registeredDomain]] — it is config, not code.
    */
  val DefaultTrackingParams: Seq[String] = Seq(
    "utm_[a-z]+", "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref")

  /** Canonical form of a URL — the key for URL-level deduplication (the
    * crawl-frontier / CommonCrawl-index dedup that runs BEFORE content
    * dedup: the same page fetched as `HTTP://Site.com:80/p?utm_source=x#t`
    * and `http://site.com/p` must collide). Normalizations, each the
    * standard RFC 3986 §6 safe set plus tracking-param removal:
    *
    *  - scheme and host lowercased (case-insensitive per RFC; path and
    *    query stay case-SENSITIVE and untouched);
    *  - userinfo stripped (never identifies the resource);
    *  - default ports dropped (`:80` for http, `:443` for https; any
    *    other port kept);
    *  - fragment stripped (client-side only);
    *  - tracking query params removed (`trackingParams`, matched
    *    anchored against each `key[=value]` unit), OTHER params kept in
    *    their original ORDER (param order is significant per RFC — a
    *    reorder-canonicalization would conflate distinct resources);
    *  - empty path canonicalized to `/`; a query emptied by the
    *    tracking cut loses its `?`;
    *  - bracketed IPv6 authorities (`[2001:db8::1]`, with or without a
    *    port) keep the whole bracketed literal as the host — the
    *    address's colons are never mistaken for the port delimiter, so
    *    distinct IPv6 hosts never conflate (OpsSpec pins it).
    *
    * Non-URLs (no `scheme://`) pass through UNCHANGED — identity, never
    * an error (the [[urlHost]] posture). One scan of codegen'd regex +
    * array expressions; the per-unit tracking filter is the only
    * higher-order function and runs over the handful of params a URL
    * carries, never the corpus. Every step replays in DuckDB
    * (regexp_extract / list_filter / list_aggr), so canonical keys are
    * oracle-pinned byte-for-byte.
    */
  def urlCanonicalize(
      url: Column,
      trackingParams: Seq[String] = DefaultTrackingParams): Column = {
    val schemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
    val scheme = lower(regexp_extract(url, schemeRe, 1))
    // authority after optional userinfo, WITH any port
    val auth = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)", 1)
    // bracketed IPv6 authorities first ([2001:db8::1] — the colons are
    // the address, not a port delimiter), else everything to the first
    // ':'; alternation order is match preference in both Java regex and
    // DuckDB's RE2, so the one pattern replays identically
    val host = lower(regexp_extract(auth, "^(\\[[^\\]]*\\]|[^:]+)", 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    // everything after the authority: path[?query][#fragment]
    val rest = regexp_replace(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    val path = regexp_extract(noFrag, "^([^?]*)", 1)
    val pathC = when(path === "", lit("/")).otherwise(path)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val trackRe = "^(?:" + trackingParams.mkString("|") + ")(?:=.*)?$"
    val kept = filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike(trackRe))
    val queryPart = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    when(regexp_extract(url, schemeRe, 1) === "", url)
      .otherwise(concat(scheme, lit("://"), host, portPart, pathC,
        queryPart))
  }

  /** URL-keyed exact dedup: group by [[urlCanonicalize]], keep the
    * smallest id (the [[graft.ops.Dedup.exactByKey]] keeper rule),
    * report the copy count. Output: `(canon_url, keeper_id, n_copies)`.
    * One key shuffle — the crawl-frontier dedup pass at any scale.
    */
  def dedupByCanonicalUrl(
      df: DataFrame, urlCol: String, idCol: String,
      trackingParams: Seq[String] = DefaultTrackingParams): DataFrame =
    df.select(urlCanonicalize(col(urlCol), trackingParams).as("canon_url"),
        col(idCol))
      .groupBy(col("canon_url"))
      .agg(min(col(idCol)).as("keeper_id"),
        count(lit(1)).as("n_copies"))
}
