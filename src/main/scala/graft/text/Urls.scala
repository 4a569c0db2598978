package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing + canonicalization for web-crawl corpora.
  *
  * A crawl sees the same page under many spellings — `http` vs `https`,
  * `www.` vs bare host, trailing slash, and tracking query params
  * (`utm_*`, `ref`, `fbclid`, `gclid`) appended by referrers. Exact-dup
  * and near-dup passes (graft.dedup) then re-fetch and re-score the
  * same content once per spelling, so canonicalizing the URL key is the
  * FIRST dedup stage of a web pipeline — it collapses variants before
  * any text is compared (the reference's key-normalization-before-join
  * discipline, e.g. delinquent_data_submitters.py clean-key joins,
  * applied to the crawl frontier).
  *
  * All pure `Column` compositions of codegen'd built-ins (regexp_extract
  * / regexp_replace / array filter) — per-row, map-side, no shuffle, no
  * UDFs; the patterns avoid lookaround and backreferences so the same
  * regexes run on Java regex and RE2 (DuckDB) identically.
  */
object Urls {

  /** Scheme (`https` in `https://a.b/c`), empty if absent. */
  def scheme(url: Column): Column =
    regexp_extract(url, "^([a-z][a-z0-9+.-]*)://", 1)

  /** Host (authority) — chars after `scheme://` up to `/`, `?` or `#`. */
  def host(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)

  /** Registrable-ish domain: the last two dot-labels of the host
    * (`cdn.docs.example.com` → `example.com`). A public-suffix list
    * would refine multi-label TLDs; two labels is the dependency-free
    * stand-in and is exact for the common gTLDs.
    */
  def registrableDomain(url: Column): Column =
    regexp_extract(host(url), "([^.]+\\.[^.]+)$", 1)

  /** Path component (between host and `?`/`#`); empty for root. */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)", 1)

  /** Raw query string (after `?`, before `#`), empty if absent. The
    * leading `[^#?]*` anchor stops the match from ever starting inside
    * the fragment — `http://a/b#frag?x=1` has NO query (the `?` there
    * belongs to the fragment), which a bare `\?([^#]*)` would miss.
    */
  def query(url: Column): Column =
    regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)

  /** Query with tracking params removed, original param order kept.
    * Array-filter over `&`-split params — no lookahead needed, so the
    * same pattern works under RE2.
    */
  def cleanQuery(url: Column): Column =
    array_join(
      filter(split(query(url), "&"),
        p => !p.rlike("^(utm_[a-z]+|ref|fbclid|gclid)=")),
      "&")

  /** Canonical dedup key: scheme dropped (http/https unify), leading
    * `www.` dropped, trailing slash stripped, tracking params removed.
    * `https://www.a.example.com/d/5/?utm_source=x&id=2` and
    * `http://a.example.com/d/5?id=2` both canonicalize to
    * `a.example.com/d/5?id=2`.
    */
  def canonicalize(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val p = regexp_replace(path(url), "/+$", "")
    val q = cleanQuery(url)
    concat(h, p, when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** One-call parse: struct(scheme, host, domain, path, query_clean,
    * canonical) — project once, reuse the attribute (lambda/regex
    * subtrees re-evaluate per use otherwise).
    */
  def parse(url: Column): Column = struct(
    scheme(url).as("scheme"),
    host(url).as("host"),
    registrableDomain(url).as("domain"),
    path(url).as("path"),
    cleanQuery(url).as("query_clean"),
    canonicalize(url).as("canonical"))
}
