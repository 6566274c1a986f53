package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL curation for web-crawl corpora: canonicalization, registrable-
  * domain extraction, canonical-URL dedup, and per-domain document caps.
  *
  * These are the standard CommonCrawl-pipeline gates (CCNet, C4,
  * RefinedWeb all dedup by canonical URL and bound per-host volume so a
  * single template-heavy site cannot dominate the training mix). The
  * reference lakehouse has no URL layer — this extends the curation
  * operator set the way `C4Filter`/`ParagraphDedup` do.
  *
  * Scale notes (100 TB):
  *  - [[canonicalize]] / [[domain]] are map-only column expressions —
  *    zero shuffle, applied at scan. The tracking-param strip is the one
  *    interpreted HOF (`filter` over split params); everything else is
  *    codegen'd regexp/concat. Still map-side only.
  *  - [[dedupByUrl]] is one hash-aggregate on the canonical URL — the
  *    exact-dedup shape ([[TextDedup.exact]]), partial-aggregable.
  *  - [[capPerDomain]] is one shuffle on domain + a bounded window. A
  *    pathological domain holding half the corpus makes that partition
  *    hot; `maxDomainRows` fails fast naming the offender (the
  *    [[MixtureSample]] guard pattern) rather than spilling silently.
  */
object UrlOps {

  /** Query parameters that never affect content identity. */
  val TrackingParams: Seq[String] =
    Seq("utm_[^=&]*", "gclid", "fbclid", "msclkid", "ref", "mc_eid")

  private val trackingRe = s"^(?:${TrackingParams.mkString("|")})="

  /** Scheme-lowercased, host-lowercased, default-port-stripped,
    * fragment-stripped, tracking-param-stripped, trailing-slash-
    * normalized canonical form. Non-URL strings (no `scheme://`)
    * canonicalize to NULL so they can be quarantined, not silently kept.
    */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rawHost = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(rawHost, ":80$", ""))
      .when(scheme === "https", regexp_replace(rawHost, ":443$", ""))
      .otherwise(rawHost)
    val path = regexp_replace(
      regexp_extract(url, "^[^:/?#]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val keptParams = filter(split(query, "&"),
      p => !(p rlike trackingRe) && p =!= "")
    val queryPart = when(size(keptParams) > 0,
        concat(lit("?"), array_join(keptParams, "&")))
      .otherwise(lit(""))
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, queryPart))
  }

  /** Vendored snapshot SUBSET of the Public Suffix List
    * (publicsuffix.org, ICANN section — public data): the two-label
    * public suffixes covering the dominant ccTLD registry conventions,
    * so `a.b.co.uk` resolves to registrable domain `b.co.uk` instead of
    * `co.uk`. Single-label suffixes (com, org, uk, …) need no entry —
    * they are the default rule (`eTLD+1 = last two labels`). Snapshot
    * limits, documented honestly: three-label PSL entries (e.g.
    * `act.edu.au`), wildcard rules (`*.ck`) and exceptions (`!www.ck`)
    * are out of scope — hosts under them fall back to the default rule.
    */
  val MultiLabelSuffixes: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "net.uk", "ltd.uk", "plc.uk", "ac.uk",
    "gov.uk", "sch.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    // South Africa
    "co.za", "org.za", "net.za", "web.za", "gov.za", "ac.za", "edu.za",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    // India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "nic.in",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // Korea
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    // Taiwan / Hong Kong / Singapore / Malaysia
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    // Indonesia / Thailand / Vietnam / Philippines
    "co.id", "net.id", "or.id", "web.id", "ac.id", "go.id", "sch.id",
    "co.th", "net.th", "or.th", "go.th", "ac.th", "in.th",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    // Mexico / Argentina / Colombia / Peru / Venezuela / Uruguay
    "com.mx", "org.mx", "net.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "co.ve", "gob.ve", "edu.ve",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy",
    // Turkey / Ukraine / Poland (registry second-levels)
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr", "web.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "biz.pl", "waw.pl",
    // Israel / Egypt / Saudi Arabia / Pakistan / Bangladesh
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "gok.pk",
    "com.bd", "net.bd", "org.bd", "gov.bd", "edu.bd", "ac.bd",
    // Kenya / Nigeria / Ghana
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "name.ng",
    "com.gh", "org.gh", "gov.gh", "edu.gh")

  /** Registrable domain (eTLD+1): lowercased host, port stripped, then
    * the longest matching public suffix from [[MultiLabelSuffixes]] plus
    * one label — `a.b.co.uk` → `b.co.uk`, `www.example.com` →
    * `example.com` (the default rule needs no `www.`-strip: the last two
    * labels already drop every subdomain alias). Pure literal-set column
    * expression — map-only, zero shuffle, constant-folded membership.
    * A bare public suffix (`https://co.uk/`) has no registrable domain →
    * NULL; IP-address hosts group as themselves; single-label hosts
    * (`localhost`) pass through.
    */
  def domain(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[^:/?#]+://([^/?#]+)", 1)), ":[0-9]+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    val suffixes = lit(MultiLabelSuffixes.toArray)
    when(host === "", lit(null).cast("string"))
      .when(host.rlike("^[0-9.]+$"), host)
      .when(n >= 3 && array_contains(suffixes, last2), last3)
      .when(n === 2 && array_contains(suffixes, last2), lit(null).cast("string"))
      .when(n >= 2, last2)
      .otherwise(host)
  }

  /** Keep exactly one row per canonical URL — the one with the smallest
    * `idCol` (deterministic first-crawl winner). Rows whose URL fails to
    * canonicalize (NULL) are dropped. One hash-aggregate + semi-join
    * back, the [[TextDedup.exact]] shape.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val canon = df.withColumn("canonical_url", canonicalize(col(urlCol)))
      .filter(col("canonical_url").isNotNull)
    val winners = canon.groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as(idCol))
    canon.join(winners, Seq("canonical_url", idCol))
  }

  /** Keep at most `cap` rows per domain, preferring high `priorityCol`
    * (ties broken by `idCol` ascending — deterministic). Output adds
    * `domain` and `domain_rank`.
    *
    * @param maxDomainRows fail-fast bound on any single domain's row
    *        count, checked on the pre-window aggregate (which rides the
    *        same shuffle partitioning the window needs — no extra
    *        exchange at 100 TB beyond the counts' map-side combine).
    */
  def capPerDomain(
      df: DataFrame,
      urlCol: String,
      idCol: String,
      priorityCol: String,
      cap: Int,
      maxDomainRows: Long = 100000000L): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val withDomain = df.withColumn("domain", domain(col(urlCol)))
      .filter(col("domain").isNotNull)
    val hot = withDomain.groupBy(col("domain"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > maxDomainRows)
      .orderBy(col("cnt").desc)
      .head(1)
    if (hot.nonEmpty) {
      throw new IllegalArgumentException(
        s"capPerDomain: domain '${hot(0).getString(0)}' has " +
          s"${hot(0).getLong(1)} rows > maxDomainRows=$maxDomainRows; " +
          "pre-aggregate or raise the bound")
    }
    val w = Window.partitionBy(col("domain"))
      .orderBy(col(priorityCol).desc, col(idCol))
    withDomain.withColumn("domain_rank", row_number().over(w))
      .filter(col("domain_rank") <= cap)
  }
}
