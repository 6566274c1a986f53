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

  /** Registrable-ish domain: lowercased host, port and leading `www.`
    * stripped. (True eTLD+1 needs the public-suffix list; `www.` covers
    * the dominant crawl alias and keeps the rule oracle-replayable.)
    */
  def domain(url: Column): Column = {
    val host = regexp_replace(
      lower(regexp_extract(url, "^[^:/?#]+://([^/?#]+)", 1)), ":[0-9]+$", "")
    val bare = regexp_replace(host, "^www\\.", "")
    when(bare === "", lit(null).cast("string")).otherwise(bare)
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
