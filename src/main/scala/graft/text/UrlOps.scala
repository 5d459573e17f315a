package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain-level curation — the FineWeb-recipe entry stage (Penedo
  * et al. 2024, arXiv:2406.17557: URL-level filtering and per-domain
  * balancing precede every text heuristic): canonicalize URLs so the
  * same page never counts twice (RFC 3986 §6 normalization plus the
  * tracking-parameter strip every crawler pipeline applies), extract
  * the registrable domain, and cap any single domain's share of the
  * corpus.
  *
  * Normalization rules (pinned, replayed verbatim by the oracle):
  *   1. scheme and host lowercase; path case PRESERVED (paths are
  *      case-significant per RFC 3986 §6.2.2.1)
  *   2. default port stripped (http:80, https:443); other ports kept
  *   3. leading "www." stripped from the host
  *   4. fragment removed
  *   5. tracking params removed (utm_*, fbclid, gclid, ref); the
  *      survivors keep their original order (no reorder — param order
  *      can be semantic)
  *   6. trailing slashes stripped from the path; empty path → "/"
  *
  * Scale shape: normalization is pure map-side string work (regexes,
  * splits — whole-stage codegen'd, composes into the scan stage);
  * the registrable-domain extraction is a config-sized CASE chain
  * generated from the suffix list (data, not code); the share cap is
  * ONE domain-keyed aggregation plus a 1-row broadcast total attach.
  * Nothing here shuffles more than once at any corpus size. */
object UrlOps {

  /** Public-suffix seed list — config DATA (swap in the full Mozilla
    * PSL at production scale); multi-label suffixes MUST sort before
    * their single-label tails so "x.co.uk" never resolves via "uk". */
  val defaultSuffixes: Seq[String] = Seq(
    "co.uk", "com.au", "ac.uk", "co.jp",
    "com", "org", "net", "io", "edu", "gov")

  private val trackRe = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|ref)="

  /** (id, url, url_norm, domain): the parse pipeline materialized once
    * per row — scheme/host/port/path/query pulled apart with anchored
    * regexes, re-assembled under the six rules above. Absolute
    * http(s)-style URLs expected; a row without "://" degrades to
    * best-effort (empty scheme, whole string as authority). */
  def normalizeUrls(df: DataFrame, idCol: String, urlCol: String,
      suffixes: Seq[String] = defaultSuffixes): DataFrame = {
    val u = col(urlCol)
    val parts = df
      .withColumn("__scheme",
        lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)))
      .withColumn("__aft",
        regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""))
      .withColumn("__hostport", regexp_extract(col("__aft"), "^([^/?#]*)", 1))
      .withColumn("__host",
        lower(regexp_extract(col("__hostport"), "^([^:]*)", 1)))
      .withColumn("__port",
        regexp_extract(col("__hostport"), ":([0-9]+)$", 1))
      .withColumn("__rest", expr("substr(__aft, length(__hostport) + 1)"))
      // rule 4 first: drop the fragment BEFORE parsing path/query, so a
      // '?' hiding inside a fragment ("/path#a?b=1") can never be
      // mis-read as a query string
      .withColumn("__nofrag", regexp_replace(col("__rest"), "#.*$", ""))
      .withColumn("__path0", regexp_extract(col("__nofrag"), "^([^?#]*)", 1))
      .withColumn("__query0",
        regexp_extract(col("__nofrag"), "\\?([^#]*)", 1))
      .withColumn("__host2", regexp_replace(col("__host"), "^www\\.", ""))
      .withColumn("__pathstrip", regexp_replace(col("__path0"), "/+$", ""))
      .withColumn("__path",
        when(col("__path0") === "" || col("__pathstrip") === "", lit("/"))
          .otherwise(col("__pathstrip")))
      .withColumn("__q", array_join(
        filter(split(col("__query0"), "&"), p => !p.rlike(trackRe)), "&"))
    val portKeep = col("__port") =!= "" &&
      !((col("__scheme") === "http" && col("__port") === "80") ||
        (col("__scheme") === "https" && col("__port") === "443"))
    parts.select(col(idCol), u.as("url"),
      concat(col("__scheme"), lit("://"), col("__host2"),
        when(portKeep, concat(lit(":"), col("__port"))).otherwise(lit("")),
        col("__path"),
        when(col("__q") =!= "", concat(lit("?"), col("__q")))
          .otherwise(lit(""))).as("url_norm"),
      registrableDomain(col("__host2"), suffixes).as("domain"))
  }

  /** Longest-matching-suffix registrable domain: label + "." + suffix
    * for the first (longest-first) suffix the host ends with; hosts
    * matching no suffix fall back to their last two labels (or the
    * bare host when it has no dot). The chain is generated from the
    * suffix SEQ — config-sized, codegen'd CASE, zero joins. */
  def registrableDomain(host: Column,
      suffixes: Seq[String] = defaultSuffixes): Column = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), -s.length))
    val fallback = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val base = when(fallback =!= "", fallback).otherwise(host)
    ordered.foldRight(base) { (s, acc) =>
      val esc = s.replace(".", "\\.")
      when(host.endsWith("." + s),
        regexp_extract(host, "([^.]+\\." + esc + ")$", 1))
        .otherwise(acc)
    }
  }

  /** Per-domain share-cap report (the FineWeb rebalancing table):
    * quota = floor(total · capMicro / 10⁶) docs per domain; output one
    * row per domain — (domain, n_docs, quota, n_kept, n_dropped,
    * capped). Integer end-to-end: quota by integral division, so the
    * report hashes exactly on any engine.
    *
    * Envelope: total · capMicro is computed in long — exact while
    * total ≤ 9.2·10¹² docs at capMicro ≤ 10⁶; widen to decimal(38)
    * beyond (graft.tools.NumericEnvelopes pins the bound). */
  def domainCaps(df: DataFrame, domainCol: String,
      capMicro: Long): DataFrame = {
    require(capMicro >= 0 && capMicro <= 1000000L,
      "capMicro is a share in [0, 1e6]")
    val counts = df.groupBy(domainCol).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum("n_docs").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col(domainCol), col("n_docs"),
        expr(s"(__total * ${capMicro}L) div 1000000L").as("quota"))
      .withColumn("n_kept", least(col("n_docs"), col("quota")))
      .withColumn("n_dropped", col("n_docs") - col("n_kept"))
      .withColumn("capped", col("n_docs") > col("quota"))
  }

  /** Doc-level cap selection: within each domain docs rank by
    * `orderCol` (ascending — deterministic; use the stable id) and
    * keep rank ≤ quota. One window over the domain key; the quota
    * attach is the same 1-row broadcast. */
  def capDocuments(df: DataFrame, domainCol: String, orderCol: String,
      capMicro: Long): DataFrame = {
    val quotas = domainCaps(df, domainCol, capMicro)
      .select(col(domainCol), col("quota"))
    df.join(broadcast(quotas), Seq(domainCol))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(domainCol).orderBy(orderCol)).cast("long"))
      .withColumn("kept", col("__rk") <= col("quota"))
      .drop("__rk", "quota")
  }

  // ---- registered fixture + oracles -----------------------------------

  /** Deterministic URL per document — both engines construct the SAME
    * string from doc_id (the synthTexturePng convention), exercising
    * every rule: upper/lower scheme, WWW., default and non-default
    * ports, empty/trailing-slash paths, tracking-only and mixed query
    * strings, fragments, multi-label suffixes, and a hot "hub" domain
    * for the cap gate. */
  private def fixtureUrl(id: Column): Column = {
    def m(k: Int) = pmod(id, lit(k))
    val scheme = when(m(3) === 0, lit("http"))
      .when(m(3) === 1, lit("HTTP")).otherwise(lit("https"))
    val www = when(m(2) === 0, lit("WWW.")).otherwise(lit(""))
    val site = when(m(3) === 0, lit("hub"))
      .otherwise(concat(lit("Site"), m(10).cast("string")))
    val tld = when(m(4) === 0, lit("com")).when(m(4) === 1, lit("org"))
      .when(m(4) === 2, lit("co.uk")).otherwise(lit("io"))
    val port = when(m(5) === 0,
        when(m(3) === 2, lit(":443")).otherwise(lit(":80")))
      .when(m(5) === 1, lit(":8080")).otherwise(lit(""))
    val path = when(m(11) === 0, lit(""))
      .otherwise(concat(lit("/P"), m(7).cast("string"),
        when(m(6) === 0, lit("/")).otherwise(lit(""))))
    val query = when(m(9) === 0, lit("?utm_source=a&x=1&utm_campaign=b"))
      .when(m(9) === 1, lit("?x=1&y=2"))
      .when(m(9) === 2, lit("?fbclid=zz"))
      .when(m(9) === 3, lit("?gclid=g&x=1"))
      .when(m(9) === 4, lit("?ref=r")).otherwise(lit(""))
    val frag = when(m(8) === 0, lit("#Sec1")).otherwise(lit(""))
    concat(scheme, lit("://"), www, site, lit("."), tld, port, path,
      query, frag)
  }

  /** The same construction in DuckDB SQL (CTE `u(doc_id, url)`). */
  private def fixtureUrlCte: String =
    """u AS (SELECT doc_id,
      (CASE WHEN doc_id % 3 = 0 THEN 'http'
            WHEN doc_id % 3 = 1 THEN 'HTTP' ELSE 'https' END)
      || '://'
      || (CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END)
      || (CASE WHEN doc_id % 3 = 0 THEN 'hub'
               ELSE 'Site' || CAST(doc_id % 10 AS VARCHAR) END)
      || '.'
      || (CASE WHEN doc_id % 4 = 0 THEN 'com'
               WHEN doc_id % 4 = 1 THEN 'org'
               WHEN doc_id % 4 = 2 THEN 'co.uk' ELSE 'io' END)
      || (CASE WHEN doc_id % 5 = 0 THEN
                 (CASE WHEN doc_id % 3 = 2 THEN ':443' ELSE ':80' END)
               WHEN doc_id % 5 = 1 THEN ':8080' ELSE '' END)
      || (CASE WHEN doc_id % 11 = 0 THEN ''
               ELSE '/P' || CAST(doc_id % 7 AS VARCHAR)
                 || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) END)
      || (CASE WHEN doc_id % 9 = 0 THEN '?utm_source=a&x=1&utm_campaign=b'
               WHEN doc_id % 9 = 1 THEN '?x=1&y=2'
               WHEN doc_id % 9 = 2 THEN '?fbclid=zz'
               WHEN doc_id % 9 = 3 THEN '?gclid=g&x=1'
               WHEN doc_id % 9 = 4 THEN '?ref=r' ELSE '' END)
      || (CASE WHEN doc_id % 8 = 0 THEN '#Sec1' ELSE '' END) AS url
      FROM documents)"""

  /** The registrable-domain CASE chain rendered for the oracle from
    * the SAME suffix seq the Spark side folds over. */
  private def domainSqlExpr(hostExpr: String,
      suffixes: Seq[String]): String = {
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), -s.length))
    val fb = s"regexp_extract($hostExpr, '([^.]+\\.[^.]+)$$', 1)"
    val base = s"(CASE WHEN $fb <> '' THEN $fb ELSE $hostExpr END)"
    ordered.foldRight(base) { (s, acc) =>
      val esc = s.replace(".", "\\.")
      s"""(CASE WHEN $hostExpr LIKE '%.$s'
         THEN regexp_extract($hostExpr, '([^.]+\\.$esc)$$', 1)
         ELSE $acc END)"""
    }
  }

  /** Normalization replay CTEs ending in
    * `norm(doc_id, url, url_norm, domain)`. */
  private[graft] def normCtes: String =
    s"""$fixtureUrlCte,
      n1 AS (SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS aft
        FROM u),
      n2 AS (SELECT *, regexp_extract(aft, '^([^/?#]*)', 1) AS hostport
        FROM n1),
      n3 AS (SELECT *,
        lower(regexp_extract(hostport, '^([^:]*)', 1)) AS host,
        regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
        substr(aft, len(hostport) + 1) AS rest FROM n2),
      n4 AS (SELECT *,
        regexp_extract(regexp_replace(rest, '#.*$$', ''),
          '^([^?#]*)', 1) AS path0,
        regexp_extract(regexp_replace(rest, '#.*$$', ''),
          '\\?([^#]*)', 1) AS query0 FROM n3),
      n5 AS (SELECT *,
        regexp_replace(host, '^www\\.', '') AS host2,
        CASE WHEN path0 = '' OR regexp_replace(path0, '/+$$', '') = ''
             THEN '/' ELSE regexp_replace(path0, '/+$$', '') END AS path,
        array_to_string(list_filter(string_split(query0, '&'),
          p -> NOT regexp_matches(p, '$trackRe')), '&') AS q
        FROM n4),
      norm AS (SELECT doc_id, url,
        scheme || '://' || host2
        || (CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                  OR (scheme = 'https' AND port = '443'))
                 THEN ':' || port ELSE '' END)
        || path
        || (CASE WHEN q <> '' THEN '?' || q ELSE '' END) AS url_norm,
        ${domainSqlExpr("host2", defaultSuffixes)} AS domain
        FROM n5)"""

  /** q_t_url_norm: every doc's fixture URL normalized + its
    * registrable domain, hash-gated against the full SQL replay. */
  private val tUrlNorm = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), fixtureUrl(col("doc_id")).as("__url"))
      normalizeUrls(docs, "doc_id", "__url").orderBy("doc_id")
    },
    Some(s"""WITH $normCtes
      SELECT doc_id, url, url_norm, domain FROM norm ORDER BY doc_id"""))

  /** q_p33_domain_caps: the share-cap report over the fixture
    * domains at a 4 % cap — the skewed "hub" domains cap, the long
    * tail does not, and every count/quota is exact integers. */
  private val pDomainCaps = Q(
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), fixtureUrl(col("doc_id")).as("__url"))
      domainCaps(normalizeUrls(docs, "doc_id", "__url"), "domain",
        capMicro = 40000L)
        .orderBy("domain")
    },
    Some(s"""WITH $normCtes,
      c AS (SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM norm GROUP BY 1),
      t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c)
      SELECT domain, n_docs,
        (t.total * 40000) // 1000000 AS quota,
        least(n_docs, (t.total * 40000) // 1000000) AS n_kept,
        n_docs - least(n_docs, (t.total * 40000) // 1000000) AS n_dropped,
        n_docs > (t.total * 40000) // 1000000 AS capped
      FROM c, t ORDER BY domain"""))

  val queries: Map[String, Q] = Map(
    "q_t_url_norm" -> tUrlNorm,
    "q_p33_domain_caps" -> pDomainCaps)
}
