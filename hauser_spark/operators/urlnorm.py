"""URL canonicalization + domain-level dedup rollup (VERDICT r6 task
7a) — the crawl-side companion to document dedup.

A crawl sees the same page under many raw spellings (scheme/host case,
``www.`` prefixes, default ports, tracking params, param order,
fragments, trailing slashes); canonicalizing URLs BEFORE fetch/dedup is
the cheapest dedup stage a pipeline has.  The canonicalizer here is a
pure relational expression chain (regexp part extraction + list
filter/sort — no UDF, whole-stage-codegen friendly, identical SQL
semantics on both engines):

- scheme and host lowercased, leading ``www.`` stripped;
- default ports dropped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- query params split, ``utm_*``/``ref=`` tracking params dropped,
  survivors sorted and re-joined;
- trailing slash stripped (except the root path).

The corpus has NO url column, so the raw URL is a deterministic
IN-QUERY FIXTURE derived from (doc_id, source, lang): each document is
a page crawled ``1 + source_num % 3`` times (sighting j), and
md5(doc_id:j) bits pick that sighting's messy spelling — so the same
page arrives under different case/port/tracking/order/slash variants
and per-domain dup rates vary from 0% to ~67%.  Both engines derive
the identical fixture, so the oracle gates the CANONICALIZER, which is
the operator.  Scale: everything up to the per-domain rollup is a
map-side projection; the rollup is |domains| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (module convention)

from ..tables import load_table

TRACKING_PREFIXES = ("utm_", "ref=")


def _raw_url_sql(md5fn: str) -> str:
    """The messy-URL fixture, spelled once for both engines.

    ``md5fn`` is the per-engine md5-of-doc_id expression (both return
    lowercase hex).  Variant bits are 'hex digit <= 7' tests on
    successive digits — engine-portable, no integer parsing.
    """
    host = "source || '.example.com'"
    page = "doc_id"
    return (
        "concat("
        f"IF(substring({md5fn}, 1, 1) <= '7', 'http', 'HTTP'), '://', "
        f"IF(substring({md5fn}, 2, 1) <= '7', '', 'WWW.'), "
        f"IF(substring({md5fn}, 3, 1) <= '7', {host}, upper({host})), "
        f"IF(substring({md5fn}, 4, 1) <= '7', '', ':80'), "
        f"'/p/', CAST({page} AS STRING), "
        f"IF(substring({md5fn}, 5, 1) <= '7', '', '/'), "
        "'?', "
        f"IF(substring({md5fn}, 6, 1) <= '7', '', "
        "   'utm_source=feed&ref=crawl&'), "
        f"IF(substring({md5fn}, 7, 1) <= '7', "
        f"   concat('id=', CAST({page} AS STRING), '&lang=', lang), "
        f"   concat('lang=', lang, '&id=', CAST({page} AS STRING))), "
        f"IF(substring({md5fn}, 8, 1) <= '7', '', '#frag')"
        ")"
    )


# canonicalization pieces — identical regex TEXT on both engines, so
# no backslash escapes anywhere (Spark SQL strings eat one level of
# backslash, DuckDB strings none — character classes sidestep the trap)
_SCHEME_RE = "^([A-Za-z]+)://"
_HOSTPORT_RE = "^[A-Za-z]+://([^/?#]+)"
_PATH_RE = "^[A-Za-z]+://[^/?#]+([^?#]*)"
_QUERY_RE = "[?]([^#]*)"


def canonical_url_sql(url: str, engine: str) -> str:
    """Canonical form of ``url`` as one SQL expression.

    ``engine`` is 'spark' or 'duckdb' — only the list-function
    spellings differ (filter/array_sort/array_join vs
    list_filter/list_sort/array_to_string); the semantics are
    identical, which is exactly what the oracle gate checks.
    """
    # COALESCE every extract: DuckDB's regexp_extract returns NULL on
    # no-match where Spark returns '' — and DuckDB's concat() SKIPS
    # NULL arguments, so an unguarded NULL query part left a stray '?'.
    scheme = f"lower(coalesce(regexp_extract({url}, '{_SCHEME_RE}', 1), ''))"
    hostport = f"coalesce(regexp_extract({url}, '{_HOSTPORT_RE}', 1), '')"
    host = (
        "regexp_replace(lower(regexp_replace("
        f"{hostport}, ':[0-9]+$', '')), '^www[.]', '')"
    )
    port = f"coalesce(regexp_extract({hostport}, ':([0-9]+)$', 1), '')"
    rawpath = f"coalesce(regexp_extract({url}, '{_PATH_RE}', 1), '')"
    path = (
        f"CASE WHEN {rawpath} = '' OR {rawpath} = '/' THEN '/' "
        f"ELSE regexp_replace({rawpath}, '/$', '') END"
    )
    q = f"coalesce(regexp_extract({url}, '{_QUERY_RE}', 1), '')"
    keep = (
        "x -> x <> '' AND NOT x LIKE 'utm_%' AND NOT x LIKE 'ref=%'"
    )
    # the empty-list join is '' in Spark but NULL in DuckDB
    # (array_to_string([]) -> NULL) — coalesce keeps both engines at ''
    if engine == "spark":
        params = (
            f"coalesce(array_join(array_sort("
            f"filter(split({q}, '&'), {keep})), '&'), '')"
        )
    else:
        params = (
            f"coalesce(array_to_string(list_sort(list_filter("
            f"string_split({q}, '&'), {keep})), '&'), '')"
        )
    keep_port = (
        f"CASE WHEN {port} = '' THEN '' "
        f"WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
        f"WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
        f"ELSE concat(':', {port}) END"
    )
    return (
        f"concat({scheme}, '://', {host}, {keep_port}, {path}, "
        f"CASE WHEN {params} = '' THEN '' "
        f"ELSE concat('?', {params}) END)"
    )


def url_canonical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL dedup scoreboard: raw URL count, distinct raw
    spellings, distinct canonical URLs after normalization, and the
    collapse/dup rates — the table a crawl scheduler reads to size its
    frontier and the first savings line of the dedup cascade."""
    docs = load_table(spark, sf_dir, "documents")
    raw = _raw_url_sql(
        "md5(concat(CAST(doc_id AS STRING), ':', CAST(j AS STRING)))"
    )
    urled = docs.selectExpr(
        "doc_id",
        "source",
        "lang",
        "explode(sequence(0, CAST(substring(source, 4) AS INT) % 3))"
        " AS j",
    ).selectExpr("doc_id", "source", "lang", f"{raw} AS url")
    canon = urled.selectExpr(
        "url", f"{canonical_url_sql('url', 'spark')} AS curl"
    ).selectExpr(
        "url",
        "curl",
        "regexp_extract(curl, '^[a-z]+://([^/?#]+)', 1) AS domain",
    )
    return (
        canon.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("url").alias("n_raw_distinct"),
            F.countDistinct("curl").alias("n_canonical"),
        )
        .selectExpr(
            "domain",
            "CAST(n_urls AS BIGINT) AS n_urls",
            "CAST(n_raw_distinct AS BIGINT) AS n_raw_distinct",
            "CAST(n_canonical AS BIGINT) AS n_canonical",
            "(2 * (n_raw_distinct - n_canonical) * 1000000"
            " + n_raw_distinct) DIV (2 * n_raw_distinct)"
            " AS collapse_ppm",
            "(2 * (n_urls - n_canonical) * 1000000 + n_urls)"
            " DIV (2 * n_urls) AS dup_rate_ppm",
        )
        .orderBy("domain")
    )


QUERIES = {"dedup_url_canonical_rollup": url_canonical_rollup}


def _rollup_oracle() -> str:
    raw = _raw_url_sql(
        "md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR))"
    )
    # DuckDB spells IF as a function too; translate the two
    # engine-specific tokens (integer division, string cast name).
    raw = raw.replace(" DIV ", " // ").replace("AS STRING", "AS VARCHAR")
    canon = canonical_url_sql("url", "duckdb")
    return f"""
    WITH urled AS (
        SELECT doc_id, source, lang, {raw} AS url
        FROM documents,
             unnest(range(0,
                 CAST(substring(source, 4) AS INT) % 3 + 1)) AS t(j)
    ),
    canon AS (
        SELECT url, {canon} AS curl FROM urled
    ),
    dom AS (
        SELECT url, curl,
               regexp_extract(curl, '^[a-z]+://([^/?#]+)', 1) AS domain
        FROM canon
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
           CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
           CAST((2 * (count(DISTINCT url) - count(DISTINCT curl)) * 1000000
                 + count(DISTINCT url)) // (2 * count(DISTINCT url))
                AS BIGINT) AS collapse_ppm,
           CAST((2 * (count(*) - count(DISTINCT curl)) * 1000000 + count(*))
                // (2 * count(*)) AS BIGINT) AS dup_rate_ppm
    FROM dom GROUP BY domain ORDER BY domain
"""


ORACLES = {"dedup_url_canonical_rollup": _rollup_oracle()}
