"""URL canonicalization + host/domain extraction — Common-Crawl pipeline ops.

The reference keys records by image URL and dedups on exact key matches
(/root/reference/landlensdb/handlers/cloud.py:430-447 keeps first-by-id);
a web-scale corpus needs the step before that: canonicalizing raw URLs so
near-identical fetches (case-variant hosts, default ports, tracking params,
fragments) collapse to one key. Everything here is pure JVM column math
(regexp + array higher-order functions) — no UDFs, codegen-friendly, and a
deterministic contract a SQL oracle replicates exactly.

Normalization rules (the common subset of public crawler canonicalizers):
  1. strip the ``#fragment``;
  2. lowercase scheme and host;
  3. drop the port when it is the scheme default (http:80 / https:443);
  4. drop ``utm_*`` tracking query params, and the ``?`` if none remain;
  5. empty path -> ``/``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: two-label public suffixes (tiny illustrative subset of the PSL — the full
#: list is a data file a deployment would broadcast-join the same way).
PUBLIC_SUFFIX_2 = [
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "co.in",
    "com.br", "co.nz",
]

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PREFIX_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"  # scheme://hostport, no group


def url_host(url: Column) -> Column:
    """Lowercased host (no port) of an absolute URL; '' if not parseable."""
    no_frag = F.regexp_replace(url, "#.*", "")
    hostport = F.regexp_extract(no_frag, _HOSTPORT_RE, 1)
    return F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))


def registered_domain(host: Column) -> Column:
    """Registrable domain: last 2 labels, or 3 when the last 2 are a known
    public suffix (co.uk etc.); hosts with <= 2 labels pass through."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return F.when(n <= 2, host).otherwise(
        F.when(last2.isin(PUBLIC_SUFFIX_2), last3).otherwise(last2)
    )


def url_normalize(url: Column) -> Column:
    """Canonical URL per the module rules — one pure-column expression."""
    u = F.regexp_replace(url, "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    rest = F.regexp_replace(u, _PREFIX_RE, "")
    host = F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    is_default = ((scheme == F.lit("http")) & (port == F.lit("80"))) | (
        (scheme == F.lit("https")) & (port == F.lit("443"))
    )
    portpart = F.when((port == F.lit("")) | is_default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.when(
        F.length(qs) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(qs, "&"))
    kept = F.filter(params, lambda x: F.substring(x, 1, 4) != F.lit("utm_"))
    querypart = F.when(F.size(kept) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(kept, "&"))
    )
    pathpart = F.when(F.length(path) == 0, F.lit("/")).otherwise(path)
    return F.concat(scheme, F.lit("://"), host, portpart, pathpart, querypart)


def with_url_parts(df, url: str = "url"):
    """Attach norm_url / host / domain columns."""
    u = F.col(url)
    host = url_host(u)
    return (
        df.withColumn("norm_url", url_normalize(u))
        .withColumn("host", host)
        .withColumn("domain", registered_domain(host))
    )


# ---------------------------------------------------------------------------
# deterministic synthetic raw URLs (Spark + SQL twins, oracle parity)
# ---------------------------------------------------------------------------

def synth_url_col(k: Column) -> Column:
    """Messy-but-deterministic raw URL from an integer key: mixed-case scheme
    and host, sometimes a (sometimes-default) port, tracking params, fragment
    — every normalization rule exercised. Integer-derived text only, so the
    SQL twin (:func:`synth_url_sql`) is byte-identical."""
    s = lambda c: c.cast("string")  # noqa: E731
    scheme = F.when(k % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("HTTP"))
    tld = (
        F.when(k % 4 == 0, F.lit(".COM"))
        .when(k % 4 == 1, F.lit(".org"))
        .when(k % 4 == 2, F.lit(".CO.UK"))
        .otherwise(F.lit(".net"))
    )
    port = (
        F.when(k % 5 == 0, F.lit(":443"))
        .when(k % 7 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    q = F.when(
        k % 2 == 0,
        F.when(k % 11 == 0, F.lit("?utm_source=x&utm_medium=y")).otherwise(
            F.concat(
                F.lit("?id="), s(k % 1000), F.lit("&utm_source=x&page="), s(k % 7)
            )
        ),
    ).otherwise(F.lit(""))
    frag = F.when(k % 6 == 0, F.concat(F.lit("#sec"), s(k))).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://WWW.Site"),
        s(k % 97),
        tld,
        port,
        F.lit("/p/"),
        s(k % 13),
        q,
        frag,
    )


def synth_url_sql(k: str) -> str:
    """DuckDB twin of :func:`synth_url_col`."""
    return (
        f"(CASE WHEN {k}%3=0 THEN 'HTTPS' ELSE 'HTTP' END)"
        f" || '://WWW.Site' || cast({k}%97 AS varchar)"
        f" || (CASE {k}%4 WHEN 0 THEN '.COM' WHEN 1 THEN '.org'"
        f"      WHEN 2 THEN '.CO.UK' ELSE '.net' END)"
        f" || (CASE WHEN {k}%5=0 THEN ':443' WHEN {k}%7=0 THEN ':8080' ELSE '' END)"
        f" || '/p/' || cast({k}%13 AS varchar)"
        f" || (CASE WHEN {k}%2=0 THEN"
        f"       CASE WHEN {k}%11=0 THEN '?utm_source=x&utm_medium=y'"
        f"       ELSE '?id=' || cast({k}%1000 AS varchar)"
        f"            || '&utm_source=x&page=' || cast({k}%7 AS varchar) END"
        f"     ELSE '' END)"
        f" || (CASE WHEN {k}%6=0 THEN '#sec' || cast({k} AS varchar) ELSE '' END)"
    )


def normalize_sql_cte(raw_rel: str) -> str:
    """DuckDB CTE chain implementing the exact normalization rules over a
    relation ``raw_rel`` with columns (key, url). Yields relation ``norm``
    with (key, url, norm_url, host, domain)."""
    suf = ", ".join(f"'{x}'" for x in PUBLIC_SUFFIX_2)
    return f"""
    s1 AS (SELECT key, url, regexp_replace(url, '#.*', '') AS u FROM {raw_rel}),
    s2 AS (SELECT key, url,
             lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS hostport,
             regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS rest
           FROM s1),
    s3 AS (SELECT key, url, scheme,
             lower(regexp_replace(hostport, ':[0-9]+$', '')) AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             regexp_extract(rest, '^([^?]*)', 1) AS path,
             regexp_extract(rest, '\\?(.*)$', 1) AS qs
           FROM s2),
    s4 AS (SELECT *,
             CASE WHEN qs = '' THEN CAST([] AS varchar[])
                  ELSE list_filter(string_split(qs, '&'),
                                   x -> substr(x, 1, 4) <> 'utm_') END AS kept,
             string_split(host, '.') AS hp
           FROM s3),
    norm AS (SELECT key, url,
             scheme || '://' || host
             || (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')
                 THEN '' ELSE ':' || port END)
             || (CASE WHEN path = '' THEN '/' ELSE path END)
             || (CASE WHEN len(kept) = 0 THEN ''
                 ELSE '?' || array_to_string(kept, '&') END) AS norm_url,
             host,
             CASE WHEN len(hp) <= 2 THEN host
                  WHEN (hp[len(hp)-1] || '.' || hp[len(hp)]) IN ({suf})
                  THEN hp[len(hp)-2] || '.' || hp[len(hp)-1] || '.' || hp[len(hp)]
                  ELSE hp[len(hp)-1] || '.' || hp[len(hp)] END AS domain
           FROM s4)
    """
