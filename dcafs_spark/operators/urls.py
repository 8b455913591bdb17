"""URL canonicalization + URL-keyed dedup — the first stage of every
CommonCrawl-style corpus pipeline (a crawl sees the same page as
`HTTP://WWW.Site.com:80/a/?utm_source=feed` and `https://site.com/a`;
dedup must key on the canonical form, not the raw string).

Reference parity: the reference has no crawler stage — this is part of
the LLM-data-pipeline tier (SURVEY §6 extensions), same class as the
dedup/quality operators. Canonicalization follows the common subset of
RFC 3986 §6 syntax-based normalization plus the de-facto crawl rules:

  * scheme and host lowercase; fragment dropped
  * leading ``www.`` stripped from the host
  * default port stripped (``:80`` for http, ``:443`` for https)
  * trailing slashes stripped from the path
  * tracking parameters (``utm_*``) removed from the query; an
    all-tracking query disappears entirely; remaining params keep
    their original order (sorting is NOT applied — ``?a=1&b=2`` and
    ``?b=2&a=1`` are conservatively distinct). Param names match
    case-SENSITIVELY (``UTM_SOURCE`` survives): query keys are
    case-sensitive per RFC 3986, tracking emitters lowercase them in
    practice, and the conservative direction for a dedup key is to
    keep, not merge

Scale shape (100 TB): canonicalization is a pure NARROW map — a chain
of regexp extracts over one string column, no shuffle, no UDF, fully
inside whole-stage codegen. URL dedup then shuffles only a 16-byte
md5 of the canonical form (the exact-dedup convention from
`operators/dedup.py`): page bodies never enter the dedup shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dcafs_spark.runtime import checkpoint

_SCHEME_RX = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RX = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RX = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"


def url_parts(url: Column) -> Column:
    """(canon, domain) struct for a URL column — see the module
    docstring for the exact normalization rules. Everything is
    Catalyst regexp/string expressions; the SQL oracle replicates the
    identical chain in DuckDB, so canonical forms (and therefore dedup
    groups) match cross-engine byte-for-byte."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RX, 1))
    hostport = F.lower(F.regexp_extract(nofrag, _HOST_RX, 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_extract(nofrag, _REST_RX, 1)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.when(
        rest.contains("?"), F.regexp_replace(rest, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&", -1), lambda p: (p != "") & ~p.startswith("utm_")
    )
    canonq = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canonq != "", F.concat(F.lit("?"), canonq)).otherwise(F.lit("")),
    )
    return F.struct(canon.alias("canon"), host.alias("domain"))


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """First-seen-wins dedup on the canonical URL: one row per input
    row with (id, canon, domain, n_dupes, kept) — kept is true for the
    lowest id in each canonical group (deterministic under
    repartitioning).

    One checkpointed scan feeds both the group rollup and the join
    back; the only shuffle key is the 16-byte md5 of the canonical
    form, and the rollup carries two longs per group."""
    parts = df.select(
        F.col(id_col), F.col(url_col).alias("_url"), url_parts(F.col(url_col)).alias("_p")
    ).select(
        id_col,
        F.col("_p.canon").alias("canon_url"),
        F.col("_p.domain").alias("domain"),
        F.md5("_p.canon").alias("_k"),
    )
    parts = checkpoint(parts)
    grp = parts.groupBy("_k").agg(
        F.min(id_col).alias("_owner"), F.count(F.lit(1)).alias("n_dupes")
    )
    return parts.join(grp, "_k").select(
        id_col,
        "canon_url",
        "domain",
        F.col("n_dupes").cast("long").alias("n_dupes"),
        (F.col(id_col) == F.col("_owner")).alias("kept"),
    )
