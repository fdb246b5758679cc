"""URL canonicalization + URL-level dedup — the step a crawl pipeline
runs BEFORE content dedup (FineWeb / CCNet shape: the same page is
captured under scheme/case/port/tracking-param/fragment variants, and
URL-level dedup removes the bulk re-crawls for cents before any text is
shingled). Composes with ``sources.warc_source`` (whose ``target_uri``
column is exactly this input).

Pure Column expressions end to end — no UDFs, engine-portable, so the
DuckDB oracle replays normalization verbatim. Canonicalization rules
(the conservative, semantics-preserving subset):

- scheme and host lowercased (RFC 3986 §6.2.2.1); path case KEPT;
- default ports stripped ONLY when they match the scheme (``:80`` for
  http, ``:443`` for https — ``http://h:443/`` is a distinct origin and
  must stay distinct);
- fragment dropped (never sent to the server);
- tracking parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``) and the remaining query parameters SORTED (order-insensitive
  servers are the norm; sorting makes param order canonical);
- trailing slashes collapsed off the path (root stays ``/``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def url_normalize(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module rules. One narrow
    expression chain — stays inside whole-stage codegen."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    # default-port stripping is scheme-CONDITIONAL: :80 is only the
    # default for http and :443 for https; stripping cross-scheme would
    # merge genuinely distinct origins (http://h:443/ vs http://h/)
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]+", "")
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def url_dedup_decisions(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col, url_norm, keep): canonicalize, group by the canonical URL,
    keep the minimum id per group (the deterministic keep rule every dedup
    family here uses). One group-key shuffle of (id, url_norm) pairs —
    never document payloads; at crawl scale this runs on the URL manifest
    long before text is fetched into memory.
    """
    from pyspark.sql import Window as W

    norm = df.select(
        F.col(id_col), url_normalize(F.col(url_col)).alias("url_norm")
    )
    w = W.partitionBy("url_norm").orderBy(F.asc(id_col))
    return norm.select(
        id_col,
        "url_norm",
        (F.row_number().over(w) == 1).alias("keep"),
    )
