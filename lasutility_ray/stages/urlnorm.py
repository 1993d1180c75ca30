"""URL canonicalization + URL-keyed crawl dedup — the standard
Common-Crawl front-door pass: strip fragments and tracking parameters
(utm_*, fbclid, gclid), collapse dangling query separators, lowercase
the scheme+host (URLs are case-insensitive there, case-sensitive in
the path), then keep one document per canonical URL.

Engine shape: canonicalization is a stateless vectorized
``map_batches`` stage (compiled-regex pandas ``str.replace`` chain);
dedup is the exact-dedup shape — ``groupby(canon_url)`` carrying only
(min doc_id, alias count) on the wire, never the documents.

Exactness: every rewrite step is written in the common subset of
Python ``re`` and RE2 (ASCII classes, no lookaround) and applied in a
fixed order, so the DuckDB oracle — the same ``regexp_replace``
chain — is value-exact. Both engines scan the ORIGINAL string
left-to-right for global replaces, so consecutive tracking params
collapse identically.

The synthetic corpus has unique URLs per doc, so the testdata path
first *injects* deterministic variants (shared base URL for some doc
pairs + per-doc decorations: tracking params, fragments, uppercased
scheme+host), mirrored 1:1 in SQL — the ``stages/pii.py`` injection
pattern.

Reference parity note: the reference has no URL handling; engine
addition in the web-corpus family (SURVEY §2.11).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# (pattern, replacement) applied in order; '' replacements are global
_TRACKING_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*"
_STEPS = (
    (r"#.*$", ""),  # 1. strip fragment
    (_TRACKING_RE, ""),  # 2. drop tracking params (value included)
    (r"&+", "&"),  # 3. collapse doubled separators
    (r"\?&", "?"),  # 4. '?&id=..' -> '?id=..'
    (r"[?&]$", ""),  # 5. dangling trailing separator
)
_PREFIX_RE = r"^[^/]*//[^/]*"  # scheme://host


def canonicalize_urls(ds, url_col: str = "url"):
    """Adds ``canon_url``: the fragment-free, tracking-free,
    host-lowercased form of ``url_col``."""
    import re

    steps = [(re.compile(p), r) for p, r in _STEPS]
    prefix = re.compile(_PREFIX_RE)

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[url_col]
        for pat, rep in steps:
            s = s.str.replace(pat, rep, regex=True)
        s = s.str.replace(prefix, lambda m: m.group(0).lower(), regex=True)
        batch["canon_url"] = s
        return batch

    return ds.map_batches(canon, batch_format="pandas")


def url_dedup(ds, url_col: str = "url"):
    """Canonicalize then keep the lowest doc_id per canonical URL.
    Returns (doc_id, canon_url, n_aliases); the shuffle carries one
    (canon_url, min, count) row per distinct URL per block — documents
    never move."""
    from ray.data.aggregate import Count, Min

    canon = canonicalize_urls(ds, url_col).select_columns(
        ["doc_id", "canon_url"]
    )
    agg = canon.groupby("canon_url").aggregate(Count(), Min("doc_id"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("min(doc_id)").cast(pa.int64()),
                "canon_url": t.column("canon_url"),
                "n_aliases": t.column("count()").cast(pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def canon_url_sql(url_expr: str) -> str:
    """DuckDB expression mirroring :func:`canonicalize_urls` on
    ``url_expr``."""
    u = url_expr
    for pat, rep in _STEPS:
        escaped = pat.replace("'", "''")
        u = f"regexp_replace({u}, '{escaped}', '{rep}', 'g')"
    # lowercase scheme://host, keep the path's case
    return (
        f"(lower(regexp_extract({u}, '{_PREFIX_RE}')) || "
        f"substr({u}, length(regexp_extract({u}, '{_PREFIX_RE}')) + 1))"
    )


# --- deterministic variant injection for the synthetic corpus -------

_DECOR_TRACK = "?utm_source=feed&utm_campaign=x"
_DECOR_MIXED = "?id=7&utm_medium=email"
_DECOR_FRAG = "#section-2"


def inject_url_variants(batch: pa.Table) -> pa.Table:
    """Adds ``url``: doc pairs (4k, 4k+1) share a base URL; each doc
    then gets a doc_id%5 decoration (tracking query / mixed query /
    uppercased scheme+host / fragment / none). Mirrored 1:1 by
    :func:`inject_url_variants_sql`."""
    doc = np.asarray(batch.column("doc_id").to_numpy(), dtype=np.int64)
    base = np.where(doc % 4 < 2, doc - (doc % 2), doc)
    h1 = (base * 2654435761) % (1 << 32)
    urls = pd.Series(
        [
            f"https://site{b % 1000}.example/{h:08x}"
            for b, h in zip(base, h1)
        ]
    )
    m = doc % 5
    upper_prefix = urls.str.replace(
        "https://", "HTTPS://", regex=False
    ).str.replace(".example/", ".EXAMPLE/", regex=False)
    # the host part between site-digits and .example must upper too
    upper_prefix = upper_prefix.str.replace("site", "SITE", regex=False)
    out = urls.copy()
    out[m == 0] = urls[m == 0] + _DECOR_TRACK
    out[m == 1] = urls[m == 1] + _DECOR_MIXED
    out[m == 2] = upper_prefix[m == 2]
    out[m == 3] = urls[m == 3] + _DECOR_FRAG
    return batch.append_column("url", pa.array(out.to_numpy(), pa.string()))


def inject_url_variants_sql(doc_col: str = "doc_id") -> str:
    """DuckDB expression producing the same ``url`` column."""
    base = (
        f"(CASE WHEN {doc_col} % 4 < 2 THEN {doc_col} - ({doc_col} % 2) "
        f"ELSE {doc_col} END)"
    )
    h1 = f"(({base} * 2654435761) % 4294967296)"
    u = (
        f"('https://site' || CAST({base} % 1000 AS VARCHAR) || '.example/' "
        f"|| printf('%08x', {h1}))"
    )
    return (
        f"(CASE {doc_col} % 5 "
        f"WHEN 0 THEN {u} || '{_DECOR_TRACK}' "
        f"WHEN 1 THEN {u} || '{_DECOR_MIXED}' "
        f"WHEN 2 THEN upper(regexp_extract({u}, '{_PREFIX_RE}')) || "
        f"substr({u}, length(regexp_extract({u}, '{_PREFIX_RE}')) + 1) "
        f"WHEN 3 THEN {u} || '{_DECOR_FRAG}' "
        f"ELSE {u} END)"
    )


def canonical_urls_sql(table: str = "documents") -> str:
    """Mirror of inject -> canonicalize over ``table``."""
    inj = inject_url_variants_sql()
    return (
        f"SELECT doc_id, url, {canon_url_sql('url')} AS canon_url "
        f"FROM (SELECT doc_id, {inj} AS url FROM {table})"
    )


def url_dedup_sql(table: str = "documents") -> str:
    """Mirror of inject -> canonicalize -> keep-min-doc-per-URL."""
    return (
        f"SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, canon_url, "
        f"CAST(count(*) AS BIGINT) AS n_aliases "
        f"FROM ({canonical_urls_sql(table)}) GROUP BY canon_url"
    )
