"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Appendix A1.1), integerized so the
same predicate evaluates EXACTLY in both engines.

Per document, seven integer counters and one keep flag:

- ``n_words``       — ``\\S+`` runs
- ``n_word_chars``  — non-whitespace characters (so the mean-word-
  length band 3..10 becomes ``3*n_words <= n_word_chars <=
  10*n_words`` — no float division anywhere)
- ``n_hash`` / ``n_ellipsis`` — '#' chars and non-overlapping '...'
  (Gopher's symbol-to-word-ratio <= 0.1 each)
- ``n_alpha_words`` — words containing an ASCII letter (Gopher: >= 80%
  of words must, i.e. ``5*n_alpha_words >= 4*n_words``)
- ``n_stop_hits``   — whole-word hits of Gopher's 8 English stop
  words (the, be, to, of, and, that, have, with); Gopher requires
  >= 2 distinct, integrated here as >= 1 total hit (the synthetic
  corpus is short-doc)

``keep`` = word count in [30, 95] AND mean word length in [3, 10]
AND hash/ellipsis ratios <= 0.1 AND alpha-word share >= 80% AND a
stop-word hit. Word-count band tightened from Gopher's [50, 100k] to
the synthetic corpus's 10..99-word regime so both branches of every
corpus-splitting rule are exercised; the predicate STRUCTURE is
Gopher's.

Pure map-only stage: all counters are single-pass RE2 kernels
(``pyarrow.compute.count_substring[_regex]``) over zero-copy Arrow
batches — no shuffle, no python rows. DuckDB mirrors each counter
with the same RE2 patterns (parity pinned in tests, including
overlapping-'...'/'the...the' edge cases).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

STOP_RE = r"\b(the|be|to|of|and|that|have|with)\b"
MIN_WORDS = 30
MAX_WORDS = 95


def gopher_quality(docs_ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-doc Gopher rule counters + keep flag (int64 0/1)."""

    def stats(t: pa.Table) -> pa.Table:
        tx = t.column(text_col)
        n_words = pc.count_substring_regex(tx, r"\S+")
        n_word_chars = pc.subtract(
            pc.utf8_length(tx), pc.count_substring_regex(tx, r"\s")
        )
        n_hash = pc.count_substring(tx, "#")
        n_ellipsis = pc.count_substring(tx, "...")
        n_alpha_words = pc.count_substring_regex(tx, r"\S*[A-Za-z]\S*")
        n_stop_hits = pc.count_substring_regex(pc.utf8_lower(tx), STOP_RE)

        nw = n_words.to_numpy().astype("int64")
        nwc = n_word_chars.to_numpy().astype("int64")
        nh = n_hash.to_numpy().astype("int64")
        ne = n_ellipsis.to_numpy().astype("int64")
        na = n_alpha_words.to_numpy().astype("int64")
        ns = n_stop_hits.to_numpy().astype("int64")
        keep = (
            (nw >= MIN_WORDS)
            & (nw <= MAX_WORDS)
            & (3 * nw <= nwc)
            & (nwc <= 10 * nw)
            & (10 * nh <= nw)
            & (10 * ne <= nw)
            & (5 * na >= 4 * nw)
            & (ns >= 1)
        )
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_words": pa.array(nw),
                "n_word_chars": pa.array(nwc),
                "n_hash": pa.array(nh),
                "n_ellipsis": pa.array(ne),
                "n_alpha_words": pa.array(na),
                "n_stop_hits": pa.array(ns),
                "keep": pa.array(keep.astype("int64")),
            }
        )

    return docs_ds.map_batches(stats, batch_format="pyarrow")


def gopher_quality_sql(source: str = "documents") -> str:
    """DuckDB mirror of :func:`gopher_quality` — same RE2 patterns,
    same integer predicate."""
    return (
        "WITH s AS (SELECT doc_id, "
        r"length(regexp_extract_all(text,'\S+')) AS n_words, "
        r"length(text) - length(regexp_extract_all(text,'\s')) AS n_word_chars, "
        "length(text) - length(replace(text,'#','')) AS n_hash, "
        "CAST((length(text) - length(replace(text,'...','')))/3 AS BIGINT) AS n_ellipsis, "
        r"length(regexp_extract_all(text,'\S*[A-Za-z]\S*')) AS n_alpha_words, "
        r"length(regexp_extract_all(lower(text), '\b(the|be|to|of|and|that|have|with)\b')) AS n_stop_hits "
        f"FROM {source}) "
        "SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, "
        "CAST(n_word_chars AS BIGINT) AS n_word_chars, "
        "CAST(n_hash AS BIGINT) AS n_hash, n_ellipsis, "
        "CAST(n_alpha_words AS BIGINT) AS n_alpha_words, "
        "CAST(n_stop_hits AS BIGINT) AS n_stop_hits, "
        f"CAST(CASE WHEN n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} "
        "AND 3*n_words <= n_word_chars AND n_word_chars <= 10*n_words "
        "AND 10*n_hash <= n_words AND 10*n_ellipsis <= n_words "
        "AND 5*n_alpha_words >= 4*n_words AND n_stop_hits >= 1 "
        "THEN 1 ELSE 0 END AS BIGINT) AS keep "
        "FROM s"
    )
