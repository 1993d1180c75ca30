"""End-to-end corpus curation: the "prepare this crawl for training"
pipeline a user of the engine would actually run, composed from the
engine's own stages — each individually oracle-checked, and the
composition itself value-exact against one DuckDB query:

  1. deterministic train/eval split (``hash_sample`` — membership
     recomputable, resume-stable);
  2. quality scoring + cutoff (``TextStats``'s integer millipoint
     score — order-independent, SQL-mirrored);
  3. benchmark-contamination drop (``ngram_contamination`` — eval
     gram set broadcast, shuffle-free train scan);
  4. exact content dedup of what remains (min doc_id per md5).

Every stage streams; the only shuffle is the final tiny dedup
groupby over (hash, partial-min) rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def curate_corpus(
    docs_ds,
    quality_min: int = 870,
    eval_rate_milli: int = 100,
    ngram_n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns one row per surviving train document group:
    ``(doc_id, n_copies)`` — the min-id survivor of each exact
    content group among high-quality, uncontaminated train docs."""
    from lasutility_ray.stages.contamination import ngram_contamination
    from lasutility_ray.stages.dedup import exact_dedup
    from lasutility_ray.stages.quantiles import hash_sample
    from lasutility_ray.stages.text import text_stats

    eval_ds = hash_sample(docs_ds, id_col, eval_rate_milli)
    train = hash_sample(docs_ds, id_col, eval_rate_milli, invert=True)

    def quality_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column("quality_millis"), quality_min))

    good = text_stats(train).map_batches(quality_filter, batch_format="pyarrow")

    def drop_contaminated(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("is_contaminated")))

    clean = ngram_contamination(
        good, eval_ds, n=ngram_n, id_col=id_col, text_col=text_col
    ).map_batches(drop_contaminated, batch_format="pyarrow")

    survivors = exact_dedup(clean, id_col=id_col, text_col=text_col)

    def shape(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column("keep_id"),
                "n_copies": t.column("n_copies"),
            }
        )

    return survivors.map_batches(shape, batch_format="pyarrow")


def curate_for_training(
    docs_ds,
    max_dup_word_frac: float = 0.55,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """The tokenization-ready tail of corpus prep, composed from the
    round-2 stages — each individually oracle-checked AND the
    composition value-exact against one DuckDB query:

      1. domain-mix sampling (``webcorpus.domain_mix`` — shuffle-free
         hash gate on the source column);
      2. repetition-quality cutoff (drop docs whose duplicate-word
         fraction exceeds ``max_dup_word_frac`` — Gopher rule, pure
         map, IEEE-exact predicate);
      3. corpus-global duplicate-line removal keep-first
         (``webcorpus.line_dedup`` — the C4 hygiene pass);
      4. concat-and-cut sequence packing over the surviving texts
         (``webcorpus.pack_sequences`` — distributed prefix sum).

    Returns (doc_id, n_tok, seq_id, seq_off) per surviving doc."""
    import numpy as np

    from lasutility_ray.stages.webcorpus import (
        _repetition_batch,
        domain_mix,
        line_dedup,
        pack_sequences,
    )

    mixed = domain_mix(docs_ds)

    def repetition_filter(t: pa.Table) -> pa.Table:
        stats = _repetition_batch(t, id_col, text_col)
        frac = stats.column("dup_word_frac").to_numpy()
        return t.filter(pa.array(frac <= max_dup_word_frac))

    quality = mixed.map_batches(repetition_filter, batch_format="pyarrow")
    deduped = line_dedup(quality, id_col=id_col, text_col=text_col)
    return pack_sequences(deduped, budget, id_col=id_col, text_col=text_col)


def gopher_budget_curate(docs_ds, budget: int | None = None):
    """Session-5 composition: Gopher quality gate -> token-budget
    greedy selection, both individually oracle-checked AND the
    composition value-exact against ONE DuckDB query:

      1. ``stages.gopher`` rules drop low-quality docs (map-only RE2
         counters, integer predicate);
      2. ``stages.selection.budget_select`` keeps survivors in
         (score DESC, doc_id) order until half the SURVIVOR tokens
         are spent (score-space histogram + boundary-score prefix
         sum — no global sort).

    Returns (doc_id, score, n_tok, selected) for every survivor."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from lasutility_ray.stages.gopher import MAX_WORDS, MIN_WORDS, STOP_RE
    from lasutility_ray.stages.selection import budget_select

    def keep_quality(t: pa.Table) -> pa.Table:
        tx = t.column("text")
        nw = pc.count_substring_regex(tx, r"\S+").to_numpy().astype(np.int64)
        nwc = (
            pc.utf8_length(tx).to_numpy().astype(np.int64)
            - pc.count_substring_regex(tx, r"\s").to_numpy().astype(np.int64)
        )
        nh = pc.count_substring(tx, "#").to_numpy().astype(np.int64)
        ne = pc.count_substring(tx, "...").to_numpy().astype(np.int64)
        na = pc.count_substring_regex(tx, r"\S*[A-Za-z]\S*").to_numpy().astype(np.int64)
        ns = (
            pc.count_substring_regex(pc.utf8_lower(tx), STOP_RE)
            .to_numpy()
            .astype(np.int64)
        )
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
        return t.select(["doc_id", "text"]).filter(pa.array(keep))

    survivors = docs_ds.map_batches(keep_quality, batch_format="pyarrow")
    return budget_select(survivors, budget=budget)


def gopher_budget_curate_sql(source: str = "documents") -> str:
    """One-query DuckDB mirror of :func:`gopher_budget_curate`."""
    from lasutility_ray.stages.gopher import MAX_WORDS, MIN_WORDS

    score = (
        r"CAST(length(regexp_extract_all(lower(text),"
        r"'\b(the|be|to|of|and|that|have|with)\b')) * 1000 "
        r"// greatest(length(regexp_extract_all(text,'\S+')), 1) AS BIGINT)"
    )
    ntok = r"CAST(length(regexp_extract_all(text,'\S+')) AS BIGINT)"
    return (
        "WITH g AS (SELECT doc_id, text, "
        r"length(regexp_extract_all(text,'\S+')) AS n_words, "
        r"length(text) - length(regexp_extract_all(text,'\s')) AS n_word_chars, "
        "length(text) - length(replace(text,'#','')) AS n_hash, "
        "CAST((length(text) - length(replace(text,'...','')))/3 AS BIGINT) AS n_ellipsis, "
        r"length(regexp_extract_all(text,'\S*[A-Za-z]\S*')) AS n_alpha_words, "
        r"length(regexp_extract_all(lower(text), '\b(the|be|to|of|and|that|have|with)\b')) AS n_stop_hits "
        f"FROM {source}), "
        f"kept AS (SELECT doc_id, text FROM g WHERE n_words >= {MIN_WORDS} "
        f"AND n_words <= {MAX_WORDS} AND 3*n_words <= n_word_chars "
        "AND n_word_chars <= 10*n_words AND 10*n_hash <= n_words "
        "AND 10*n_ellipsis <= n_words AND 5*n_alpha_words >= 4*n_words "
        "AND n_stop_hits >= 1), "
        f"s AS (SELECT doc_id, {score} AS score, {ntok} AS n_tok FROM kept), "
        "o AS (SELECT *, SUM(n_tok) OVER (ORDER BY score DESC, doc_id "
        "ROWS UNBOUNDED PRECEDING) AS cum FROM s) "
        "SELECT doc_id, score, n_tok, "
        "CAST(CASE WHEN cum <= (SELECT SUM(n_tok)//2 FROM s) "
        "THEN 1 ELSE 0 END AS BIGINT) AS selected FROM o"
    )
