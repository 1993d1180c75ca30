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
