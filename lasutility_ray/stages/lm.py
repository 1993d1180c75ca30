"""Unigram language-model familiarity scoring (the CCNet-style
perplexity-proxy quality signal, reduced to a corpus-trained unigram
model so it is exactly reproducible in SQL).

Two passes, both streaming:

1. **Train**: per-batch partial wordcounts (distinct tokens only on
   the wire) -> one vocab-sized ``groupby(token)`` shuffle -> top-K
   vocabulary by (count desc, token asc). The trained model — token
   -> integer *millibits* ``floor(-1000 * ln(count/total))`` — is a
   fixed-size table broadcast once via ``ray.put`` (the same
   broadcast-model shape a real KenLM scorer would use; K bounds the
   model, never the corpus).
2. **Score**: a streamed actor-pool scan; per batch the flattened
   token array is mapped through the vocab by ``searchsorted`` and
   per-doc sums run as ``bincount`` C kernels.

Integer exactness: the only float op is ``ln`` of one ratio per
DISTINCT vocab token (numpy and DuckDB call the same libm on this
host); per-doc scores are then pure integer sums, so they are
order-independent and value-exact against the SQL oracle. Out-of-
vocabulary tokens score ``floor(-1000 * ln(1/total))`` (add-nothing
unknown-word floor).

Reference parity note: the reference has no text scoring; engine
addition in the ``stages/text.py`` family.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[a-z0-9]+"
MAX_VOCAB = 24  # small corpus default; raise for real corpora


def _millibits(counts: np.ndarray, total: int) -> np.ndarray:
    return np.floor(-1000.0 * np.log(counts.astype(np.float64) / float(total))).astype(
        np.int64
    )


def train_unigram(ds, text_col: str = "text", max_vocab: int = MAX_VOCAB):
    """Corpus wordcount -> (vocab pandas DataFrame [token, millibits],
    oov_millibits, total_tokens). The vocab is top-``max_vocab`` by
    (count desc, token asc)."""
    import re

    from ray.data.aggregate import Sum

    pat = re.compile(TOKEN_RE)

    def partial(t: pa.Table) -> pa.Table:
        toks = t.column(text_col).to_pandas().str.lower().str.findall(pat)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        if lens.sum() == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
            )
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "token": pa.array(uniq, pa.string()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n"))
        .materialize()
    )
    total_raw = agg.sum("sum(n)")  # None on an all-empty corpus
    total = int(total_raw) if total_raw is not None else 0
    if total == 0:
        # no tokens anywhere: empty model; the scorer drops every doc
        # (all have n_tokens == 0) so oov is never consulted
        return pd.DataFrame({"token": [], "millibits": []}), 0, 0
    top = (
        agg.sort(["sum(n)", "token"], descending=[True, False])
        .limit(max_vocab)
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
    )
    vocab = pd.DataFrame(
        {
            "token": top["token"].to_numpy(),
            "millibits": _millibits(top["n"].to_numpy(), total),
        }
    )
    oov = int(np.floor(-1000.0 * np.log(1.0 / float(total))))
    return vocab, oov, total


class _UnigramScore:
    def __init__(self, vocab_ref, oov_millibits: int, text_col: str):
        import re

        import ray

        vocab = ray.get(vocab_ref[0])
        order = np.argsort(vocab["token"].to_numpy())
        self.tokens = vocab["token"].to_numpy()[order]
        self.mb = vocab["millibits"].to_numpy()[order]
        self.oov = np.int64(oov_millibits)
        self.pat = re.compile(TOKEN_RE)
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].str.lower().str.findall(self.pat)
        lens = toks.map(len).to_numpy(dtype=np.int64)
        n = len(batch)
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "n_tokens": lens,
            }
        )
        if lens.sum() == 0:
            out["n_oov"] = np.zeros(n, dtype=np.int64)
            out["score_millibits"] = np.zeros(n, dtype=np.int64)
            return out[out["n_tokens"] > 0]
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos = np.searchsorted(self.tokens, flat)
        pos = np.minimum(pos, len(self.tokens) - 1)
        in_vocab = self.tokens[pos] == flat
        mb = np.where(in_vocab, self.mb[pos], self.oov)
        out["n_oov"] = np.bincount(
            doc_idx, weights=~in_vocab, minlength=n
        ).astype(np.int64)
        out["score_millibits"] = np.bincount(
            doc_idx, weights=mb, minlength=n
        ).astype(np.int64)
        return out[out["n_tokens"] > 0]


def unigram_lm_score(ds, text_col: str = "text", max_vocab: int = MAX_VOCAB):
    """Score every document by unigram-LM familiarity (integer
    millibits; lower = more predictable text). Returns a Dataset of
    (doc_id, n_tokens, n_oov, score_millibits); zero-token docs are
    dropped (they have no LM evidence — the SQL mirror's GROUP BY
    drops them identically)."""
    import ray

    vocab, oov, _ = train_unigram(ds, text_col, max_vocab)
    ref = ray.put(vocab)
    return ds.map_batches(
        _UnigramScore,
        fn_constructor_kwargs={
            "vocab_ref": [ref],
            "oov_millibits": oov,
            "text_col": text_col,
        },
        batch_format="pandas",
        concurrency=(1, 4),
    )


def unigram_lm_sql(max_vocab: int = MAX_VOCAB, table: str = "documents") -> str:
    """DuckDB mirror of :func:`unigram_lm_score` over ``table``."""
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), "
        f"'{TOKEN_RE}')) AS token FROM {table}), "
        "cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token), "
        "tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM cnt), "
        "vocab AS (SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS rnk "
        "FROM cnt), "
        "mb AS (SELECT token, CAST(floor(-1000 * ln(c::DOUBLE / total)) AS BIGINT) "
        f"AS millibits FROM vocab, tot WHERE rnk <= {max_vocab}), "
        "oov AS (SELECT CAST(floor(-1000 * ln(1.0 / total)) AS BIGINT) AS omb FROM tot), "
        "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM toks "
        "GROUP BY doc_id, token) "
        "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN mb.millibits IS NULL THEN tf.tf ELSE 0 END) AS BIGINT) "
        "AS n_oov, "
        "CAST(sum(tf.tf * coalesce(mb.millibits, oov.omb)) AS BIGINT) "
        "AS score_millibits "
        "FROM tf LEFT JOIN mb USING(token) CROSS JOIN oov GROUP BY tf.doc_id"
    )
