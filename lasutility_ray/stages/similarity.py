"""Similarity search over the embeddings table.

- ``ann_topk``: brute-force cosine top-k — the exactness baseline.
  The query matrix is broadcast once (``ray.put``); every batch does
  one float64 matmul against it (no shuffle). DuckDB-checkable
  (scores rounded to 6 dp; rank ties broken by vec_id).
- ``ann_topk_ivf``: IVF-style scale path — coarse k-means-ish
  centroids (deterministic seeding), vectors bucketed by nearest
  centroid, queries probe the ``n_probe`` nearest buckets only.
  Approximate by design -> rows-only checks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def default_queries(ds, n_queries: int = 10):
    """Deterministic query set: the n_queries lowest vec_ids."""
    df = ds.sort("vec_id").limit(n_queries).to_pandas()
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def _merge_topk(k: int):
    """Per-query final merge of k-row partials (runs in-cluster via
    groupby(query_id).map_groups — never on the driver)."""

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["cosine", "neighbor_id"], ascending=[False, True], kind="stable"
        ).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return final


def ann_topk(ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 5):
    """(query_id, neighbor_id, rank, cosine): top-k cosine neighbors
    per query (self excluded). Map side emits per-batch local top-k;
    the final reduce is a ``groupby(query_id)`` merge of the k-row
    partials — the shuffle moves k rows per (query, batch), never
    vectors."""
    qn = _normalize(query_mat.astype(np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qn))

    def local_topk(batch: pa.Table) -> pa.Table:
        q_ids, q = ray.get(ref)
        ids = batch.column("vec_id").to_numpy()
        m = _normalize(np.stack(batch.column("embedding").to_numpy()).astype(np.float64))
        sims = q @ m.T  # (n_q, n_batch)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi in range(len(q_ids)):
            s = sims[qi]
            mask = ids != q_ids[qi]
            cand_ids = ids[mask]
            cand_s = np.round(s[mask], 6)
            order = np.lexsort((cand_ids, -cand_s))[:k]
            rows["query_id"].extend([q_ids[qi]] * len(order))
            rows["neighbor_id"].extend(cand_ids[order].tolist())
            rows["cosine"].extend(cand_s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    return (
        ds.map_batches(local_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pandas")
        .sort(["query_id", "rank"])
    )


def _train_centroids(ds, n_lists: int, sample_n: int = 512, iters: int = 5):
    """Deterministic mini-k-means (cosine) over a fixed sample: the
    IVF training pass. Data-derived centroids are what make the probe
    lists meaningful — random directions partition real embedding
    clusters poorly (measured recall@5 0.38 vs ~0.9)."""
    df = ds.sort("vec_id").limit(sample_n).to_pandas()
    m = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    stride = max(len(m) // n_lists, 1)
    centroids = m[::stride][:n_lists].copy()
    for _ in range(iters):
        assign = np.argmax(m @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def ann_topk_ivf(ds, query_ids, query_mat, k: int = 5, n_lists: int = 16,
                 n_probe: int = 6):
    """IVF-bucketed ANN: a deterministic sampled k-means trains
    ``n_lists`` centroids, one pass assigns vectors to the nearest,
    each query probes its ``n_probe`` closest lists. Recall < 1 by
    design (measured in q_ann_recall)."""
    centroids = _train_centroids(ds, n_lists)
    cref = ray.put(centroids)
    qn = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qn, q_lists))

    def local(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        q_ids, q, q_l = ray.get(qref)
        ids = batch.column("vec_id").to_numpy()
        m = _normalize(np.stack(batch.column("embedding").to_numpy()).astype(np.float64))
        assign = np.argmax(m @ c.T, axis=1)
        rows = {"query_id": [], "neighbor_id": [], "cosine": []}
        for qi in range(len(q_ids)):
            probe_mask = np.isin(assign, q_l[qi]) & (ids != q_ids[qi])
            if not probe_mask.any():
                continue
            cand_ids = ids[probe_mask]
            s = np.round(m[probe_mask] @ q[qi], 6)
            order = np.lexsort((cand_ids, -s))[:k]
            rows["query_id"].extend([q_ids[qi]] * len(order))
            rows["neighbor_id"].extend(cand_ids[order].tolist())
            rows["cosine"].extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(rows["query_id"], pa.int64()),
                "neighbor_id": pa.array(rows["neighbor_id"], pa.int64()),
                "cosine": pa.array(rows["cosine"], pa.float64()),
            }
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(_merge_topk(k), batch_format="pandas")
        .sort(["query_id", "rank"])
    )


def kmeans_assign(ds, n_clusters: int = 16, sample_n: int = 512, iters: int = 5):
    """Deterministic cosine k-means clustering as a first-class stage:
    centroids train on a fixed sample (``_train_centroids``), then ONE
    streaming pass assigns every vector — (vec_id, cluster, cos_sim).
    The 100 TB shape: training touches ``sample_n`` rows, assignment
    is an embarrassingly-parallel map with the centroid matrix
    broadcast once via ``ray.put``."""
    centroids = _train_centroids(ds, n_clusters, sample_n, iters)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(np.stack(batch.column("embedding").to_numpy()).astype(np.float64))
        sims = m @ c.T
        a = np.argmax(sims, axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "cluster": pa.array(a.astype(np.int64), pa.int64()),
                "cos_sim": pa.array(np.round(sims[np.arange(len(a)), a], 6), pa.float64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def semantic_dedup(ds, n_clusters: int = 16, threshold: float = 0.85):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then WITHIN each cluster drop every vector whose cosine to a
    lower-id cluster-mate exceeds ``threshold``. The cluster partition
    is what makes it scale: the quadratic step runs per cluster
    (n²/k work, co-grouped by one shuffle on the cluster id), never
    across the corpus. Returns (vec_id, cluster, is_kept,
    dup_of) with dup_of = the smallest kept id that covers a dropped
    vector (-1 for kept rows)."""
    assigned = kmeans_assign(ds, n_clusters)
    from .cogroup import lookup_join

    # one exchange total: the cluster id is attached to the vector
    # rows in-cluster, then the groupby co-locates each cluster
    cl = lookup_join(
        ds.map_batches(lambda t: t.select(["vec_id", "embedding"]), batch_format="pyarrow"),
        assigned,
        "vec_id",
        "vec_id",
        {"cluster": "cluster"},
    )

    def dedup_cluster(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("vec_id").reset_index(drop=True)
        m = _normalize(np.stack(g["embedding"].to_numpy()).astype(np.float64))
        ids = g["vec_id"].to_numpy()
        n = len(g)
        kept = np.ones(n, dtype=bool)
        dup_of = np.full(n, -1, dtype=np.int64)
        sims = m @ m.T
        for i in range(1, n):
            over = np.where(kept[:i] & (np.round(sims[i, :i], 6) > threshold))[0]
            if len(over):
                kept[i] = False
                dup_of[i] = ids[over[0]]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": g["cluster"].to_numpy(),
                "is_kept": kept,
                "dup_of": dup_of,
            }
        )

    return cl.groupby("cluster").map_groups(dedup_cluster, batch_format="pandas")
