"""Flagship pipeline: pages -> extract -> geocode/tile -> PIP join +
per-tile TIN rasterization (the BASELINE.json headline metric).

Ray shape (SURVEY.md §3): ``read_parquet`` -> stateless
``map_batches`` (pages synth, extraction invariant, geocode + tile
key) -> broadcast rect PIP join (no shuffle) -> one
``groupby(tile_id)`` shuffle -> per-tile TIN/DEM ``map_groups`` ->
tile summary rows. Streaming end to end; nothing materializes the
full input.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..corpus.pages import extract_text_from_html, pages_from_documents
from ..corpus.polygons import build_feature_table
from ..stages.pip_join import rect_pip_join
from ..stages.tiling import points_dataset
from ..stages.tin import tin_tiles


def _pages_stage(batch: pa.Table) -> pa.Table:
    pages = pages_from_documents(batch)
    # extraction invariant: text recovered from html must be
    # byte-identical per url (BASELINE.json input_hint)
    extracted = extract_text_from_html(pages.column("html"))
    ok = pc.equal(extracted, pages.column("text"))
    return pages.append_column("extract_ok", ok)


def documents_to_points(sf_dir: str):
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    pages = docs.map_batches(_pages_stage, batch_format="pyarrow")
    return points_dataset(pages)


def flagship(sf_dir: str, include_rasters: bool = False):
    """Returns (tiles_ds, pip_ds): per-tile TIN summary + PIP join
    rows. Consumers count/write both."""
    points = documents_to_points(sf_dir)
    features = build_feature_table()
    pip = rect_pip_join(points, features)
    tiles = tin_tiles(points, include_rasters=include_rasters)
    return tiles, pip
