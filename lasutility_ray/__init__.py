"""lasutility_ray — a Ray-Data-native spatial tiling / join / rasterization engine.

A from-scratch reimplementation of the query and data-processing
capabilities of Kuoste/LasUtility (reference read-only at
/root/reference), re-expressed as ray.data.Dataset pipelines over
zero-copy Arrow batches:

- ``geom``      pure numpy kernels (tile codec, raster bounds, fills,
                Delaunay TIN, RLE / ASCII-grid codecs) — no Ray imports.
- ``corpus``    deterministic synthetic Common-Crawl-style page corpus
                (url, warc_ts, html, text, lang) + geocoding.
- ``stages``    Ray Data map_batches / groupby stages (tiling, voxel
                aggregation, TIN rasterization, PIP join, kNN, dedup,
                text analysis, similarity search, multimodal stubs).
- ``pipelines`` end-to-end flagship pipelines + checkpoint/resume.

Nothing in this package calls ``ray.init()``; sessions are owned by
bench.py / the test fixture / the driver.
"""

__version__ = "0.1.0"
