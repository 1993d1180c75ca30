"""Deterministic synthetic web-page corpus + geocoding.

Per BASELINE.json ``input_hint`` the engine's primary input is a
Parquet table of Common-Crawl-style pages ``(url, warc_ts, html,
text, lang)``. Every derivation here is pure integer/float64
arithmetic on ``doc_id`` so an ANSI-SQL oracle (DuckDB) can reproduce
it bit-for-bit — see ``geocode.sql_exprs()``.
"""
