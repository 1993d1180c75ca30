"""End-to-end pipelines composed from stages. Sessions are owned by
callers (bench.py / tests / the driver)."""
