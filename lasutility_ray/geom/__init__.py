"""Pure numpy geometry kernels (no Ray). Conformance-critical leaves.

Each module's docstring cites the reference implementation it is
semantically equivalent to (``/root/reference/...``). Everything here
is vectorized where hot; per-tile state never leaves the worker.
"""
