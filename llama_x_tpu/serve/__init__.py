"""Serving subsystem: continuous batching over the static-shape decode path.

The HTTP front-end lives in tools/serve_http.py; this package holds the
device-side scheduling machinery it (and any other server) drives.
"""

from llama_x_tpu.serve.continuous import ContinuousScheduler, RowHandle

__all__ = ["ContinuousScheduler", "RowHandle"]
