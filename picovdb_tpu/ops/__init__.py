"""Device-side compute ops: exact scan, fused Pallas scan, top-k merge, IVF."""

from .exact import exact_topk, make_exact_topk  # noqa: F401
