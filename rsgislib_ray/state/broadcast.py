"""Per-worker-process cache for broadcast (``ray.put``) state.

Stateless ``map_batches`` TASKS running in pre-warmed Ray worker
processes call :func:`cached` with the ObjectRef; the first call in
each process materializes the value (and optionally builds derived
state like a spatial index), later calls are dict hits. This gives the
actor-pool pattern's build-once-per-worker amortization WITHOUT the
actor pool's fresh-process spawn + import latency per execution, and
without capping parallelism at the pool size.
"""

from __future__ import annotations

from typing import Any, Callable

import ray

_CACHE: dict = {}


def cached(ref, build: Callable[[Any], Any] | None = None):
    """Return (and memoize) the broadcast value for this process.

    ``build`` post-processes the fetched value once per process (e.g.
    ``lambda zs: (zs, zs.build_index())``).
    """
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CACHE:
        val = ray.get(ref) if hasattr(ref, "hex") else ref
        _CACHE[key] = build(val) if build is not None else val
    return _CACHE[key]
