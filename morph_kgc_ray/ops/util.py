"""Shared operator utilities."""

from __future__ import annotations

_KERNEL_CACHE: dict = {}


def cached_kernel(cls, **kwargs):
    """Task-form wrapper for a stateful batch kernel with a per-worker-
    process instance cache: setup cost amortizes exactly like an actor
    pool's ``__init__`` (once per process), but the stage stays a TASK so
    Ray fuses it with its upstream read — no actor-pool spin-up
    (~1-1.5 s per execution), no pool sizing, no risk of starving other
    stages in small sessions.  Use the actor-pool form instead when the
    state is too big to hold in every worker process (a model, a large
    index) or when you need to bound how many copies exist.

    ``kwargs`` must be picklable and hashable-by-repr (the cache key)."""
    key = (cls.__module__, cls.__qualname__, repr(sorted(kwargs.items())))

    def fn(batch):
        kernel = _KERNEL_CACHE.get(key)
        if kernel is None:
            kernel = cls(**kwargs)
            _KERNEL_CACHE[key] = kernel
        return kernel(batch)
    return fn
