"""Per-model jit-program caches with GC-safe keying.

The decode entry points (``beam.py``, ``joint.py``) cache one jitted
program per (model, beam, max_len, ...) so repeat calls skip seconds of
retracing. Keying those caches on ``id(model)`` alone is unsafe: ids are
recycled after garbage collection, so a new model could silently hit a
stale program compiled for a dead model's parameter structure.

``ModelJitCache.scope(model)`` returns a per-model dict that is evicted
automatically when the model is garbage collected (a weakref finalizer on
the model keys the eviction), so a recycled id can never alias a stale
scope.
"""

from __future__ import annotations

import weakref


class ModelJitCache:
    def __init__(self) -> None:
        self._scopes: dict[int, dict] = {}
        self._refs: dict[int, weakref.ref] = {}

    def scope(self, model) -> dict:
        """The jit-program dict for ``model`` (created on first use)."""
        key = id(model)
        if key not in self._scopes:
            self._scopes[key] = {}

            def _evict(_ref, k=key):
                self._scopes.pop(k, None)
                self._refs.pop(k, None)

            self._refs[key] = weakref.ref(model, _evict)
        return self._scopes[key]

    def __len__(self) -> int:
        return sum(len(d) for d in self._scopes.values())
