"""Module-wide meta-functions (reference parity: courlan/meta.py:20-24).

The reference's ``clear_caches`` resets its process-wide LRU caches
(``urllib.parse.clear_cache`` + the ``langcodes_score`` lru_cache).  This
engine holds no per-record LRU state — hot-path scoring is vectorized and
stateless — but it DOES keep per-worker broadcast caches (deserialized
``ray.put`` payloads in ``stages/joins._GET_CACHE`` and normalized
embedding blocks in ``stages/ann._BLOCK_CACHE``).  ``clear_caches`` drops
those, releasing worker heap exactly like the reference API promises.

Note the scope: called on the driver it clears the driver process only.
Worker-side caches are bounded by design (4 entries / 1 GiB budget) and
die with their actor; a cluster-wide flush is a restart concern, not an
API call.
"""

from __future__ import annotations

import logging

LOGGER = logging.getLogger(__name__)

try:
    from urllib.parse import clear_cache as _urllib_clear_cache  # type: ignore
except ImportError:  # pragma: no cover - CPython always has it

    def _urllib_clear_cache() -> None:
        LOGGER.warning("urllib.parse.clear_cache is unavailable, skipping")


def clear_caches() -> None:
    """Reset all known process-wide caches used to speed up processing.
    This may release some memory."""
    _urllib_clear_cache()

    from .stages import ann, joins

    joins._GET_CACHE.clear()
    ann._BLOCK_CACHE.clear()
    ann._block_cache_used = 0
