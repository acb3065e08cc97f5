"""Per-container memoization with content-fingerprint invalidation.

One shared implementation of the discipline every prepared-state cache in
the library follows (facade execution formats, distributed programs,
distributed sizing plans): the cache dict hangs off the matrix container
itself, every entry stores the full-content fingerprint it was built
from, and a lookup only validates against the CURRENT fingerprint — any
in-place mutation of the container's buffers invalidates everything.

Bounded caches are LRU: a hit moves the entry to the back, an insert of
an existing key replaces in place (never evicts a sibling), and only a
genuinely new entry can push the oldest one out.  Bounds exist because a
distributed program entry pins device copies of the partitioned matrix,
the PC state, and a compiled executable — a serving process varying
options per request must not exhaust HBM.
"""
import numpy as np


def fingerprint(A):
    """Full-content fingerprint (crc32 over the value/index buffers) so ANY
    in-place mutation of a container's buffers invalidates the prepared
    cache.  crc32 streams at ~1 GB/s on host memory — negligible next to
    the format conversion + device upload it guards (sampling-based
    hashing missed mutations outside the sampled stride and silently
    validated a stale device matrix).  Returns None when the container's
    content is not hashable — callers treat that as "never match"."""
    import zlib
    try:
        vals = getattr(A, "data", None)
        if vals is None:
            vals = getattr(A, "blocks", None)     # BSR stores block values
        d = np.ascontiguousarray(np.asarray(vals))
        parts = [d.shape, d.dtype.str, zlib.crc32(d)]
        # ALL structure buffers participate: an indptr-only mutation (row
        # boundary shift with identical data/indices bytes) must also
        # invalidate
        for name in ("indices", "indptr", "row", "col"):
            buf = getattr(A, name, None)
            if buf is not None:
                parts.append(zlib.crc32(np.ascontiguousarray(np.asarray(buf))))
        return tuple(parts)
    except Exception:
        return None


def memo_get(A, attr, key, fp):
    """Validated lookup in the container cache ``A.<attr>``.  Returns the
    stored value, or None on miss/stale.  A None fingerprint never matches
    (None == None must not validate a stale entry).  Hits are moved to the
    back of the dict so bounded caches evict in true LRU order."""
    cache = getattr(A, attr, None)
    if cache is None or fp is None:
        return None
    hit = cache.get(key)
    if hit is None or hit[0] is None or hit[0] != fp:
        return None
    try:
        cache.pop(key)             # LRU touch: re-insert at the back
        cache[key] = hit
    except Exception:
        pass
    return hit[1]


def memo_put(A, attr, key, fp, out, bound=None):
    """Insert ``out`` under ``key`` in the container cache ``A.<attr>``
    (creating it on first use).  ``bound`` caps the entry count (LRU
    eviction of the oldest entries); replacing an existing key never
    evicts a sibling.  Containers that reject attribute attachment are
    silently skipped — memoization is an optimization, not a contract."""
    try:
        cache = getattr(A, attr, None)
        if cache is None:
            cache = {}
            object.__setattr__(A, attr, cache)
        if key in cache:
            cache.pop(key)         # replace in place, keep LRU position
        elif bound is not None:
            while len(cache) >= bound:
                cache.pop(next(iter(cache)))
        cache[key] = (fp, out)
    except Exception:
        pass                       # non-dataclass containers: skip caching
