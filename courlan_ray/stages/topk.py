"""Distributed exact top-k row selection (heavy hitters / ranked heads).

Top-k under a lexicographic sort order is ASSOCIATIVE: the global top-k is
contained in the union of per-block top-ks, so the scale-correct plan is a
per-block partial top-k followed by a fanout-to-1 combine tree (the same
topology as ``stages/agg.grouped_agg``) — never a global ``ds.sort`` (an
all-to-all range shuffle of every row to rank k of them) and never a
driver-side concat of all partials (10^6 blocks x k rows on one node).

Each merge task holds at most ``fanout * k`` rows; the tree is
``log_fanout(blocks)`` deep.  Ties are broken by the caller-supplied sort
key list, which must be a TOTAL order (include a unique id column last)
for the result to be deterministic and oracle-comparable.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def topk_rows(ds, sort_keys: list[tuple[str, str]], k: int, *,
              fanout: int = 8):
    """Exact global top-k rows of ``ds`` under ``sort_keys``.

    sort_keys: [(column, "ascending"|"descending"), ...] — must totally
    order the rows (append a unique id) for deterministic output.
    Returns a Dataset with <= k rows, sorted by ``sort_keys``.
    """
    order = [(c, d) for c, d in sort_keys]

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        idx = pc.sort_indices(b, sort_keys=order)
        return b.take(idx.slice(0, k))

    cur = ds.map_batches(local, batch_format="pyarrow",
                         batch_size=None).materialize()
    while cur.num_blocks() > 1:
        target = max(1, cur.num_blocks() // fanout)
        cur = (cur.repartition(target)
                  .map_batches(local, batch_format="pyarrow",
                               batch_size=None).materialize())
    return cur
