"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in courlan_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: near-duplicate detection + clustering on the
    deterministic synthetic image+caption table (input_hint shape) at
    sf0.001 scale; returns the cluster assignment Dataset."""
    from courlan_ray.pipelines.extras import image_dedup_clusters
    return image_dedup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (and
    the training-data ops): SQL-oracled queries + rows-only extras."""
    from courlan_ray.pipelines.queries import QUERIES
    from courlan_ray.pipelines.extras import EXTRAS
    return {**QUERIES, **EXTRAS}


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for the SQL-expressible queries, including the
    SQL-expressible extras (langid, quality, batched kNN, BPE-ish token
    counts, the flagship's gate counters).  The remaining extras are
    intentionally omitted (MinHash/LSH/ANN/union-find are not ANSI-SQL
    expressible) -> driver records rows-only checks."""
    from courlan_ray.pipelines.queries import ORACLES
    from courlan_ray.pipelines.extras import EXTRA_ORACLES, ensure_oracle_inputs
    # image_dedup_counters' SQL scans the flagship's synthetic input by
    # path; generate it now so the DuckDB side works in any run order
    ensure_oracle_inputs()
    return {**ORACLES, **EXTRA_ORACLES}
