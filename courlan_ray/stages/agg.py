"""Associative grouped aggregation: partial-combine tree instead of a raw
sort shuffle.

Ray 2.49's ``groupby().aggregate()`` pays a ~40 s sort-shuffle constant on
this cluster even for a few hundred thousand rows (measured: 360 k rows
40 s vs 0.22 s for a single pyarrow ``group_by``).  Every grouped operation
this engine needs (bucket representative = min, keeper = min, cluster
size = count, counters = sum, label propagation = min) is ASSOCIATIVE, so
the scale-correct plan is map-side partial aggregation followed by a
combine tree (the "pre-aggregate inside map_batches before a small
groupby" rule, SURVEY.md §4 / ray_guide aggregation section):

  pass 1: pyarrow ``group_by`` per block (C-vectorized)
  pass k: coalesce blocks ``fanout``-to-1 (``repartition`` without
          shuffle moves no rows) and re-combine per merged block
  final:  one block holds one row per key.

The tree needs the final key cardinality to fit one task; above
``tree_max_groups`` we fall back to Ray's hash/sort shuffle groupby, which
is the right topology for 10^9+ distinct keys on a real cluster.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

TREE_MAX_GROUPS = 20_000_000
_MERGE_FN = {"min": "min", "max": "max", "sum": "sum", "count": "sum"}


def combine_tree(ds, merge, *, first=None, fanout: int = 8):
    """Fanout-to-1 tree reduction shared by every associative partial/
    combine stage (grouped aggs, top-k, sketches): apply ``first`` (or
    ``merge``) per input block, then repeatedly coalesce blocks
    fanout-to-1 (``repartition`` without shuffle moves no rows) and
    re-apply ``merge`` until ONE block remains.  ``merge`` must be
    associative and idempotent on its own output."""
    from ray.data.dataset import MaterializedDataset

    cur = ds.map_batches(first or merge, batch_format="pyarrow",
                         batch_size=None)
    # block counts are known without executing: per-block maps are 1:1 and
    # repartition(n) yields exactly n blocks — so the whole tree chains
    # LAZILY and executes in ONE streaming run (each intermediate
    # materialize() cost a full executor launch, ~0.4 s of pure
    # orchestration per round; a materialized input's count is free)
    if isinstance(ds, MaterializedDataset):
        nb = ds.num_blocks()
    else:
        cur = cur.materialize()
        nb = cur.num_blocks()
    while nb > 1:
        nb = max(1, nb // fanout)
        cur = cur.repartition(nb).map_batches(
            merge, batch_format="pyarrow", batch_size=None)
    return cur.materialize()


def meta_rows(ds) -> int | None:
    """Row count when it is metadata-known (fresh parquet read: footer
    counts; materialized dataset: block metadata) — None otherwise.  Never
    executes the dataset, so it is safe to probe lazy inputs; callers use
    it as a declared upper bound on group cardinality (distinct keys <=
    rows) for ``resolve_agg_mode`` routing."""
    try:
        n = ds._meta_count()
        return int(n) if n is not None else None
    except Exception:
        return None


def resolve_agg_mode(ds, approx_count: int | None,
                     tree_max_groups: int = TREE_MAX_GROUPS) -> str:
    """Tree vs shuffle routing for ``mode="auto"`` (the declared-cardinality
    contract, VERDICT round 1 #5).  A declared ``approx_count`` always wins;
    a materialized input falls back to its row count; a lazy input with no
    declared bound defaults to the tree (counting would re-execute its
    upstream chain) — large-key-space callers must declare."""
    if approx_count is not None:
        return "tree" if approx_count <= tree_max_groups else "shuffle"
    from ray.data.dataset import MaterializedDataset
    if isinstance(ds, MaterializedDataset):
        return "tree" if ds.count() <= tree_max_groups else "shuffle"
    return "tree"


def grouped_agg(ds, keys: list[str], specs: list[tuple[str, str, str]], *,
                fanout: int = 8, tree_max_groups: int = TREE_MAX_GROUPS,
                mode: str = "auto", approx_count: int | None = None):
    """Grouped aggregation of ``ds`` by ``keys``.

    specs: (input_col, fn, output_col) with fn in {min,max,sum,count}.
    Returns a Dataset with columns keys + output_cols (one row per key).

    ``mode``: "tree" | "shuffle" | "auto".  Under "auto" the key
    cardinality must be DECLARED, not guessed: pass ``approx_count`` (any
    upper bound on the number of distinct key tuples — e.g. the input row
    count) and the tree is used iff it fits ``tree_max_groups``.  Without
    it, a materialized input's row count is used; a lazy input without a
    declared bound defaults to the tree (counting it would re-execute its
    whole upstream chain) — callers at 10^9+ group scale MUST pass
    ``approx_count`` or ``mode="shuffle"`` (the lazy-auto trap,
    VERDICT round 1 #5).

    The shuffle path is map-side partial aggregation + a keyed hash-shuffle
    ``repartition(P, keys=keys)`` + per-partition final combine — every
    distinct key lands wholly in one partition, so no single task ever
    holds more than ~1/P of the key space (the 10^9-distinct-keys-safe
    topology; requires the HASH_SHUFFLE strategy set in
    ``courlan_ray/__init__``).
    """
    if mode == "auto":
        mode = resolve_agg_mode(ds, approx_count, tree_max_groups)

    # a count over a key column is re-pointed at a synthetic ones column
    # (pyarrow can't aggregate a grouping key)
    needs_ones = any(fn == "count" and c in keys for c, fn, _ in specs)
    eff = [("__one" if (fn == "count" and c in keys) else c, fn, out)
           for c, fn, out in specs]
    first_specs = [(c, "count" if fn == "count" else fn) for c, fn, _ in eff]
    first_names = [f"{c}_{'count' if fn == 'count' else fn}"
                   for c, fn, _ in eff]
    out_cols = [out for _, _, out in eff]
    merge_specs = [(out, _MERGE_FN[fn]) for _, fn, out in eff]
    merge_names = [f"{out}_{_MERGE_FN[fn]}" for _, fn, out in eff]

    def partial(b: pa.Table) -> pa.Table:
        if needs_ones:
            b = b.append_column("__one", pa.array(
                np.ones(b.num_rows, dtype=np.int64)))
        agg = b.group_by(keys).aggregate(first_specs)
        cols = {k: agg[k] for k in keys}
        for name, out in zip(first_names, out_cols):
            cols[out] = agg[name]
        return pa.table(cols)

    def combine(b: pa.Table) -> pa.Table:
        agg = b.group_by(keys).aggregate(merge_specs)
        cols = {k: agg[k] for k in keys}
        for name, out in zip(merge_names, out_cols):
            cols[out] = agg[name]
        return pa.table(cols)

    if mode == "shuffle":
        from .joins import keyed_repartition, keyed_shuffle_partitions
        parts = keyed_shuffle_partitions(64)
        pre = ds.map_batches(partial, batch_format="pyarrow",
                             batch_size=None)
        return keyed_repartition(pre, parts, keys).map_batches(
            combine, batch_format="pyarrow", batch_size=None)

    return combine_tree(ds, combine, first=partial, fanout=fanout)


def grouped_concat(ds, keys: list[str], col: str, *, sep: str = ",",
                   out_col: str | None = None, num_partitions: int = 64,
                   count_col: str | None = None):
    """Order-sensitive group-concat (SQL ``string_agg(col, sep ORDER BY
    col)``): one row per key tuple with the ``sep``-joined, ascending-
    sorted values of ``col`` — the posting-list / collect-list
    aggregation the {min,max,sum,count} combine tree can't express.

    Topology: value order makes map-side pre-aggregation impossible
    (partial strings from different blocks interleave), so this is a
    straight ONE keyed hash-shuffle on ``keys`` + a per-partition
    vectorized sort + pandas group-join — every key lands wholly in one
    partition, exchange volume is the (keys, col) projection.  String
    assembly is inherently object-dtype; everything before it
    (sort, grouping) is columnar.

    ``count_col``: optionally also emit the per-key value count.

    NULL values of ``col`` are skipped, matching ``string_agg`` /
    ``count(col)``; a group whose values are all NULL is omitted (SQL
    would emit it with a NULL aggregate — only-null groups needing
    presence should pre-fill a sentinel)."""
    import pyarrow.compute as pc

    out_col = out_col or f"{col}_list"
    from .joins import keyed_repartition, keyed_shuffle_partitions

    narrow = ds.select_columns(keys + [col])

    def kernel(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[col]))
        if b.num_rows == 0:        # typed empty (from_pandas would emit
            cols = {k: b[k] for k in keys}          # null-type columns)
            cols[out_col] = pa.array([], pa.string())
            if count_col is not None:
                cols[count_col] = pa.array([], pa.int64())
            return pa.table(cols)
        df = b.to_pandas().sort_values(keys + [col])
        g = df.groupby(keys, sort=True)[col]
        joined = g.agg(lambda v: sep.join(v.astype(str)))
        out = joined.reset_index().rename(columns={col: out_col})
        if count_col is not None:
            out[count_col] = g.size().reset_index(drop=True).astype("int64")
        # strip the pandas metadata blob from_pandas attaches — it makes
        # hash(pa.Schema) raise inside downstream range/hash shuffles
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    parts = keyed_shuffle_partitions(num_partitions)
    return keyed_repartition(narrow, parts, keys).map_batches(
        kernel, batch_format="pyarrow", batch_size=None)


def grouped_distinct(ds, keys: list[str], **kw):
    """Distinct key tuples via the same combine tree."""
    probe = keys[0]
    out = grouped_agg(ds, keys, [(probe, "count", "_n")], **kw)
    return out.drop_columns(["_n"])


def distinct_by_key(ds, key: str, *, approx_count: int | None = None,
                    fanout: int = 16, tree_max_groups: int = TREE_MAX_GROUPS):
    """Row-level distinct on a precomputed 64-bit key column: keeps the
    FIRST row per key value (all payload columns ride along untouched).

    Much cheaper than ``grouped_agg`` with min-aggregated payload columns
    — ``np.unique`` over the int64 key per block, no string aggregation.
    Same declared-cardinality contract: tree below ``tree_max_groups``
    (per ``approx_count``), keyed hash-shuffle above."""

    def uniq(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        pk = b[key].to_numpy(zero_copy_only=False)
        _, idx = np.unique(pk, return_index=True)
        if idx.size == b.num_rows:
            return b
        return b.take(pa.array(np.sort(idx), pa.int64()))

    big = approx_count is not None and approx_count > tree_max_groups
    if big:
        from .joins import keyed_repartition, keyed_shuffle_partitions
        pre = ds.map_batches(uniq, batch_format="pyarrow", batch_size=None)
        return keyed_repartition(pre, keyed_shuffle_partitions(64),
                                 [key]).map_batches(
            uniq, batch_format="pyarrow", batch_size=None)

    return combine_tree(ds, uniq, fanout=fanout)
