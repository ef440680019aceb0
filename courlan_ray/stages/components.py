"""Connected components over verified pairs -> cluster assignments.

Two execution paths, chosen by edge count (SURVEY.md §7.4 "union-find at
scale"):

- ``driver_union_find``: edges below ``cfg.driver_cc_max_pairs`` are pulled
  to the driver (two narrow string columns) and solved with path-compressed
  union-find.  Dup edges are O(#duplicates), far smaller than the input.
- ``distributed_components``: iterative min-label propagation expressed as
  Ray Data shuffles (the BTS-style alternative, PAPERS.md): each round
  joins the label table to the symmetric edge list and takes the per-node
  minimum neighbor label; converges in O(cluster diameter) rounds, counted
  and bounded by ``cfg.cc_max_rounds``.

``cluster_id`` is the minimum ``image_id`` of the component — order-free
determinism (SURVEY.md §4): no dependence on arrival order or parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DedupConfig
from .joins import _collect


def driver_union_find(edges: pd.DataFrame) -> pd.DataFrame:
    """(left_id, right_id) -> (image_id, cluster_id) for nodes in edges."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:      # path compression
            parent[x], x = root, parent[x]
        return root

    for l, r in zip(edges["left_id"], edges["right_id"]):
        rl, rr = find(l), find(r)
        if rl != rr:
            # min-root union keeps cluster_id = min id without a second pass
            lo, hi = (rl, rr) if rl < rr else (rr, rl)
            parent[hi] = lo
    nodes = pd.unique(pd.concat([edges["left_id"], edges["right_id"]],
                                ignore_index=True))
    return pd.DataFrame({"image_id": nodes,
                         "cluster_id": [find(x) for x in nodes]})


def distributed_components(edges_ds, cfg: DedupConfig,
                           approx_nodes: int | None = None):
    """Min-label propagation + pointer jumping entirely in Ray Data.
    Returns a Dataset (image_id, cluster_id) covering every node appearing
    in edges.

    Each round does (a) neighbor min-propagation and (b) a pointer-jump
    shortcut (label <- label's label), so convergence is O(log diameter)
    rounds, not O(diameter) — chain-shaped substring clusters deeper than
    ``cfg.cc_max_rounds`` still converge (ADVICE round 1 #3).
    ``approx_nodes`` (an upper bound on the node count) routes the label
    aggregations to the keyed-shuffle path when the key space exceeds the
    combine tree's single-task capacity."""
    import pyarrow.compute as pc
    from .agg import grouped_agg
    from .joins import attach_by_key

    def symmetric(batch: pa.Table) -> pa.Table:
        return pa.table({
            "image_id": pa.concat_arrays([batch["left_id"].combine_chunks(),
                                          batch["right_id"].combine_chunks()]),
            "nbr": pa.concat_arrays([batch["right_id"].combine_chunks(),
                                     batch["left_id"].combine_chunks()]),
        })

    sym = edges_ds.map_batches(symmetric, batch_format="pyarrow").materialize()
    if approx_nodes is None:
        approx_nodes = sym.count()       # 2 * edges >= node count

    def min_label(ds):
        return grouped_agg(ds, ["image_id"], [("label", "min", "label")],
                           approx_count=approx_nodes)

    def pointer_jump(labels):
        # label <- label[label]: every label IS a node id, so the lookup
        # table is labels itself re-keyed by image_id
        parents = labels.map_batches(
            lambda b: pa.table({"label": b["image_id"],
                                "parent": b["label"]}),
            batch_format="pyarrow")
        j = attach_by_key(labels, parents, ["label"],
                          num_partitions=cfg.shuffle_partitions, how="left")
        return j.map_batches(
            lambda b: pa.table({
                "image_id": b["image_id"],
                "label": pc.coalesce(b["parent"], b["label"])}),
            batch_format="pyarrow")

    # labels: min neighbor vs self per node
    labels = min_label(sym.map_batches(
        lambda b: pa.table({"image_id": b["image_id"], "label": b["nbr"]}),
        batch_format="pyarrow"))
    labels = labels.map_batches(
        lambda b: pa.table({
            "image_id": b["image_id"],
            "label": pc.min_element_wise(b["label"], b["image_id"])}),
        batch_format="pyarrow").materialize()

    converged = False
    for _round in range(cfg.cc_max_rounds):
        # propagate: node label flows to each neighbor, take min with own
        prop = attach_by_key(sym, labels, ["image_id"],
                             num_partitions=cfg.shuffle_partitions)
        cand = prop.map_batches(
            lambda b: pa.table({"image_id": b["nbr"], "label": b["label"]}),
            batch_format="pyarrow")
        merged = cand.union(labels.select_columns(["image_id", "label"]))
        new_labels = pointer_jump(min_label(merged)).materialize()

        # fixpoint check: total label hash invariant under convergence
        changed = _label_digest(new_labels) != _label_digest(labels)
        labels = new_labels
        if not changed:
            converged = True
            break
    if not converged:
        import logging
        logging.getLogger(__name__).warning(
            "distributed_components: digest fixpoint NOT reached after %d "
            "rounds — labels may be under-merged (components split); raise "
            "cfg.cc_max_rounds", cfg.cc_max_rounds)
    return labels.rename_columns({"label": "cluster_id"})


def _label_digest(labels_ds) -> int:
    from ray.data.aggregate import Sum
    from ..functions.hashing import hash_strings, hash_u64_pair

    def digest(batch: pa.Table) -> pa.Table:
        h = hash_u64_pair(hash_strings(batch["image_id"].to_pylist(), seed=5),
                          hash_strings(batch["label"].to_pylist(), seed=6))
        return pa.table({"d": pa.array([int(h.view(np.int64).sum())], pa.int64())})

    out = labels_ds.map_batches(digest, batch_format="pyarrow") \
                   .aggregate(Sum("d", alias_name="d"))
    return out["d"]


def connected_components(edges_ds, cfg: DedupConfig):
    """Verified+exact edges -> (image_id, cluster_id) Dataset for all nodes
    appearing in any edge.  Path chosen by edge count."""
    import ray.data as rd

    n_edges = edges_ds.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({"image_id": pa.array([], pa.string()),
                                       "cluster_id": pa.array([], pa.string())}))
    if n_edges <= cfg.driver_cc_max_pairs:
        tbl = _collect(edges_ds.select_columns(["left_id", "right_id"]))
        out = driver_union_find(tbl.to_pandas())
        return rd.from_pandas(out)
    return distributed_components(edges_ds, cfg, approx_nodes=2 * n_edges)


def assign_clusters(all_ids_ds, components_ds, cfg: DedupConfig):
    """Every valid row gets a cluster_id: its component root, or itself for
    singletons.  Broadcast when components are small, else partitioned join."""
    from .joins import broadcast_lookup, _collect
    import pyarrow.compute as pc

    from .joins import attach_by_key
    out = attach_by_key(all_ids_ds, components_ds, ["image_id"],
                        num_partitions=cfg.shuffle_partitions, how="left")
    return out.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("cluster_id"),
                               "cluster_id",
                               pc.coalesce(b["cluster_id"], b["image_id"])),
        batch_format="pyarrow")
