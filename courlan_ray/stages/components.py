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
    """(left_id, right_id) -> (image_id, cluster_id) for nodes in edges.

    Fully vectorized: ids are factorized to ints sorted so that label
    order == id order, then min-label flows along edges with
    ``np.minimum.at`` + pointer-jump compression until fixpoint —
    O(E * log(diameter)) C-speed passes, no Python per-edge loop
    (the 1M+-edge driver path was a multi-second serial floor)."""
    cat = pd.concat([edges["left_id"], edges["right_id"]],
                    ignore_index=True)
    codes, uniques = pd.factorize(cat, sort=True)   # sorted: min code=min id
    m = len(edges)
    u, v = codes[:m], codes[m:]
    labels = np.arange(len(uniques), dtype=np.int64)
    while True:
        before = labels
        lu, lv = labels[u], labels[v]
        mn = np.minimum(lu, lv)
        labels = labels.copy()
        np.minimum.at(labels, u, mn)
        np.minimum.at(labels, v, mn)
        # pointer-jump until self-stable (few hops; all C-speed)
        while True:
            nxt = labels[labels]
            if np.array_equal(nxt, labels):
                break
            labels = nxt
        if np.array_equal(labels, before):
            break
    return pd.DataFrame({"image_id": uniques,
                         "cluster_id": uniques.take(labels)})


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


def cluster_assignments(edges_ds, all_ids_ds, cfg: DedupConfig):
    """edges + all valid ids -> (image_id, cluster_id, is_representative,
    cluster_size) in one pass.

    Small-edge path (below ``cfg.driver_cc_max_pairs``): vectorized driver
    union-find, then ONE broadcast ``map_batches`` emits assignment,
    representative flag and cluster size together — replacing the
    assign-join + per-cluster-aggregate + re-join chain (3 stage barriers)
    with a single map.  Large path: distributed label propagation followed
    by the join-based assign + representatives stages."""
    import ray
    import ray.data as rd
    from ..functions.hashing import hash_strings
    from .joins import cached_get
    from .sampling import cluster_representatives

    edges_ds = edges_ds.select_columns(["left_id", "right_id"]).materialize()
    n_edges = edges_ds.count()      # metadata-only; no second execution
    if n_edges > cfg.driver_cc_max_pairs:
        comp = distributed_components(edges_ds, cfg,
                                      approx_nodes=2 * n_edges)
        assigned = assign_clusters(all_ids_ds, comp, cfg)
        return cluster_representatives(assigned, cfg)

    if n_edges == 0:
        comp_df = pd.DataFrame({"image_id": [], "cluster_id": []})
    else:
        comp_df = driver_union_find(_collect(edges_ds).to_pandas())

    # broadcast pack: id-hash-sorted membership + per-node cluster id/size
    ids = comp_df["image_id"].to_numpy(dtype=object)
    idh = hash_strings(ids, seed=0xC1A5)
    order = np.argsort(idh, kind="stable")
    sizes = comp_df["cluster_id"].map(
        comp_df["cluster_id"].value_counts()).to_numpy()
    pack_ref = ray.put({
        "id_hash": np.ascontiguousarray(idh[order]),
        "cid": pa.array(comp_df["cluster_id"].to_numpy(dtype=object)[order],
                        pa.string()),
        "size": np.ascontiguousarray(sizes[order].astype(np.int64)),
    })

    def kernel(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        pack = cached_get(pack_ref)
        id_hash = pack["id_hash"]
        bid = batch["image_id"]
        probe = hash_strings(bid.to_pylist(), seed=0xC1A5)
        n = batch.num_rows
        own = pc.cast(bid.combine_chunks() if
                      isinstance(bid, pa.ChunkedArray) else bid, pa.string())
        if id_hash.size:
            pos = np.clip(np.searchsorted(id_hash, probe),
                          0, id_hash.size - 1)
            hit = id_hash[pos] == probe
            cid = pack["cid"].take(pa.array(pos, pa.int64()))
            cid = pc.if_else(pa.array(hit), cid, own)
            size = np.where(hit, pack["size"][pos], 1)
        else:
            # no merged components at all: every row is its own singleton
            # (take() on the empty membership array would raise)
            cid = own
            size = np.ones(n, dtype=np.int64)
        return pa.table({
            "image_id": batch["image_id"],
            "cluster_id": cid,
            "cluster_size": pa.array(size, pa.int64()),
            "is_representative": pc.equal(
                pc.cast(batch["image_id"], pa.string()), cid),
        })

    return all_ids_ds.map_batches(kernel, batch_format="pyarrow")


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
