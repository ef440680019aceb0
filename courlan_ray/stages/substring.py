"""Exact shared-substring pair detection + suffix-array LCS verification.

The third north-star signature family (after MinHash and SimHash) is
suffix-array substring detection for near-verbatim caption overlap.  The
approximate tier is winnowing (``functions/hashing.winnowing_fingerprints``,
used by the flagship's substring channel); this stage is the EXACT tier:

- ``substring_pairs``: every unordered doc pair sharing at least one exact
  ``width``-character substring, with the shared-gram count
  ``|grams(a) ∩ grams(b)|``.  Seeding is lossless: a common substring of
  length ≥ width ⟺ a shared width-gram, so the pair set equals
  { (a,b) : LCS(a,b) ≥ width } exactly.  ANSI-SQL-expressible (the DuckDB
  oracle enumerates substrings with ``generate_series`` + self-join), so
  the driver value-verifies it end to end.
- ``substring_lcs``: the same pairs with the exact longest-common-substring
  length, computed per pair by the generalized suffix array
  (``functions/suffixarray.lcs_len``) — the genuinely-suffix-array kernel;
  every emitted ``lcs_len`` is ≥ width by the seeding invariant (pinned by
  test).  Not SQL-expressible (rows-only check); parity vs the O(n·m) DP
  is property-tested.

Scale shape (the 100 TB path), mirroring ``stages/ngram_jaccard``:
  - gram sets: one ``map_batches`` pass — byte-level rolling polynomial
    hash of every width-gram (``char_shingle_hashes``), per-segment
    sort+unique, no Python per row.
  - postings: narrow (gram:int64, doc_id) rows; ONE keyed hash-shuffle
    ``repartition(P, keys=["gram"])`` co-locates each posting list, pairs
    are emitted per partition (each shared gram lives in exactly one
    partition, so cross-partition double-counting is impossible).
  - shared-gram counts: ``grouped_agg`` over (left_id, right_id) with the
    declared n² cardinality bound -> keyed-shuffle combine above the tree
    threshold.
  Below ``driver_max`` docs the link short-circuits to one vectorized
  driver pass (same kernels, no shuffle overhead at test scale).

Quadratic contract (same as ngram_jaccard's m(m-1)/2): a width-gram shared
by g documents emits g(g-1)/2 pairs — the exact answer.  Boilerplate-heavy
corpora (license headers, templated prefixes) should run
``stages/exact_dedup`` first and/or raise ``width`` past the boilerplate
length.  There is no SILENT posting-list cap (an exact operator that
quietly drops hot grams would be wrong, not slow) — but there IS an
explicit capped mode: ``hot_gram_max=g`` skips pair emission for any gram
shared by more than ``g`` documents (one boilerplate license header at
100 TB is a g(g-1)/2 partition-killer) and reports exactly what was
dropped through the ``lineage`` out-dict (dropped_grams,
dropped_postings, max_postings) so the loss is accounted, never hidden.
Pairs that share at least one sub-cap gram are still found; only pairs
whose EVERY shared gram is hot are missed — the standard
hot-token-cap contract of prefix-filtered similarity joins.

Hash-identity caveat: grams are 64-bit rolling hashes; a cross-gram
collision (p ≈ 2^-64 per pair) could add a false pair / inflate a count.
The LCS tier is immune (it re-reads the raw bytes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import (_ranges_within, char_shingle_hashes,
                                 sort_segments)

_U64 = np.uint64


def _gram_sets(texts, width: int, seed: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """Distinct width-gram (byte window) hashes per text, each segment
    sorted ascending.  Texts shorter than ``width`` bytes contribute ZERO
    grams (matching the SQL twin, where ``length(text) - width + 1 < 1``
    yields no rows — unlike the MinHash convention of one padded shingle).
    Returns (flat:uint64, counts:int64)."""
    if hasattr(texts, "to_pylist"):
        texts = texts.to_pylist()
    btexts = [t.encode("utf-8", "surrogatepass") if isinstance(t, str)
              else (t or b"") for t in texts]
    n = len(btexts)
    flat, counts = char_shingle_hashes(btexts, width, seed=seed)
    if n == 0:
        return flat, counts
    lens = np.fromiter((len(t) for t in btexts), count=n, dtype=np.int64)
    short = lens < width
    if short.any():                      # drop the padded single shingle
        flat = flat[np.repeat(~short, counts)]
        counts = np.where(short, 0, counts)
    flat = sort_segments(flat, counts)
    if flat.size == 0:
        return flat, counts
    seg = np.repeat(np.arange(n, dtype=np.int64), counts)
    first = np.empty(flat.size, dtype=bool)
    first[0] = True
    first[1:] = (flat[1:] != flat[:-1]) | (seg[1:] != seg[:-1])
    return flat[first], np.bincount(seg[first], minlength=n).astype(np.int64)


def _pairs_per_gram(gram: np.ndarray, doc: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
    """One (left<right) doc pair row per shared gram (NOT deduped across
    grams — the downstream count over identical pairs IS the shared-gram
    count).  Reuses the posting-group expansion of the ngram stage with
    the length filter disabled (threshold 0 keeps every pair)."""
    from .ngram_jaccard import _pairs_from_postings
    ones = np.ones(doc.shape[0], dtype=np.int64)
    return _pairs_from_postings(gram, doc, ones, 0.0)


def _drop_hot_grams(gram: np.ndarray, cap: int,
                    lineage: dict | None) -> np.ndarray:
    """Boolean keep-mask over posting rows, dropping every row of a gram
    with more than ``cap`` postings.  ``gram`` must contain each gram's
    COMPLETE posting set (driver path: the whole corpus; shuffle path: one
    keyed partition, where each gram lives wholly).  Accumulates exact
    dropped-gram lineage counts into ``lineage`` when given."""
    uniq, inv, counts = np.unique(gram, return_inverse=True,
                                  return_counts=True)
    keep = counts[inv] <= cap
    if lineage is not None:
        hot = counts > cap
        lineage["dropped_grams"] = lineage.get("dropped_grams", 0) \
            + int(hot.sum())
        lineage["dropped_postings"] = lineage.get("dropped_postings", 0) \
            + int(counts[hot].sum())
        lineage["max_postings"] = max(lineage.get("max_postings", 0),
                                      int(counts.max()) if counts.size else 0)
    return keep


def substring_pairs(ds, *, width: int = 32, id_col: str = "doc_id",
                    text_col: str = "text", seed: int = 37,
                    driver_max: int = 100_000,
                    shuffle_partitions: int = 64,
                    hot_gram_max: int | None = None,
                    lineage: dict | None = None):
    """Dataset -> exact shared-substring pair table
    (left_id, right_id, shared_grams), every unordered pair of docs whose
    texts share an exact ``width``-byte substring, sorted by
    (left_id, right_id).  See module docstring for the scale shape.

    ``hot_gram_max``: optional explicit cap — grams shared by more than
    this many docs emit NO pairs (g(g-1)/2 blowup guard); exact dropped
    counts land in the caller-supplied ``lineage`` dict
    (dropped_grams/dropped_postings/max_postings).  Default ``None`` keeps
    the fully-exact contract."""
    import ray.data as rd
    from .agg import grouped_agg
    from .joins import (_collect, keyed_repartition,
                        keyed_shuffle_partitions, safe_combine)

    def sig_kernel(b: pa.Table) -> pa.Table:
        flat, counts = _gram_sets(b[text_col], width, seed)
        off = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(counts, out=off[1:])
        grams = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()),
            pa.array(flat.view(np.int64), pa.int64()))
        return pa.table({id_col: b[id_col], "grams": grams})

    sig = ds.map_batches(sig_kernel, batch_format="pyarrow",
                         batch_size=256).materialize()
    n_docs = sig.count()

    def finish(left: np.ndarray, right: np.ndarray, shared: np.ndarray):
        order = np.lexsort((right, left))
        return rd.from_arrow(pa.table({
            "left_id": pa.array(left[order]),
            "right_id": pa.array(right[order]),
            "shared_grams": pa.array(shared[order].astype(np.int64)),
        }))

    if n_docs == 0:
        # a fully-empty input can collect schema-less (no blocks); emit the
        # typed empty directly (int64 ids — the documents-table id type)
        return rd.from_arrow(pa.table({
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "shared_grams": pa.array([], pa.int64())}))

    if n_docs <= driver_max:
        tbl = safe_combine(_collect(sig))
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        arr = safe_combine(tbl["grams"])
        off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        sizes = np.diff(off)
        flat = np.asarray(arr.flatten()
                          .to_numpy(zero_copy_only=False)).view(_U64)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), sizes)
        if hot_gram_max is not None:
            keep = _drop_hot_grams(flat, hot_gram_max, lineage)
            flat, doc_idx = flat[keep], doc_idx[keep]
        li, ri = _pairs_per_gram(flat, doc_idx)
        if li.size == 0:
            return finish(ids[:0], ids[:0], np.zeros(0, dtype=np.int64))
        # positional pair key is exact (no hash): count rows per pair
        key = li * np.int64(n_docs) + ri
        uk, shared = np.unique(key, return_counts=True)
        li, ri = uk // np.int64(n_docs), uk % np.int64(n_docs)
        l_val, r_val = ids[li], ids[ri]
        sw = l_val > r_val                 # canonicalize by id VALUE
        return finish(np.where(sw, r_val, l_val),
                      np.where(sw, l_val, r_val), shared)

    # ---- scale path: keyed shuffle on gram, count pairs via grouped_agg
    def postings_kernel(b: pa.Table) -> pa.Table:
        arr = safe_combine(b["grams"])
        o = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = np.asarray(arr.flatten()
                          .to_numpy(zero_copy_only=False))
        ridx = np.repeat(np.arange(b.num_rows), np.diff(o))
        return pa.table({"gram": pa.array(flat, pa.int64()),
                         id_col: b[id_col].take(pa.array(ridx))})

    def pair_kernel(b: pa.Table) -> pa.Table:
        gram = b["gram"].to_numpy(zero_copy_only=False).view(_U64)
        doc = b[id_col].to_numpy(zero_copy_only=False)
        if hot_gram_max is not None:
            # each gram lives wholly in this partition (keyed shuffle), so
            # the local posting count IS the global one — the cap is exact
            keep = _drop_hot_grams(gram, hot_gram_max, None)
            gram, doc = gram[keep], doc[keep]
        li, ri = _pairs_per_gram(gram, doc)
        sw = li > ri                       # canonicalize by id VALUE
        return pa.table({
            "left_id": pa.array(np.where(sw, ri, li)),
            "right_id": pa.array(np.where(sw, li, ri))})

    postings = sig.map_batches(postings_kernel, batch_format="pyarrow")
    shuffled = keyed_repartition(
        postings, keyed_shuffle_partitions(shuffle_partitions), ["gram"])
    if hot_gram_max is not None and lineage is not None:
        # exact dropped-gram accounting: one narrow pass over the already-
        # shuffled postings (hot grams are few by definition — the stats
        # rows are one per partition, trivially collectable)
        shuffled = shuffled.materialize()

        def hot_stats(b: pa.Table) -> pa.Table:
            g = b["gram"].to_numpy(zero_copy_only=False).view(_U64)
            _, counts = np.unique(g, return_counts=True)
            hot = counts > hot_gram_max
            return pa.table({
                "dropped_grams": pa.array([int(hot.sum())], pa.int64()),
                "dropped_postings": pa.array([int(counts[hot].sum())],
                                             pa.int64()),
                "max_postings": pa.array(
                    [int(counts.max()) if counts.size else 0], pa.int64())})

        st = shuffled.map_batches(hot_stats, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
        lineage["dropped_grams"] = lineage.get("dropped_grams", 0) \
            + int(st["dropped_grams"].sum())
        lineage["dropped_postings"] = lineage.get("dropped_postings", 0) \
            + int(st["dropped_postings"].sum())
        lineage["max_postings"] = max(lineage.get("max_postings", 0),
                                      int(st["max_postings"].max()))
    pairs = shuffled.map_batches(pair_kernel, batch_format="pyarrow",
                                 batch_size=None)
    counted = grouped_agg(pairs, ["left_id", "right_id"],
                          [("left_id", "count", "shared_grams")],
                          approx_count=n_docs * n_docs)
    return counted.sort(["left_id", "right_id"])


def substring_lcs(ds, *, width: int = 32, id_col: str = "doc_id",
                  text_col: str = "text", seed: int = 37,
                  driver_max: int = 100_000,
                  shuffle_partitions: int = 64,
                  hot_gram_max: int | None = None,
                  lineage: dict | None = None):
    """Dataset -> (left_id, right_id, lcs_len) for every pair sharing an
    exact ``width``-byte substring — candidates from ``substring_pairs``
    (lossless seeding), exact LCS per pair via the generalized suffix
    array, fanned out through the size-adaptive pair join.  Every emitted
    ``lcs_len`` is ≥ width by construction."""
    from ..functions.suffixarray import lcs_len
    from .joins import hash_join_pairs

    import ray.data as rd

    pairs = substring_pairs(ds, width=width, id_col=id_col,
                            text_col=text_col, seed=seed,
                            driver_max=driver_max,
                            shuffle_partitions=shuffle_partitions,
                            hot_gram_max=hot_gram_max, lineage=lineage
                            ).drop_columns(["shared_grams"]).materialize()
    if pairs.count() == 0:
        return rd.from_arrow(pa.table({
            "left_id": pa.array([], pa.int64()),
            "right_id": pa.array([], pa.int64()),
            "lcs_len": pa.array([], pa.int64())}))
    texts = ds.map_batches(
        lambda b: b.select([id_col, text_col]),
        batch_format="pyarrow", batch_size=None)
    joined = hash_join_pairs(pairs, texts, id_col=id_col,
                             payload_cols=[text_col])

    def lcs_kernel(b: pa.Table) -> pa.Table:
        lt = b[text_col + "_l"].to_pylist()
        rt = b[text_col + "_r"].to_pylist()
        out = np.empty(len(lt), dtype=np.int64)
        for i, (a, c) in enumerate(zip(lt, rt)):
            out[i] = lcs_len(a.encode("utf-8", "surrogatepass"),
                             c.encode("utf-8", "surrogatepass"))
        return pa.table({"left_id": b["left_id"],
                         "right_id": b["right_id"],
                         "lcs_len": pa.array(out)})

    return joined.map_batches(lcs_kernel, batch_format="pyarrow",
                              batch_size=2048).sort(["left_id", "right_id"])
