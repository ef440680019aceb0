"""Deterministic synthetic image+caption table with planted duplicate truth.

Schema = exactly the BASELINE.json input_hint shape:
``image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64``.

Every row is a pure function of ``(index, seed)`` so generation runs as a
parallel ``map_batches`` over ``ray.data.range(n)`` and the ground-truth
tables are derivable without generating any pixel data.  Planted structure
(FIXTURES.md §A, mirroring the reference's known-variant dedup tests,
/root/reference/tests/urlstore_tests.py:225-242):

- pool rows (``i % 10 == 0``): always originals; duplicates reference them
- ``exact``  (~5%): identical bytes + caption under a new image_id
- ``img``    (~5%): same source re-encoded lossy (PSNR >= 40 dB)
- ``cap``    (~5%): caption with a small word edit (shingle Jaccard >= ~0.9)
- ``sub``    (~2%): caption sharing a long verbatim substring (suffix channel)
- ``dirt``   (~3%): caption differing only in scrubbed dirt -> exact after
  canonicalization (idempotency golden, cf. unit_tests.py:169-181)
- ``invalid``(~2%): undecodable bytes / bad fmt / short / spam / too-long
- ``hot``    (~1%): one constant caption -> skewed LSH bucket (salting test)
- everything else: singleton originals
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64, hash_u64_pair
from ..functions import imagecodec as codec

_U64 = np.uint64

KIND_ORIG, KIND_EXACT, KIND_IMG, KIND_CAP, KIND_SUB, KIND_DIRT, KIND_INVALID, KIND_HOT = range(8)
KIND_NAMES = ["orig", "exact", "img", "cap", "sub", "dirt", "invalid", "hot"]

HOT_CAPTION = "stock photo of a generic product on a plain white background"

_VOCAB = [
    "river", "mountain", "harbor", "lantern", "meadow", "forest", "glacier",
    "village", "market", "bridge", "castle", "garden", "island", "desert",
    "sunset", "sunrise", "autumn", "winter", "spring", "summer", "bicycle",
    "train", "sailboat", "airplane", "museum", "library", "bakery", "café",
    "street", "plaza", "fountain", "statue", "windmill", "lighthouse",
    "waterfall", "canyon", "valley", "orchard", "vineyard", "farmhouse",
    "old", "ancient", "quiet", "busy", "colorful", "foggy", "snowy", "rainy",
    "golden", "silver", "wooden", "stone", "brick", "narrow", "wide", "tall",
    "small", "grand", "hidden", "famous", "crowded", "empty", "bright",
    "dark", "red", "blue", "green", "amber", "violet", "crimson",
]


def _h(i: np.ndarray, seed: int, salt: int) -> np.ndarray:
    return splitmix64(np.asarray(i, dtype=_U64)
                      ^ splitmix64(np.asarray([(seed << 8) + salt], dtype=_U64)))


def row_plan(idx: np.ndarray, seed: int,
             hot_permille: int = 10) -> dict[str, np.ndarray]:
    """Vectorized plan: kind, content_id, quality, dims for each index.

    ``hot_permille`` widens the constant-caption hot band (default ~1% of
    body rows) for skew-robustness probes — e.g. 200 plants ~20% identical
    captions, the hot-band scenario north_rule's salting requirement is
    about.  The widened band eats only into ORIG singletons, so every
    other planted kind keeps its population and truth."""
    if not 1 <= hot_permille <= 780:
        raise ValueError("hot_permille must be in [1, 780]")
    idx = np.asarray(idx, dtype=np.int64)
    r = _h(idx, seed, 1) % _U64(1000)
    kind = np.full(idx.shape, KIND_ORIG, dtype=np.int8)
    pool = idx % 10 == 0
    npool = np.maximum(idx // 10, 1)                  # originals available before i
    body = ~pool
    kind[body & (r < 50)] = KIND_EXACT
    kind[body & (r >= 50) & (r < 100)] = KIND_IMG
    kind[body & (r >= 100) & (r < 150)] = KIND_CAP
    kind[body & (r >= 150) & (r < 170)] = KIND_SUB
    kind[body & (r >= 170) & (r < 200)] = KIND_DIRT
    kind[body & (r >= 200) & (r < 220)] = KIND_INVALID
    kind[body & (r >= 220) & (r < 220 + hot_permille)] = KIND_HOT

    source = (_h(idx, seed, 2) % npool.astype(_U64)).astype(np.int64) * 10
    dup = np.isin(kind, (KIND_EXACT, KIND_IMG, KIND_CAP, KIND_SUB, KIND_DIRT))
    content_id = np.where(dup, source, idx)

    dims = np.array([64, 96, 128], dtype=np.int32)
    size = dims[(_h(content_id, seed, 3) % _U64(3)).astype(np.int64)]
    quality = np.where(kind == KIND_IMG, 75, 90).astype(np.int32)
    fmt_lossy = (_h(content_id, seed, 4) % _U64(2)) == 0
    return {"idx": idx, "kind": kind, "content_id": content_id, "size": size,
            "quality": quality, "fmt_lossy": fmt_lossy}


def _caption_words(content_id: int, seed: int) -> list[str]:
    cid = np.asarray([content_id], dtype=np.int64)
    n_words = 8 + int(_h(cid, seed, 5)[0] % _U64(8))
    # fold the full content_id into every slot hash so no two contents
    # share a word sequence
    slots = np.int64(content_id) * 64 + np.arange(n_words, dtype=np.int64)
    picks = (_h(slots, seed, 6) % _U64(len(_VOCAB))).astype(np.int64)
    return [_VOCAB[p] for p in picks]


def make_caption(i: int, kind: int, content_id: int, seed: int) -> str:
    if kind == KIND_HOT:
        return HOT_CAPTION
    words = _caption_words(content_id, seed)
    cap = "a photo of the " + " ".join(words)
    if kind == KIND_CAP:
        cap = cap + " today"                      # small edit: high shingle Jaccard
    elif kind == KIND_SUB:
        cap = "breaking news update " + cap       # long shared verbatim substring
    elif kind == KIND_DIRT:
        # only dirt the canonicalizer fully removes: whitespace runs, control
        # chars, markup rests, tracker tokens -> exact dup after scrub
        cap = "  " + cap.replace(" the ", " the  ", 1) + " \t<b></b> utm_source=feed \x07"
    elif kind == KIND_INVALID:
        v = int(_h(np.asarray([i], dtype=np.int64), seed, 7)[0] % _U64(3))
        if v == 0:
            cap = "img"                           # too short
        elif v == 1:
            cap = "click here FREE casino viagra winner http://spam.example/now"
        else:
            cap = cap + " word" * 200             # too long
    return cap


def make_image(content_id: int, size: int, seed: int) -> np.ndarray:
    """Procedural (size, size, 3) uint8, deterministic per content_id.

    Content must be *perceptually distinct* across content_ids (random
    low-frequency fields + opaque shapes + texture noise) so that, like
    real photos, unrelated images sit far apart in phash/SimHash space
    while re-encodes of the same content stay within the Hamming ball."""
    rng = np.random.Generator(np.random.PCG64(
        int(hash_u64_pair(np.asarray([content_id], dtype=_U64),
                          _U64(seed & 0xFFFFFFFFFFFFFFFF))[0])))
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / size
    img = np.empty((size, size, 3))
    # random low-frequency field per channel (distinct global structure)
    for c in range(3):
        fx, fy = rng.uniform(0.5, 3.0, 2)
        px, py = rng.uniform(0, 2 * np.pi, 2)
        amp = rng.uniform(60, 120)
        img[:, :, c] = 128 + amp * np.sin(2 * np.pi * fx * x + px) \
                            * np.cos(2 * np.pi * fy * y + py)
    # opaque rectangles (strong mid-frequency structure)
    for _ in range(10):
        y0, x0 = rng.integers(0, size, 2)
        hh, ww = rng.integers(size // 8, size // 2, 2)
        img[y0:y0 + hh, x0:x0 + ww] = rng.integers(0, 256, 3)
    # texture noise (decorrelates fine detail; survives quantization)
    img += rng.normal(0, 12, (size, size, 3))
    return img.clip(0, 255).astype(np.uint8)


def generate_rows(idx: np.ndarray, seed: int,
                  hot_permille: int = 10) -> pa.Table:
    """Generate the input_hint-shaped table for a batch of indices."""
    plan = row_plan(idx, seed, hot_permille)
    n = len(idx)
    ids, payloads, ws, hs, fmts, caps, phashes = [], [], [], [], [], [], []
    for j in range(n):
        i = int(plan["idx"][j]); kind = int(plan["kind"][j])
        cid = int(plan["content_id"][j]); size = int(plan["size"][j])
        # near-dup-image rows are always re-encoded lossy; everyone else
        # keeps the content's own fmt so exact dups are byte-identical
        fmt = "jpeg" if (kind == KIND_IMG or plan["fmt_lossy"][j]) else "png"
        cap = make_caption(i, kind, cid, seed)
        if kind == KIND_INVALID:
            v = int(_h(np.asarray([i], dtype=np.int64), seed, 8)[0] % _U64(2))
            if v == 0:
                payload = b"\x89GARBAGE" + bytes(_h(np.arange(24, dtype=np.int64),
                                                    seed, 9).view(np.uint8))
            else:
                img = make_image(cid, size, seed)
                payload = codec.encode_image(img, "png")
                fmt = "bmp"                        # fmt outside the allowlist
            ph = 0
        else:
            img = make_image(cid, size, seed)
            payload = codec.encode_image(img, fmt, quality=int(plan["quality"][j]))
            ph = int(np.array([codec.phash64(codec.decode_image(payload))],
                              dtype=np.uint64).view(np.int64)[0])
        ids.append(f"img-{i:012d}")
        payloads.append(payload)
        ws.append(size); hs.append(size); fmts.append(fmt)
        caps.append(cap); phashes.append(ph)
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(phashes, pa.int64()),
    })


def synth_dataset(n: int, seed: int = 42, *, concurrency: int | None = None,
                  batch_size: int = 1024, hot_permille: int = 10):
    """Lazy Ray Dataset of n synthetic rows (parallel deterministic gen)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_rows(batch["id"].to_numpy(), seed, hot_permille)

    ds = rd.range(n).map_batches(gen, batch_format="pyarrow",
                                 batch_size=batch_size,
                                 **({"concurrency": concurrency} if concurrency else {}))
    return ds


def synth_parquet(n: int, seed: int = 42, root: str = "/tmp/courlan_ray_synth",
                  *, batch_size: int = 1024, hot_permille: int = 10) -> str:
    """Generate (once) and cache the synthetic table as parquet; returns the
    directory.  Tests and benchmarks read from here so pipeline re-executions
    re-read cheap parquet instead of re-synthesizing pixels."""
    import os

    from .cache import cached_parquet

    suffix = "" if hot_permille == 10 else f"-h{hot_permille}"
    # many small files: read parallelism should never be capped by the
    # file count (16 files would cap a 32-CPU read at 16 tasks)
    return cached_parquet(
        os.path.join(root, f"n{n}-s{seed}{suffix}"),
        lambda: synth_dataset(n, seed, batch_size=batch_size,
                              hot_permille=hot_permille),
        rows_per_file=batch_size)


def synth_table(n: int, seed: int = 42, hot_permille: int = 10) -> pa.Table:
    """Driver-side table for unit tests (small n only)."""
    return generate_rows(np.arange(n, dtype=np.int64), seed, hot_permille)


def truth_tables(n: int, seed: int = 42,
                 hot_permille: int = 10) -> tuple[pa.Table, pa.Table]:
    """(truth_pairs, truth_clusters) derived from the pure row plan.

    truth_pairs: (left_id, right_id, kind) one row per planted duplicate.
    truth_clusters: (image_id, cluster_id) for every valid row; cluster_id =
    min image_id of the content group (order-free determinism, SURVEY.md §4).
    """
    plan = row_plan(np.arange(n, dtype=np.int64), seed, hot_permille)
    kind, cid, idx = plan["kind"], plan["content_id"], plan["idx"]
    valid = kind != KIND_INVALID
    # group key: content id, except hot rows which share one caption cluster
    group = np.where(kind == KIND_HOT, np.int64(-1), cid)

    ids = np.array([f"img-{i:012d}" for i in idx])
    dup = np.isin(kind, (KIND_EXACT, KIND_IMG, KIND_CAP, KIND_SUB, KIND_DIRT))
    left = np.array([f"img-{c:012d}" for c in cid[dup]])
    pairs = pa.table({
        "left_id": pa.array(left, pa.string()),
        "right_id": pa.array(ids[dup], pa.string()),
        "kind": pa.array([KIND_NAMES[k] for k in kind[dup]], pa.string()),
    })
    # hot rows pair with the first hot row
    hot = np.flatnonzero(kind == KIND_HOT)
    if hot.size > 1:
        first = ids[hot[0]]
        hp = pa.table({
            "left_id": pa.array([first] * (hot.size - 1), pa.string()),
            "right_id": pa.array(ids[hot[1:]], pa.string()),
            "kind": pa.array(["hot"] * (hot.size - 1), pa.string()),
        })
        pairs = pa.concat_tables([pairs, hp])

    import pandas as pd
    df = pd.DataFrame({"image_id": ids[valid], "group": group[valid]})
    df["cluster_id"] = df.groupby("group")["image_id"].transform("min")
    clusters = pa.table({
        "image_id": pa.array(df["image_id"], pa.string()),
        "cluster_id": pa.array(df["cluster_id"], pa.string()),
    })
    return pairs, clusters
