"""Deterministic synthetic video table with planted duplicate truth — the
video sibling of sources/synth.py (images) and audiosynth.py (audio).

Schema: ``video_id:string, bytes:binary (FVID container), n_frames:int32,
fps:int32, fmt:string, w:int32, h:int32``.

Planted structure:
- pool rows (``i % 10 == 0``): originals
- ``exact``   (~6%): byte-identical payload under a new video_id
- ``enc``     (~6%): same frames re-encoded lossy (jpeg q75 — every frame
  stays inside the phash PSNR>=40dB Hamming ball)
- ``invalid`` (~3%): non-FVID garbage or a truncated container
- everything else: singleton originals
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64
from ..functions import videocodec as vcodec
from .synth import make_image

_U64 = np.uint64

VKIND_ORIG, VKIND_EXACT, VKIND_ENC, VKIND_INVALID = range(4)
VKIND_NAMES = ["orig", "exact", "enc", "invalid"]

N_FRAMES = 6
SIZE = 64
FPS = 8


def _h(i: np.ndarray, seed: int, salt: int) -> np.ndarray:
    return splitmix64(np.asarray(i, dtype=_U64)
                      ^ splitmix64(np.asarray([(seed << 8) + salt],
                                              dtype=_U64)))


def video_row_plan(idx: np.ndarray, seed: int) -> dict[str, np.ndarray]:
    idx = np.asarray(idx, dtype=np.int64)
    r = _h(idx, seed, 1) % _U64(1000)
    kind = np.full(idx.shape, VKIND_ORIG, dtype=np.int8)
    pool = idx % 10 == 0
    body = ~pool
    kind[body & (r < 60)] = VKIND_EXACT
    kind[body & (r >= 60) & (r < 120)] = VKIND_ENC
    kind[body & (r >= 120) & (r < 150)] = VKIND_INVALID
    npool = np.maximum(idx // 10, 1)
    source = (_h(idx, seed, 2) % npool.astype(_U64)).astype(np.int64) * 10
    dup = np.isin(kind, (VKIND_EXACT, VKIND_ENC))
    content_id = np.where(dup, source, idx)
    return {"idx": idx, "kind": kind, "content_id": content_id}


def make_frames(content_id: int, seed: int) -> list[np.ndarray]:
    """Deterministic frames: each frame a distinct procedural image keyed
    by (content_id, frame) — temporal variation within one content."""
    return [make_image(content_id * 1009 + f + 1, SIZE, seed)
            for f in range(N_FRAMES)]


def generate_video_rows(idx: np.ndarray, seed: int) -> pa.Table:
    plan = video_row_plan(idx, seed)
    ids, payloads, fmts = [], [], []
    for j in range(len(idx)):
        i = int(plan["idx"][j])
        kind = int(plan["kind"][j])
        cid = int(plan["content_id"][j])
        if kind == VKIND_INVALID:
            v = int(_h(np.asarray([i], dtype=np.int64), seed, 4)[0] % _U64(2))
            frames = make_frames(cid, seed)
            payload = (b"MP4\x00" + bytes(_h(np.arange(32, dtype=np.int64),
                                             seed, 5).view(np.uint8))
                       if v == 0 else
                       vcodec.encode_video(frames, "png")[:16])
            fmt = "mp4" if v == 0 else "fvid"
        else:
            frames = make_frames(cid, seed)
            if kind == VKIND_ENC:
                payload = vcodec.encode_video(frames, "jpeg", quality=75)
            else:
                payload = vcodec.encode_video(frames, "png")
            fmt = "fvid"
        ids.append(f"vid-{i:012d}")
        payloads.append(payload)
        fmts.append(fmt)
    n = len(idx)
    return pa.table({
        "video_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "n_frames": pa.array([N_FRAMES] * n, pa.int32()),
        "fps": pa.array([FPS] * n, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "w": pa.array([SIZE] * n, pa.int32()),
        "h": pa.array([SIZE] * n, pa.int32()),
    })


def synth_video_dataset(n: int, seed: int = 42, *, batch_size: int = 64):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_video_rows(batch["id"].to_numpy(), seed)

    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=batch_size)


def synth_video_table(n: int, seed: int = 42) -> pa.Table:
    return generate_video_rows(np.arange(n, dtype=np.int64), seed)


def video_truth_pairs(n: int, seed: int = 42) -> pa.Table:
    plan = video_row_plan(np.arange(n, dtype=np.int64), seed)
    kind, cid, idx = plan["kind"], plan["content_id"], plan["idx"]
    dup = np.isin(kind, (VKIND_EXACT, VKIND_ENC))
    ids = np.array([f"vid-{i:012d}" for i in idx])
    return pa.table({
        "left_id": pa.array([f"vid-{c:012d}" for c in cid[dup]], pa.string()),
        "right_id": pa.array(ids[dup], pa.string()),
        "kind": pa.array([VKIND_NAMES[k] for k in kind[dup]], pa.string()),
    })


def synth_video_parquet(n: int, seed: int = 42,
                        root: str = "/tmp/courlan_ray_synth_video") -> str:
    """Generate (once) and cache the synthetic video table as parquet —
    queries re-read cheap parquet instead of re-synthesizing frames, and
    the DuckDB oracle SQL can scan the same files by path."""
    import os

    from .cache import cached_parquet

    return cached_parquet(os.path.join(root, f"n{n}-s{seed}"),
                          lambda: synth_video_dataset(n, seed),
                          rows_per_file=64)
