"""Deterministic synthetic audio table with planted duplicate truth — the
audio sibling of sources/synth.py (images).

Schema: ``audio_id:string, bytes:binary (16-bit PCM WAV), rate:int32,
channels:int32, fmt:string``.  Every row is a pure function of
``(index, seed)``; generation runs as a parallel ``map_batches`` over
``ray.data.range(n)``.

Planted structure (mirrors synth.py's kinds, adapted to the audio
fingerprint's contract — high-fidelity re-encodes, not degraded copies):

- pool rows (``i % 10 == 0``): originals
- ``exact``   (~6%): byte-identical payload under a new audio_id
- ``enc``     (~6%): same track gain-scaled 0.5x and re-encoded (the
  16-bit requant + gain channel audio_simhash64 is built for)
- ``invalid`` (~3%): non-RIFF garbage or a truncated header
- everything else: singleton originals
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64
from ..functions import audiocodec as acodec

_U64 = np.uint64

AKIND_ORIG, AKIND_EXACT, AKIND_ENC, AKIND_INVALID = range(4)
AKIND_NAMES = ["orig", "exact", "enc", "invalid"]

RATE = 16_000
DUR_SEC = 2.0


def _h(i: np.ndarray, seed: int, salt: int) -> np.ndarray:
    return splitmix64(np.asarray(i, dtype=_U64)
                      ^ splitmix64(np.asarray([(seed << 8) + salt],
                                              dtype=_U64)))


def audio_row_plan(idx: np.ndarray, seed: int) -> dict[str, np.ndarray]:
    idx = np.asarray(idx, dtype=np.int64)
    r = _h(idx, seed, 1) % _U64(1000)
    kind = np.full(idx.shape, AKIND_ORIG, dtype=np.int8)
    pool = idx % 10 == 0
    body = ~pool
    kind[body & (r < 60)] = AKIND_EXACT
    kind[body & (r >= 60) & (r < 120)] = AKIND_ENC
    kind[body & (r >= 120) & (r < 150)] = AKIND_INVALID
    npool = np.maximum(idx // 10, 1)
    source = (_h(idx, seed, 2) % npool.astype(_U64)).astype(np.int64) * 10
    dup = np.isin(kind, (AKIND_EXACT, AKIND_ENC))
    content_id = np.where(dup, source, idx)
    return {"idx": idx, "kind": kind, "content_id": content_id}


def make_track(content_id: int, seed: int) -> np.ndarray:
    """Deterministic mono track: 6 sinusoids + noise under a slow
    amplitude envelope — perceptually distinct per content_id, like
    synth.make_image's random fields."""
    rng = np.random.Generator(np.random.PCG64(
        int(_h(np.asarray([content_id], dtype=np.int64), seed, 3)[0])))
    t = np.arange(int(DUR_SEC * RATE)) / RATE
    x = np.zeros_like(t)
    for _ in range(6):
        f = rng.uniform(80, 4000)
        a = rng.uniform(0.05, 0.25)
        ph = rng.uniform(0, 2 * np.pi)
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0, 0.02, t.size)
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * rng.uniform(0.2, 1.0) * t
                            + rng.uniform(0, 2 * np.pi))
    return np.clip(x, -1, 1)


def generate_audio_rows(idx: np.ndarray, seed: int) -> pa.Table:
    plan = audio_row_plan(idx, seed)
    ids, payloads, rates, chans, fmts = [], [], [], [], []
    for j in range(len(idx)):
        i = int(plan["idx"][j])
        kind = int(plan["kind"][j])
        cid = int(plan["content_id"][j])
        if kind == AKIND_INVALID:
            v = int(_h(np.asarray([i], dtype=np.int64), seed, 4)[0] % _U64(2))
            payload = (b"OGGS" + bytes(_h(np.arange(32, dtype=np.int64),
                                          seed, 5).view(np.uint8))
                       if v == 0 else
                       acodec.encode_wav(make_track(cid, seed), RATE)[:20])
            fmt = "ogg" if v == 0 else "wav"
        else:
            x = make_track(cid, seed)
            if kind == AKIND_ENC:
                x = np.clip(x * 0.5, -1, 1)       # gain change + requant
            payload = acodec.encode_wav(x, RATE)
            fmt = "wav"
        ids.append(f"aud-{i:012d}")
        payloads.append(payload)
        rates.append(RATE)
        chans.append(1)
        fmts.append(fmt)
    return pa.table({
        "audio_id": pa.array(ids, pa.string()),
        "bytes": pa.array(payloads, pa.binary()),
        "rate": pa.array(rates, pa.int32()),
        "channels": pa.array(chans, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
    })


def synth_audio_dataset(n: int, seed: int = 42, *, batch_size: int = 256):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_audio_rows(batch["id"].to_numpy(), seed)

    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=batch_size)


def synth_audio_table(n: int, seed: int = 42) -> pa.Table:
    return generate_audio_rows(np.arange(n, dtype=np.int64), seed)


def audio_truth_pairs(n: int, seed: int = 42) -> pa.Table:
    """(left_id, right_id, kind): one row per planted duplicate."""
    plan = audio_row_plan(np.arange(n, dtype=np.int64), seed)
    kind, cid, idx = plan["kind"], plan["content_id"], plan["idx"]
    dup = np.isin(kind, (AKIND_EXACT, AKIND_ENC))
    ids = np.array([f"aud-{i:012d}" for i in idx])
    return pa.table({
        "left_id": pa.array([f"aud-{c:012d}" for c in cid[dup]], pa.string()),
        "right_id": pa.array(ids[dup], pa.string()),
        "kind": pa.array([AKIND_NAMES[k] for k in kind[dup]], pa.string()),
    })


def synth_audio_parquet(n: int, seed: int = 42,
                        root: str = "/tmp/courlan_ray_synth_audio") -> str:
    """Generate (once) and cache the synthetic audio table as parquet —
    queries re-read cheap parquet instead of re-synthesizing waveforms,
    and the DuckDB oracle SQL can scan the same files by path."""
    import os

    from .cache import cached_parquet

    return cached_parquet(os.path.join(root, f"n{n}-s{seed}"),
                          lambda: synth_audio_dataset(n, seed),
                          rows_per_file=256)
