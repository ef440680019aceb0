"""Multimodal (image/audio/video) actor-pool stages.

Binary media are opaque ``binary`` columns with typed metadata (w, h, fmt);
each transform is a callable-class ``map_batches`` stage: decoders/models
load once per actor in ``__init__``, batches stream through ``__call__``,
and decoded pixels never leave the stage (only features/thumbnails do).

This sandbox ships no image/audio libraries, so the *codec boundary* is
the deterministic in-repo codec (functions/imagecodec.py) plus
clearly-marked stubs (``NotImplementedError``) where PIL / libjpeg /
ffmpeg / torchaudio would plug in; the Ray-side plumbing — schemas, batch
sizes, actor signatures, output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions import imagecodec as codec


def _pool(cfg: DedupConfig) -> int:
    import ray
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, min(cfg.signature_concurrency, cpus - 2))


class ImageDecodeStats:
    """bytes -> (decode_ok, width, height, mean_luma, contrast).
    Pixels are consumed in-actor; only scalar features are emitted."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        n = len(payloads)
        ok = np.zeros(n, dtype=bool)
        w = np.zeros(n, dtype=np.int32)
        h = np.zeros(n, dtype=np.int32)
        luma = np.zeros(n, dtype=np.float64)
        contrast = np.zeros(n, dtype=np.float64)
        for i, p in enumerate(payloads):
            try:
                arr = codec.decode_image(p)
            except codec.CodecError:
                continue
            ok[i] = True
            h[i], w[i] = arr.shape[:2]
            g = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            luma[i] = g.mean()
            contrast[i] = g.std()
        return pa.table({
            "image_id": batch["image_id"],
            "decode_ok": pa.array(ok),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "mean_luma": pa.array(np.round(luma, 3)),
            "contrast": pa.array(np.round(contrast, 3)),
        })


class ImageResize:
    """bytes -> re-encoded thumbnail bytes at (target, target) via area
    resampling.  Output schema mirrors the input_hint shape."""

    def __init__(self, cfg: DedupConfig, target: int = 32,
                 out_fmt: str = "png"):
        self.cfg, self.target, self.out_fmt = cfg, target, out_fmt

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        t = self.target
        h, w = arr.shape[:2]
        ys = (np.arange(t) * h) // t
        xs = (np.arange(t) * w) // t
        return arr[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["bytes"].to_pylist()
        out, ok = [], []
        for p in payloads:
            try:
                arr = self._resize(codec.decode_image(p))
                out.append(codec.encode_image(arr, self.out_fmt))
                ok.append(True)
            except codec.CodecError:
                out.append(b"")
                ok.append(False)
        t = self.target
        return pa.table({
            "image_id": batch["image_id"],
            "bytes": pa.array(out, pa.binary()),
            "w": pa.array(np.full(len(out), t, dtype=np.int32), pa.int32()),
            "h": pa.array(np.full(len(out), t, dtype=np.int32), pa.int32()),
            "fmt": pa.array([self.out_fmt] * len(out)),
            "decode_ok": pa.array(ok),
        })


class ImageEmbed:
    """bytes -> embedding list<float> (64-dim block-luma features).

    STUB NOTE: a production cluster loads a vision model here (the
    ``__init__``-once pattern); this environment uses the deterministic
    block-mean features so the plumbing (broadcastable weights, batch
    inference, fixed-size list output) is exercised end to end."""

    def __init__(self, cfg: DedupConfig, dim: int = 64):
        self.cfg, self.dim = cfg, dim
        # model load would happen here, once per actor
        self._weights = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .signatures import _pixel_features
        payloads = batch["bytes"].to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        ok = np.zeros(len(payloads), dtype=bool)
        for i, p in enumerate(payloads):
            try:
                f = _pixel_features(codec.decode_image(p))
                feats[i, :min(self.dim, f.shape[0])] = f[:self.dim]
                ok[i] = True
            except codec.CodecError:
                pass
        flat = pa.array(feats.ravel(), pa.float32())
        return pa.table({
            "image_id": batch["image_id"],
            "embedding": pa.FixedSizeListArray.from_arrays(flat, self.dim),
            "decode_ok": pa.array(ok),
        })


class AudioFeatures:
    """STUB: audio decode + feature extraction (no audio libs here).
    The actor signature, schema contract (audio_id, bytes -> audio_id,
    features list<float>, duration) and batch sizing are the real
    interface; decoding raises until a codec is available."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "audio decoding requires an audio codec library not present "
            "in this environment; plug torchaudio/soundfile in here")


class VideoFrameSample:
    """STUB: sample ``n_frames`` frames per video payload.  Real plumbing
    (one row in, n rows out with frame_idx) with the decode stubbed."""

    def __init__(self, cfg: DedupConfig, n_frames: int = 3):
        self.cfg, self.n_frames = cfg, n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video decoding requires ffmpeg/pyav not present in this "
            "environment; plug frame extraction in here")


def decode_stats(ds, cfg: DedupConfig):
    return ds.map_batches(ImageDecodeStats, fn_constructor_args=(cfg,),
                          batch_format="pyarrow",
                          batch_size=cfg.signature_batch_size,
                          concurrency=_pool(cfg), num_cpus=1)


def resize_images(ds, cfg: DedupConfig, target: int = 32):
    return ds.map_batches(ImageResize, fn_constructor_args=(cfg, target),
                          batch_format="pyarrow",
                          batch_size=cfg.signature_batch_size,
                          concurrency=_pool(cfg), num_cpus=1)


def embed_images(ds, cfg: DedupConfig, dim: int = 64):
    return ds.map_batches(ImageEmbed, fn_constructor_args=(cfg, dim),
                          batch_format="pyarrow",
                          batch_size=cfg.signature_batch_size,
                          concurrency=_pool(cfg), num_cpus=1)
