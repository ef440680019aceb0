"""Audio channel: WAV codec roundtrip, spectral fingerprint robustness,
planted-dup recall through the actor stage + Hamming-ball pair pipeline."""

import numpy as np
import pyarrow as pa
import pytest

from courlan_ray.functions import audiocodec as ac
from courlan_ray.sources.audiosynth import (
    audio_truth_pairs, make_track, synth_audio_dataset, synth_audio_table)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.uniform(-1, 1, 4000)
    x, rate = ac.decode_wav(ac.encode_wav(mono, 22_050))
    assert rate == 22_050 and x.shape == (4000, 1)
    assert np.abs(x[:, 0] - mono).max() <= 1.0 / 32767  # 16-bit quant bound

    stereo = rng.uniform(-1, 1, (2000, 2))
    y, rate = ac.decode_wav(ac.encode_wav(stereo, 8000))
    assert rate == 8000 and y.shape == (2000, 2)
    assert np.abs(y - stereo).max() <= 1.0 / 32767


def test_wav_decode_rejects_garbage():
    for bad in (b"", b"OGGS" + b"\x00" * 60, b"RIFF1234WAVE",
                ac.encode_wav(np.zeros(100))[:20]):
        with pytest.raises(ac.AudioCodecError):
            ac.decode_wav(bad)


def test_simhash_invariances():
    """Gain = 0 bits; 16-bit requant <= 3 bits; distinct tracks far."""
    hs = []
    for s in range(20):
        x = make_track(s * 10, 42)
        h0 = ac.audio_simhash64(x)
        hs.append(h0)
        assert _ham(h0, ac.audio_simhash64(np.clip(x * 0.5, -1, 1))) == 0
        x16 = ac.to_mono(ac.decode_wav(ac.encode_wav(x))[0])
        assert _ham(h0, ac.audio_simhash64(x16)) <= 3
    import itertools
    cross = [_ham(a, b) for a, b in itertools.combinations(hs, 2)]
    assert min(cross) > 6          # distinct tracks outside the 3-bit ball


def test_audio_features_stage(ray_session):
    from courlan_ray.config import DedupConfig
    from courlan_ray.stages.multimodal import audio_features

    n = 120
    ds = synth_audio_dataset(n, 42)
    out = audio_features(ds, DedupConfig()).to_pandas()
    assert len(out) == n
    tbl = synth_audio_table(n, 42)
    valid = [f != "ogg" and len(b) > 44
             for f, b in zip(tbl["fmt"].to_pylist(), tbl["bytes"].to_pylist())]
    assert (out.sort_values("audio_id")["decode_ok"].to_numpy()
            == np.array(valid)).all()
    okd = out[out.decode_ok]
    assert np.allclose(okd["duration_sec"], 2.0)
    assert (okd["rate"] == 16_000).all() and (okd["channels"] == 1).all()
    assert (okd["rms"] > 0).all()


def test_audio_dedup_planted_recall(ray_session):
    """Every planted exact/enc duplicate pair is found (recall 1.0) and
    every emitted pair is a true content pair (precision 1.0)."""
    from courlan_ray.config import DedupConfig
    from courlan_ray.sources.audiosynth import audio_row_plan
    from courlan_ray.stages.multimodal import audio_dedup_pairs

    n = 400
    out = audio_dedup_pairs(synth_audio_dataset(n, 42),
                            DedupConfig()).to_pandas()
    got = {tuple(sorted(p)) for p in
           zip(out["left_id"], out["right_id"])}

    truth = audio_truth_pairs(n, 42).to_pandas()
    want = {tuple(sorted(p)) for p in
            zip(truth["left_id"], truth["right_id"])}
    missing = want - got
    assert not missing, f"missed {len(missing)} planted pairs: {sorted(missing)[:5]}"

    # precision: every found pair shares a content id in the plan
    plan = audio_row_plan(np.arange(n, dtype=np.int64), 42)
    cid = {f"aud-{i:012d}": int(c)
           for i, c in zip(plan["idx"], plan["content_id"])}
    for l, r in got:
        assert cid[l] == cid[r], f"false pair {l} {r}"


def test_wav_roundtrip_property():
    """Property: decode(encode(x)) == x within half a quantization step
    for random lengths, channel counts, and rates (hypothesis-style sweep
    with a fixed seed grid)."""
    rng = np.random.default_rng(77)
    for _ in range(25):
        n = int(rng.integers(1, 5000))
        ch = int(rng.integers(1, 4))
        rate = int(rng.integers(1000, 96_000))
        x = rng.uniform(-1, 1, (n, ch))
        y, r = ac.decode_wav(ac.encode_wav(x, rate))
        assert r == rate and y.shape == (n, ch)
        assert np.abs(y - x).max() <= 0.5 / 32767 + 1e-12


def test_wav_decode_float_and_8bit():
    """decode_wav accepts IEEE-float and 8-bit PCM WAVs (hand-built)."""
    import struct
    x = np.linspace(-1, 1, 100)
    # float32 WAV
    data = x.astype("<f4").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 32000, 4, 32)
           + b"data" + struct.pack("<I", len(data)) + data)
    y, r = ac.decode_wav(hdr)
    assert r == 8000 and np.allclose(y[:, 0], x, atol=1e-6)
    # 8-bit unsigned PCM WAV
    pcm8 = np.clip(np.round(x * 128 + 128), 0, 255).astype(np.uint8).tobytes()
    hdr8 = (b"RIFF" + struct.pack("<I", 36 + len(pcm8)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", len(pcm8)) + pcm8)
    y8, r8 = ac.decode_wav(hdr8)
    assert r8 == 8000 and np.abs(y8[:, 0] - x).max() <= 1.0 / 128 + 1e-12


def test_wav_zero_rate_rejected():
    """A header claiming 0 Hz must raise, not ZeroDivisionError later."""
    import struct
    data = np.zeros(10, dtype="<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
           + b"data" + struct.pack("<I", len(data)) + data)
    with pytest.raises(ac.AudioCodecError, match="rate"):
        ac.decode_wav(hdr)


def test_wav_misaligned_data_chunk_decodes():
    """A data chunk with a stray trailing byte must decode (truncated to
    sample alignment), never leak a bare ValueError from np.frombuffer
    past the stage's except-AudioCodecError."""
    good = ac.encode_wav(np.linspace(-0.5, 0.5, 101), rate=8000)
    import struct
    # append one garbage byte to the data chunk and patch both lengths
    (dlen,) = struct.unpack("<I", good[40:44])
    bad = (good[:4] + struct.pack("<I", 37 + dlen) + good[8:40]
           + struct.pack("<I", dlen + 1) + good[44:] + b"\x7f")
    x, rate = ac.decode_wav(bad)
    assert rate == 8000 and x.shape == (101, 1)
    ref, _ = ac.decode_wav(good)
    assert np.array_equal(x, ref)
