import numpy as np
import pyarrow as pa

from courlan_ray.config import DedupConfig
from courlan_ray.functions.caption import scrub_captions, caption_keys, spam_mask
from courlan_ray.stages.canonicalize import canonicalize_batch

# golden pairs in the spirit of the reference's scrub/normalize tests
# (/root/reference/tests/unit_tests.py:156-230, 518-588)
SCRUB_GOLDENS = [
    ("  hello   world  ", "hello world"),
    ("hello\tworld\x07", "hello world"),
    ("<b>bold</b> text", "bold text"),
    ("<![CDATA[inner text]]>", "inner text"),
    ("a &amp; b", "a & b"),
    ("caption utm_source=feed utm_medium=x tail", "caption tail"),
    ("no change needed", "no change needed"),
    ("", ""),
]


def test_scrub_goldens():
    got = scrub_captions(pa.array([a for a, _ in SCRUB_GOLDENS])).to_pylist()
    assert got == [b for _, b in SCRUB_GOLDENS]


def test_scrub_idempotent():
    once = scrub_captions(pa.array([a for a, _ in SCRUB_GOLDENS]))
    twice = scrub_captions(once)
    assert once.to_pylist() == twice.to_pylist()


def test_caption_keys_casefold():
    assert caption_keys(pa.array(["MiXeD Case"])).to_pylist() == ["mixed case"]


def test_spam_mask():
    m = spam_mask(pa.array([
        "win at the casino now", "visit http://x.example/z",
        "a plain caption about boats"])).to_pylist()
    assert m == [True, True, False]


def _batch(captions, fmts=None, payload=None):
    n = len(captions)
    from courlan_ray.functions.imagecodec import encode_image
    import numpy as np
    good = encode_image(np.zeros((16, 16, 3), dtype=np.uint8), "png")
    return pa.table({
        "image_id": pa.array([f"i{k}" for k in range(n)]),
        "bytes": pa.array(payload or [good] * n, pa.binary()),
        "w": pa.array([16] * n, pa.int32()),
        "h": pa.array([16] * n, pa.int32()),
        "fmt": pa.array(fmts or ["png"] * n),
        "caption": pa.array(captions),
        "phash": pa.array([0] * n, pa.int64()),
    })


def test_gate_reasons_ordered_like_check_url():
    cfg = DedupConfig()
    out = canonicalize_batch(_batch([
        "short",                               # < 10 chars
        "x" * 600,                             # too long
        "a perfectly reasonable caption",      # ok
        "win big at the casino tonight folks",  # spam
    ]), cfg)
    assert out["reject_reason"].to_pylist() == [
        "caption_too_short", "caption_too_long", "", "spam"]
    assert out["valid"].to_pylist() == [False, False, True, False]


def test_gate_bad_fmt_and_bad_image():
    cfg = DedupConfig()
    out = canonicalize_batch(
        _batch(["a perfectly reasonable caption"] * 2,
               fmts=["bmp", "png"],
               payload=[None, b"garbage-bytes-here"]), cfg)
    # fmt gate fires before payload gate, mirroring check_url ordering
    assert out["reject_reason"].to_pylist() == ["bad_fmt", "bad_image"]


def test_language_gate():
    cfg = DedupConfig(language="en")
    out = canonicalize_batch(_batch([
        "the cat and the dog are in the garden with a ball",
        "der Hund und die Katze sind mit dem Ball im Garten",
    ]), cfg)
    assert out["valid"].to_pylist() == [True, False]
    assert out["reject_reason"].to_pylist()[1] == "language"
