"""Caption scrub / normalize / gate kernels — vectorized, Arrow-native.

The caption analogue of the reference's URL cleaning chain
(``scrub_url`` /root/reference/courlan/clean.py:51-94, ``normalize_url``
clean.py:164-195, gate chain ``check_url`` core.py:39-129): strip dirt the
crawler leaves behind (markup rests, CDATA, entities, control chars,
tracker tokens), produce an idempotent canonical form, and emit
``valid`` / ``reject_reason`` columns instead of raising.

Everything here is ``pyarrow.compute`` (RE2) over string arrays — no
per-row Python in the hot path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# fixed entity decodes (the common crawler leftovers; full html.unescape is
# per-row Python — these cover the reference's scrub semantics)
_ENTITIES = [
    ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
]

_RE_CDATA = r"(?s)<!\[CDATA\[(.*?)\]\]>"   # (?s): block may span newlines
_RE_MARKUP = r"<[^<>]*>"
_RE_CTRL = r"[\x00-\x1f\x7f]+"
_RE_TRACKER = r"[?&]?\butm_[a-z_]+=?\S*"
_RE_WS = r"\s+"

_SPAM_RE = (r"(?i)\b(?:casino|viagra|xxx|porn|free money|click here)\b"
            r"|https?://\S+")


def scrub_captions(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Remove crawler dirt; idempotent (scrub(scrub(x)) == scrub(x))."""
    s = arr
    s = pc.replace_substring_regex(s, _RE_CDATA, r"\1")
    s = pc.replace_substring_regex(s, _RE_MARKUP, " ")
    for ent, repl in _ENTITIES:
        s = pc.replace_substring(s, ent, repl)
    s = pc.replace_substring_regex(s, _RE_CTRL, " ")
    s = pc.replace_substring_regex(s, _RE_TRACKER, " ")
    s = pc.replace_substring_regex(s, _RE_WS, " ")
    return pc.utf8_trim_whitespace(s)


def normalize_captions(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical display form: scrubbed, single-spaced.  Case-preserving
    (the reference preserves URL path case, clean.py:164-195)."""
    return scrub_captions(arr)


def caption_keys(norm: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Case-folded dedup key (the variant-invariant key of is_known_link,
    /root/reference/courlan/urlutils.py:148-174, generalized)."""
    return pc.utf8_lower(norm)


def spam_mask(norm: pa.Array | pa.ChunkedArray) -> pa.Array:
    """True where the caption matches spam patterns (type_filter analogue,
    /root/reference/courlan/filters.py:236-251)."""
    return pc.match_substring_regex(norm, _SPAM_RE)
