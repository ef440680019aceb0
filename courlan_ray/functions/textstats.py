"""Text analysis kernels: language-ID, quality scoring, token counting.

The large-scale-pipeline text ops (lang_filter generalization,
/root/reference/courlan/filters.py:194-226, which scores locale cues and
keeps score >= 0).  All kernels are batch-vectorized: tokens are exploded
once with numpy ``repeat`` and scored with C-level pandas ``map``/bincount —
no per-row Python loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# compact stopword inventories (top function words; public knowledge)
_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "was", "for", "on", "are", "with", "as", "his", "they", "be",
           "at", "have", "this", "from", "or", "had", "by", "not", "but"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit",
           "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
           "eine", "als", "auch", "es", "an", "werden", "aus", "er"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "un", "une", "du",
           "dans", "que", "qui", "pour", "sur", "au", "avec", "pas", "ce",
           "il", "sont", "plus", "par", "mais", "ou", "se"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "del", "se",
           "las", "por", "con", "una", "su", "para", "es", "al", "lo",
           "como", "más", "pero", "sus", "le", "ha", "o"},
    "it": {"il", "di", "che", "la", "e", "un", "a", "per", "non", "sono",
           "una", "le", "si", "con", "del", "da", "dei", "nel", "alla"},
}

_LANGS = sorted(_STOPWORDS)
_WORD2MASK: dict[str, int] = {}
for _i, _lang in enumerate(_LANGS):
    for _w in _STOPWORDS[_lang]:
        _WORD2MASK[_w] = _WORD2MASK.get(_w, 0) | (1 << _i)

_TOKEN_RE = r"[^\W\d_]+(?:'[^\W\d_]+)?"
# BPE-ish pretokenizer in the GPT-2 style: words / numbers / punct runs
BPEISH_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)"
# RE2-expressible variant: the trailing-whitespace lookahead `\s+(?!\S)`
# becomes a plain `\s+` LAST alternative.  Leftmost-first alternation means
# `\s+` only fires where no ` ?<token>` alternative matches, so the two
# variants segment whitespace runs differently ("  w": [" "," w"] vs
# ["  ","w"]) but produce the SAME token COUNT; parity is pinned by
# tests/test_textstats.py.  This is what lets doc_token_counts_bpe carry a
# DuckDB oracle (RE2 has no lookahead).
BPEISH_RE2 = r"'(?:s|t|re|ve|m|ll|d)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+"


def _explode_tokens(texts: pd.Series) -> tuple[pd.Series, np.ndarray]:
    toks = texts.str.lower().str.findall(_TOKEN_RE)
    counts = toks.str.len().fillna(0).to_numpy(dtype=np.int64)
    flat = pd.Series(np.concatenate([np.array(t, dtype=object) for t in toks])
                     if counts.sum() else np.array([], dtype=object))
    doc = np.repeat(np.arange(len(texts)), counts)
    return flat, doc


def detect_language(texts) -> tuple[np.ndarray, np.ndarray]:
    """Stopword-profile language ID.

    Returns (lang codes array of str ('' = undetermined), confidence
    in [0,1] = stopword hit ratio of the winning language).
    """
    s = pd.Series(texts, dtype=object).fillna("")
    flat, doc = _explode_tokens(s)
    n = len(s)
    scores = np.zeros((n, len(_LANGS)), dtype=np.int64)
    total = np.bincount(doc, minlength=n).astype(np.int64)
    if len(flat):
        masks = flat.map(_WORD2MASK).fillna(0).to_numpy(dtype=np.int64)
        for i in range(len(_LANGS)):
            hit = (masks >> i) & 1
            scores[:, i] = np.bincount(doc, weights=hit, minlength=n)
    best = scores.argmax(axis=1)
    best_score = scores[np.arange(n), best]
    conf = np.where(total > 0, best_score / np.maximum(total, 1), 0.0)
    langs = np.where(best_score > 0, np.array(_LANGS, dtype=object)[best], "")
    return langs.astype(object), conf


def lang_gate(texts, language: str | None, min_conf: float = 0.10) -> np.ndarray:
    """True where the text plausibly matches ``language`` (keep-if-score>=0
    semantics of the reference's lang_filter: undetermined text passes)."""
    if language is None:
        return np.ones(len(texts), dtype=bool)
    langs, conf = detect_language(texts)
    undetermined = conf < min_conf
    return undetermined | (langs == language)


def quality_scores(texts) -> dict[str, np.ndarray]:
    """Heuristic quality features + composite score in [0,1]:
    length, alpha/punct/digit ratios, stopword ratio, word repetition."""
    s = pd.Series(texts, dtype=object).fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    safe = np.maximum(n_chars, 1)
    n_alpha = s.str.count(r"[^\W\d_]").to_numpy(dtype=np.int64)
    n_digit = s.str.count(r"\d").to_numpy(dtype=np.int64)
    n_punct = s.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    n_upper = s.str.count(r"[A-Z]").to_numpy(dtype=np.int64)
    n_tokens = s.str.count(_TOKEN_RE).to_numpy(dtype=np.int64)

    flat, doc = _explode_tokens(s)
    n = len(s)
    stop_hits = np.zeros(n, dtype=np.int64)
    uniq_ratio = np.ones(n, dtype=np.float64)
    if len(flat):
        is_stop = flat.map(_WORD2MASK).notna().to_numpy()
        stop_hits = np.bincount(doc, weights=is_stop, minlength=n).astype(np.int64)
        nunique = pd.DataFrame({"d": doc, "t": flat}).groupby("d")["t"].nunique()
        tot = np.bincount(doc, minlength=n)
        uniq_ratio = np.ones(n, dtype=np.float64)
        uniq_ratio[nunique.index.to_numpy()] = nunique.to_numpy() / np.maximum(
            tot[nunique.index.to_numpy()], 1)

    alpha_ratio = n_alpha / safe
    punct_ratio = n_punct / safe
    digit_ratio = n_digit / safe
    upper_ratio = n_upper / safe
    stop_ratio = stop_hits / np.maximum(n_tokens, 1)
    length_score = np.clip(n_chars / 200.0, 0, 1) * np.clip((2000 - n_chars) / 1000.0, 0, 1)
    score = np.clip(
        0.25 * np.clip(alpha_ratio / 0.7, 0, 1)
        + 0.20 * np.clip(stop_ratio / 0.3, 0, 1)
        + 0.20 * uniq_ratio
        + 0.15 * np.clip(length_score, 0, 1)
        + 0.10 * (1 - np.clip(punct_ratio / 0.3, 0, 1))
        + 0.10 * (1 - np.clip(digit_ratio / 0.3, 0, 1)),
        0, 1)
    return {
        "n_chars": n_chars, "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio, "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio, "upper_ratio": upper_ratio,
        "stop_ratio": stop_ratio, "unique_ratio": uniq_ratio,
        "quality": score,
    }


def token_counts(texts, mode: str = "whitespace") -> np.ndarray:
    """Token counts: 'whitespace' (\\S+ runs) or 'bpeish' (GPT-2-style
    pretokenizer regex — an upper-proxy for BPE token counts)."""
    s = pd.Series(texts, dtype=object).fillna("")
    if mode == "whitespace":
        return s.str.count(r"\S+").to_numpy(dtype=np.int64)
    if mode == "bpeish":
        return s.str.count(BPEISH_RE).to_numpy(dtype=np.int64)
    if mode == "bpeish_re2":
        return s.str.count(BPEISH_RE2).to_numpy(dtype=np.int64)
    raise ValueError(f"unknown mode {mode!r}")
