"""Suffix arrays over byte buffers — fully vectorized prefix doubling.

The north-star signature family list is MinHash / SimHash / *suffix-array
substring*; until round 3 the third family was served by its scalable
stand-in (winnowing fingerprints, ``functions/hashing.py``) plus an
O(|a|·|b|) rolling-DP LCS verifier (``stages/verify._lcs_len``).  This
module adds the genuine article:

- ``suffix_array_with_ranks``: Manber–Myers prefix doubling, one
  ``np.lexsort`` per doubling level — O(n log² n), no Python per element.
  The per-level rank arrays are kept: ``rank_w[i] == rank_w[j]`` iff the
  two suffixes agree on their first ``w`` characters (sentinel-padded
  semantics), which turns longest-common-prefix queries into O(log n)
  descending-width walks — vectorized over entire pair arrays at once.
- ``lcp_of_pairs``: batched LCP of arbitrary suffix pairs via those rank
  levels (the classic sparse-table-by-rank trick).
- ``lcs_len_sa``: exact longest-common-substring length of two byte
  strings via a generalized suffix array of ``a ⧺ SEP ⧺ b`` — the max
  LCP over SA-adjacent suffix pairs from different sides.  O((|a|+|b|)
  log²) vs the DP's O(|a|·|b|): at 4 KiB inputs this is ~40× fewer
  operations, and it is the verification kernel behind
  ``stages/substring.substring_lcs``.

Determinism: pure numpy over the input bytes, no hashing, no seeds —
identical across processes and parallelism levels (checkpoint/scaling
contract, SURVEY.md §4).
"""

from __future__ import annotations

import numpy as np

_I64 = np.int64


def suffix_array_with_ranks(s: np.ndarray
                            ) -> tuple[np.ndarray, list[tuple[int, np.ndarray]]]:
    """Suffix array of an integer sequence (values ≥ 0) by prefix doubling.

    Returns ``(sa, levels)`` where ``sa[k]`` is the start of the k-th
    smallest suffix and ``levels`` is ``[(w, rank_w), ...]`` for
    ``w = 1, 2, 4, …``: ``rank_w[i] == rank_w[j]`` iff the sentinel-padded
    windows ``s[i:i+w]`` and ``s[j:j+w]`` are equal (out-of-range tail
    padded with a virtual sentinel smaller than every real value, so two
    windows only compare equal when their in-range parts are identical
    AND end at the same relative offset).
    """
    s = np.asarray(s)
    n = s.size
    if n == 0:
        return np.zeros(0, dtype=_I64), []
    # dense initial ranks of the raw values (w = 1)
    _, rank = np.unique(s, return_inverse=True)
    rank = rank.astype(_I64)
    levels = [(1, rank)]
    w = 1
    if int(rank[-1] if n == 1 else rank.max()) == n - 1:
        sa = np.argsort(rank, kind="stable").astype(_I64)
        return sa, levels
    sa = None
    while True:
        rank2 = np.full(n, -1, dtype=_I64)
        rank2[: n - w] = rank[w:]
        order = np.lexsort((rank2, rank)).astype(_I64)
        r_o, r2_o = rank[order], rank2[order]
        new_o = np.zeros(n, dtype=_I64)
        np.cumsum((r_o[1:] != r_o[:-1]) | (r2_o[1:] != r2_o[:-1]),
                  out=new_o[1:])
        rank = np.empty(n, dtype=_I64)
        rank[order] = new_o
        w *= 2
        levels.append((w, rank))
        if int(new_o[-1]) == n - 1 or w >= n:
            sa = order
            break
    return sa, levels


def suffix_array(b: bytes | np.ndarray) -> np.ndarray:
    """Suffix array of a byte string (test-facing convenience wrapper)."""
    arr = np.frombuffer(b, dtype=np.uint8).astype(_I64) if isinstance(
        b, (bytes, bytearray)) else np.asarray(b, dtype=_I64)
    return suffix_array_with_ranks(arr)[0]


def lcp_of_pairs(levels: list[tuple[int, np.ndarray]],
                 i: np.ndarray, j: np.ndarray, n: int) -> np.ndarray:
    """Longest common prefix of suffix pairs ``(i[k], j[k])``, batched.

    Walks the rank levels in DESCENDING width: whenever the two cursors'
    ``rank_w`` agree, the suffixes share ``w`` more characters (padded
    semantics) and both cursors jump ``w`` ahead — O(log n) numpy steps
    total for the whole pair array.  The final clamp to the true remaining
    lengths removes the virtual-sentinel padding (padded equality implies
    equal lengths, so the clamp is exact, never lossy).

    Early rank-distinctness termination is sound for DISTINCT suffixes:
    once every ``rank_W`` is unique, any two different suffixes diverge
    within their first ``W`` characters, so ``lcp < W`` is exactly covered
    by the descending widths ``W/2 + W/4 + … + 1 = W - 1``.  Identical
    index pairs (lcp = remaining length, which no binary descent of
    truncated levels can reach) are special-cased up front.
    """
    i0 = np.asarray(i, dtype=_I64)
    j0 = np.asarray(j, dtype=_I64)
    same = i0 == j0          # degenerate pairs: lcp = remaining length
    ci = np.where(same, n, i0)
    cj = np.where(same, n, j0)
    lcp = np.where(same, n - i0, 0).astype(_I64)
    for w, rk in reversed(levels):
        valid = (ci < n) & (cj < n)
        if not valid.any():
            break
        eq = np.zeros(i0.size, dtype=bool)
        vi, vj = ci[valid], cj[valid]
        eq[valid] = rk[vi] == rk[vj]
        lcp[eq] += w
        ci[eq] += w
        cj[eq] += w
    return np.minimum(lcp, np.minimum(n - i0, n - j0))


_SEP = 256          # larger than any byte value -> unique, sorts last


def lcs_len_sa(a: bytes, b: bytes) -> int:
    """Exact longest-common-substring length via a generalized suffix
    array of ``a ⧺ SEP ⧺ b``.

    The separator (value 256) exceeds every byte, so (1) no common prefix
    can cross it — a left-side suffix's match with any right-side suffix
    stops at the boundary, and (2) the separator suffix is the lexicographic
    maximum, i.e. last in SA order, so dropping it never breaks the
    adjacency argument: the maximum cross-side LCP is always attained by
    some SA-adjacent pair of opposite sides (LCP of any pair is the min of
    the adjacent LCPs between them).
    """
    if not a or not b:
        return 0
    la, lb = len(a), len(b)
    s = np.empty(la + 1 + lb, dtype=_I64)
    s[:la] = np.frombuffer(a, dtype=np.uint8)
    s[la] = _SEP
    s[la + 1:] = np.frombuffer(b, dtype=np.uint8)
    sa, levels = suffix_array_with_ranks(s)
    n = s.size
    sa2 = sa[sa != la]
    side = sa2 > la
    cross = side[1:] != side[:-1]
    if not cross.any():
        return 0
    lcp = lcp_of_pairs(levels, sa2[:-1][cross], sa2[1:][cross], n)
    return int(lcp.max())


def lcs_len(a: bytes, b: bytes, *, sa_min_product: int = 1 << 10) -> int:
    """Exact LCS length — O(n·m) rolling DP below ``sa_min_product``
    (|a|·|b|), the generalized suffix array above it.  Both are exact, so
    the dispatch is purely a speed crossover, measured on this host:
    DP wins only below ~32×32 bytes (80 µs vs 95 µs at 16×16); SA wins
    4× at 256 B, 23× at 4 KiB (120 ms vs 5 ms), 73× at 16 KiB."""
    if not a or not b:
        return 0
    if len(a) * len(b) <= sa_min_product:
        from ..stages.verify import _lcs_len
        return _lcs_len(a, b)
    return lcs_len_sa(a, b)
