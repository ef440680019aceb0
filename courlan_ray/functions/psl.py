"""Full public-suffix list (PSL) matching for get_tldinfo.

Data: ``courlan_ray/data/public_suffix_list.dat`` — a vendored snapshot of
the public Mozilla PSL (https://publicsuffix.org/list/, MPL-2.0; this copy
is the Debian ``publicsuffix`` package snapshot 20230209).  Includes BOTH
the ICANN and PRIVATE sections, matching the default behavior of the
``tld`` package the reference resolves suffixes with
(reference urlutils.py:24-58).

Matching implements the published PSL algorithm
(https://publicsuffix.org/list/ "Formal algorithm"):

- a rule matches when its labels equal the tail of the host's labels,
  ``*`` matching exactly one label at its position;
- exception rules (``!``) override wildcard rules: the exception's tail
  AFTER the ``!`` label is the public suffix;
- the prevailing rule is the longest match; no match -> the implicit
  default rule ``*`` (the TLD itself is the suffix);
- registrable domain = public suffix + one more label.

Unicode rules are indexed both raw and idna-encoded so punycode hosts
(``xn--…``) match their unicode rules.  Parsing is lazy (first call) and
cached for the process lifetime (~250 KB, <100 ms).
"""

from __future__ import annotations

import os
from functools import lru_cache

_DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "public_suffix_list.dat")


@lru_cache(maxsize=1)
def _rules() -> tuple[frozenset[str], frozenset[str], frozenset[str]]:
    """(exact, wildcard_parents, exceptions) — all as dot-joined label
    tails, lowercased; wildcard_parents holds the part after ``*.``;
    exceptions hold the tail after ``!``."""
    exact: set[str] = set()
    wild: set[str] = set()
    exc: set[str] = set()
    with open(_DATA, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("//"):
                continue
            line = line.split()[0].lower()
            variants = [line]
            if not line.isascii():
                try:
                    variants.append(line.encode("idna").decode("ascii"))
                except UnicodeError:
                    pass
            for rule in variants:
                if rule.startswith("!"):
                    exc.add(rule[1:])
                elif rule.startswith("*."):
                    wild.add(rule[2:])
                else:
                    exact.add(rule)
    return frozenset(exact), frozenset(wild), frozenset(exc)


def suffix_label_count(labels: list[str]) -> int:
    """Number of trailing labels of ``labels`` forming the public suffix
    (>= 1 by the implicit ``*`` default rule; 0 only for empty input).
    ``labels`` must already be lowercase."""
    n = len(labels)
    if n == 0:
        return 0
    exact, wild, exc = _rules()
    best = 1                                   # implicit default rule '*'
    for k in range(1, n + 1):
        tail = ".".join(labels[n - k:])
        if tail in exc:
            return k - 1                       # exception wins outright
        if tail in exact and k > best:
            best = k
        # '*.parent': wildcard consumes one label in front of the parent
        if k + 1 <= n and tail in wild and k + 1 > best:
            best = k + 1
    return best


def registrable_domain(host: str) -> str | None:
    """Registered/registrable domain of an already-lowercased host, or
    None when the host IS a public suffix (no registrable part) — callers
    that need the reference's lenient fallback handle None themselves."""
    labels = host.split(".")
    k = suffix_label_count(labels)
    if len(labels) <= k:
        return None
    return ".".join(labels[-(k + 1):])
