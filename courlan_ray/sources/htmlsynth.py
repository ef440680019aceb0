"""Deterministic synthetic HTML page table for the link-extraction
pipeline — the HTML sibling of sources/synth.py (images) and
sources/audiosynth.py (WAV).

Schema: ``page_id:string, base_url:string, html:string``.  Every row is a
pure function of ``(index, seed)``; generation runs as a parallel
``map_batches`` over ``ray.data.range(n)`` and is cached as parquet so the
DuckDB oracle can scan the same files by path.

Each page embeds a deterministic mix of 13 link *kinds* exercising the
reference's harvest + canonicalize contract (reference ``core.py:132-227``):

kept (6): absolute internal; UPPERCASE host + default :443 port (normalize
lowers + strips); tracker query params (clean_query sorts + drops utm_*);
root-relative; directory-relative (urljoin); fragment-carrying internal.
dropped (7): protocol-relative external; absolute external; rel=nofollow;
mailto:; media extension (.jpg); /feed; too-short host — plus an
href-less ``<a name=...>`` anchor.

Shape constraints that keep the DuckDB twin exact (documented in
``extras._build_extra_oracles``): no two hrefs on ONE page normalize to
±slash or http/https *variants* of each other (``is_known_link``'s
variant dedup is iteration-order-dependent; exact-string duplicates are
order-independent and allowed), and the kept shapes only exercise
normalization branches the SQL reproduces (lowercase host, default-port
strip, utm_* removal + param sort, fragment passthrough).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import splitmix64

_U64 = np.uint64

N_HOSTS = 50
N_SECTIONS = 7
#: shared small key range -> cross-page duplicate links (the exact-dedup
#: tier downstream has real work to do)
KEY_RANGE = 40

KIND_NAMES = [
    "abs_internal", "upper_port", "tracker_query", "root_rel", "dir_rel",
    "proto_rel_ext", "abs_ext", "nofollow", "mailto", "media_ext",
    "feed", "fragment", "short_host",
]


def _h(i: np.ndarray | int, seed: int, salt: int) -> np.ndarray:
    arr = np.atleast_1d(np.asarray(i, dtype=np.int64)).view(_U64)
    return splitmix64(arr ^ splitmix64(
        np.full(arr.shape, _U64((seed << 8) + salt), dtype=_U64)))


def page_base(i: int) -> tuple[str, str]:
    """(host, base_url) for page index ``i``."""
    host = f"site{i % N_HOSTS}.org"
    return host, f"https://{host}/sec{i % N_SECTIONS}/art-{i}.html"


def _href(kind: int, host: str, k: int) -> tuple[str, str]:
    """(href, tag_suffix) for one link of ``kind`` with key ``k``."""
    up = host.upper()
    return [
        (f"https://{host}/a{k}.html", ""),
        (f"https://{up}:443/b{k}.html", ""),
        (f"https://{host}/c{k}.html?b={k}&utm_source=tw&a=1", ""),
        (f"/d{k}/e{k}.html", ""),
        (f"f{k}/g{k}.html", ""),
        (f"//ext{k}.net/h.html", ""),
        (f"https://ext{k}.net/i.html", ""),
        (f"https://{host}/nf{k}.html", ' rel="nofollow"'),
        (f"mailto:user{k}@x.org", ""),
        (f"https://{host}/img{k}.jpg", ""),
        (f"https://{host}/feed", ""),
        (f"https://{host}/j{k}.html#sec{k}", ""),
        (f"http://s.o/k{k}.html", ""),
    ][kind]


def make_page(i: int, seed: int) -> tuple[str, str, str]:
    """Pure deterministic page: (page_id, base_url, html)."""
    host, base = page_base(i)
    n_links = 8 + int(_h(i, seed, 1)[0] % _U64(6))
    parts = [f"<html><body><h1>Article {i}</h1><p>lorem ipsum {i}</p>",
             '<a name="top">anchor</a>']
    for j in range(n_links):
        kind = int(_h(i * 64 + j, seed, 2)[0] % _U64(len(KIND_NAMES)))
        k = int(_h(i * 64 + j, seed, 3)[0] % _U64(KEY_RANGE))
        href, extra = _href(kind, host, k)
        parts.append(f'<a href="{href}"{extra}>link {j}</a><p>t{j}</p>')
    parts.append("</body></html>")
    return f"page-{i:08d}", base, "".join(parts)


def generate_html_rows(idx: np.ndarray, seed: int) -> pa.Table:
    ids, bases, htmls = [], [], []
    for i in np.asarray(idx, dtype=np.int64):
        pid, base, html = make_page(int(i), seed)
        ids.append(pid)
        bases.append(base)
        htmls.append(html)
    return pa.table({
        "page_id": pa.array(ids, pa.string()),
        "base_url": pa.array(bases, pa.string()),
        "html": pa.array(htmls, pa.string()),
    })


def synth_html_dataset(n: int, seed: int = 42, *, batch_size: int = 512):
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        return generate_html_rows(batch["id"].to_numpy(), seed)

    return rd.range(n).map_batches(gen, batch_format="pyarrow",
                                   batch_size=batch_size)


def synth_html_table(n: int, seed: int = 42) -> pa.Table:
    return generate_html_rows(np.arange(n, dtype=np.int64), seed)


def synth_html_parquet(n: int, seed: int = 42,
                       root: str = "/tmp/courlan_ray_synth_html") -> str:
    """Generate (once) and cache the synthetic HTML table as parquet —
    the Ray query re-reads cheap parquet and the DuckDB oracle SQL scans
    the same files by path."""
    import os

    from .cache import cached_parquet

    return cached_parquet(os.path.join(root, f"n{n}-s{seed}"),
                          lambda: synth_html_dataset(n, seed),
                          rows_per_file=256)
