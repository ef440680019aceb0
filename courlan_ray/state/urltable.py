"""UrlStore-compatible URL frontier.

API-parity replacement for the reference's ``UrlStore``
(/root/reference/courlan/urlstore.py:112-583), written from scratch:

- same contract: host-grouped ordered URL lists with visited flags,
  variant-aware dedup on insert, http↔https host unification, priority
  left-inserts, crawl draws with timestamps, fair-share download
  scheduling, robots rules per host, counters, dump/persist.
- different machinery: plain dict + list state (no pickled deques, no
  bz2 Compressor — Arrow/parquet handles storage), explicit methods
  instead of signal handlers.

SCALE NOTE: this class is the *small-state facade* for library users
(crawl frontiers are incremental by nature).  The distributed equivalents
of its bulk operations are the Dataset pipelines: dedup/merge ->
``pipelines.url_pipeline.sample_by_host``; scheduling ->
``url_frontier_schedule``; anti/semi joins -> ``stages.joins``.
"""

from __future__ import annotations

import pickle
from datetime import datetime, timedelta
from enum import Enum
from urllib.robotparser import RobotFileParser

from ..functions import urls as U


class HostState(Enum):
    OPEN = 0
    ALL_VISITED = 1
    BUSTED = 2


class _HostEntry:
    __slots__ = ("paths", "visited", "known", "state", "timestamp", "count",
                 "rules")

    def __init__(self) -> None:
        self.paths: list[str] = []
        self.visited: list[bool] = []
        self.known: set[str] = set()
        self.state = HostState.OPEN
        self.timestamp: datetime | None = None
        self.count = 0
        self.rules: RobotFileParser | None = None

    def total(self) -> int:
        return len(self.paths)

    def all_visited(self) -> bool:
        return all(self.visited) if self.visited else True


class RayUrlStore:
    """Host-grouped URL frontier with courlan UrlStore semantics."""

    def __init__(self, compressed: bool = False, language: str | None = None,
                 strict: bool = False, trailing: bool = True,
                 verbose: bool = False) -> None:
        # ``compressed`` accepted for API parity; storage is uncompressed
        self.language = language
        self.strict = strict
        self.trailing_slash = trailing
        self.urldict: dict[str, _HostEntry] = {}
        self.done = False
        if verbose:
            self._register_signal_dump()

    def _register_signal_dump(self) -> None:
        """Mirror of the reference's interrupt dump
        (/root/reference/courlan/urlstore.py:144-159): on SIGINT/SIGTERM
        print the unvisited frontier and exit.  No-op on Windows and
        outside the main thread (signal registration raises ValueError
        there, as in the reference)."""
        import signal
        import sys

        if sys.platform.startswith("win"):      # pragma: no cover
            return

        def dump_unvisited_urls(num, frame):
            self.print_unvisited_urls()
            sys.exit(1)

        try:
            signal.signal(signal.SIGINT, dump_unvisited_urls)
            signal.signal(signal.SIGTERM, dump_unvisited_urls)
        except ValueError:
            pass    # signal handlers only register in the main thread

    # ------------------------------------------------------------ internal

    def _canonical(self, url: str) -> tuple[str, str] | None:
        """validate + lang-gate + normalize -> (hostinfo, path) or None
        (cf. _buffer_urls, urlstore.py:171-203)."""
        if not url or not U.basic_filter(url):
            return None
        ok, parts = U.validate_url(url)
        if not ok or parts is None:
            return None
        if self.language and not U.lang_filter(url, self.language,
                                               self.strict,
                                               self.trailing_slash):
            return None
        try:
            norm = U.normalize_url(parts, self.strict, self.language,
                                   self.trailing_slash)
            return U.get_host_and_path(norm)
        except (AttributeError, ValueError):
            return None

    def _unified_host(self, host: str) -> str:
        """http↔https host unification (cf. _store_urls,
        urlstore.py:227-238): prefer whichever variant already exists; an
        https arrival adopts (renames) an existing http entry."""
        if host.startswith("http://"):
            alt = "https" + host[4:]
            if alt in self.urldict:
                return alt
        elif host.startswith("https://"):
            alt = "http" + host[5:]
            if alt in self.urldict:
                self.urldict[host] = self.urldict.pop(alt)
        return host

    def _entry(self, host: str) -> _HostEntry:
        host = self._unified_host(host)
        if host not in self.urldict:
            self.urldict[host] = _HostEntry()
        return self.urldict[host]

    def _insert(self, entry: _HostEntry, paths: list[str],
                left: bool = False) -> None:
        # incremental variant-aware dedup: unlike the reference, which
        # probes a static snapshot of the stored paths (urlstore.py:248-258)
        # and so admits /a and /a/ arriving in one batch, later variants in
        # the same batch are deduped here too
        fresh: list[str] = []
        for p in dict.fromkeys(paths):
            if not U.is_known_link(p, entry.known):
                fresh.append(p)
                entry.known.add(p)
        if left:
            entry.paths[0:0] = fresh
            entry.visited[0:0] = [False] * len(fresh)
        else:
            entry.paths.extend(fresh)
            entry.visited.extend([False] * len(fresh))
        if fresh and entry.state is HostState.ALL_VISITED:
            entry.state = HostState.OPEN
            self.done = False

    def _group(self, urls: list[str]) -> dict[str, list[str]]:
        grouped: dict[str, list[str]] = {}
        for url in dict.fromkeys(urls):
            got = self._canonical(url)
            if got:
                grouped.setdefault(got[0], []).append(got[1])
        return grouped

    # ------------------------------------------------------------- inserts

    def add_urls(self, urls: list[str] | None = None,
                 appendleft: list[str] | None = None) -> None:
        """(cf. urlstore.py:299-313)"""
        for host, paths in self._group(urls or []).items():
            e = self._entry(host)
            if e.state is not HostState.BUSTED:
                self._insert(e, paths)
        for host, paths in self._group(appendleft or []).items():
            e = self._entry(host)
            if e.state is not HostState.BUSTED:
                self._insert(e, paths, left=True)

    def add_from_html(self, htmlstring: str, url: str, external: bool = False,
                      lang: str | None = None, with_nav: bool = True) -> None:
        """(cf. urlstore.py:315-336)"""
        base = U.get_base_url(url)
        rules = self.get_rules(base)
        links, priority = U.filter_links(
            htmlstring, url, lang=lang or self.language, rules=rules,
            external=external, strict=self.strict, with_nav=with_nav)
        self.add_urls(urls=links, appendleft=priority)

    def discard(self, domains: list[str]) -> None:
        for d in domains:
            e = self._entry(d)
            e.paths, e.visited, e.known = [], [], set()
            e.state = HostState.BUSTED
        self._refresh_done()

    def reset(self) -> None:
        self.urldict = {}
        self.done = False

    # ------------------------------------------------------------- queries

    def get_known_domains(self) -> list[str]:
        return list(self.urldict)

    def get_unvisited_domains(self) -> list[str]:
        self._refresh_done()
        return [h for h, e in self.urldict.items()
                if e.state is HostState.OPEN]

    def is_exhausted_domain(self, domain: str) -> bool:
        if domain not in self.urldict:
            raise KeyError(f"website not in store: {domain}")
        return self.urldict[domain].state in (HostState.ALL_VISITED,
                                              HostState.BUSTED)

    def unvisited_websites_number(self) -> int:
        return len(self.get_unvisited_domains())

    def find_known_urls(self, domain: str) -> list[str]:
        e = self.urldict.get(domain)
        return [domain + p for p in e.paths] if e else []

    def find_unvisited_urls(self, domain: str) -> list[str]:
        e = self.urldict.get(domain)
        if not e:
            return []
        return [domain + p for p, v in zip(e.paths, e.visited) if not v]

    def _lookup(self, url: str) -> tuple[_HostEntry | None, str | None]:
        try:
            host, path = U.get_host_and_path(url)
        except (ValueError, TypeError, AttributeError):
            return None, None
        for candidate in (host, ("https" + host[4:]) if host.startswith("http://")
                          else ("http" + host[5:])):
            if candidate in self.urldict:
                return self.urldict[candidate], path
        return None, path

    def is_known(self, url: str) -> bool:
        e, path = self._lookup(url)
        return bool(e and path and U.is_known_link(path, e.known))

    def has_been_visited(self, url: str) -> bool:
        e, path = self._lookup(url)
        if not e or not path:
            return False
        try:
            return e.visited[e.paths.index(path)]
        except ValueError:
            return False

    def filter_unknown_urls(self, urls: list[str]) -> list[str]:
        """Anti-join probe preserving input order (cf. urlstore.py:389-395)."""
        return [u for u in urls if not self.is_known(u)]

    def filter_unvisited_urls(self, urls: list[str]) -> list[str]:
        """Drop only KNOWN-AND-VISITED URLs — unknown URLs count as
        unvisited and are returned, exactly the reference's
        ``_search_urls(switch=2)`` (urlstore.py:277-295; its own test
        urlstore_tests.py:318 probes unknown URLs and expects them back)."""
        return [u for u in urls if not self.has_been_visited(u)]

    # ------------------------------------------------------------ crawling

    def get_url(self, domain: str, as_visited: bool = True) -> str | None:
        """First unvisited URL of the host (cf. urlstore.py:409-430)."""
        e = self.urldict.get(domain)
        if e and e.state is HostState.OPEN:
            for i, (p, v) in enumerate(zip(e.paths, e.visited)):
                if not v:
                    if as_visited:
                        e.visited[i] = True
                        e.count += 1
                        e.timestamp = datetime.now()
                        if e.all_visited():
                            e.state = HostState.ALL_VISITED
                    return domain + p
            e.state = HostState.ALL_VISITED
        # no full-store _refresh_done here: this entry's state was already
        # updated in place, and bulk callers (get_download_urls /
        # establish_download_schedule) refresh once per round — a per-draw
        # scan made scheduling O(hosts^2)
        return None

    def get_download_urls(self, time_limit: float = 10.0,
                          max_urls: int = 10_000) -> list[str]:
        """One URL per OPEN host whose backoff expired
        (cf. urlstore.py:432-453)."""
        out = []
        now = datetime.now()
        for host, e in self.urldict.items():
            if e.state is not HostState.OPEN:
                continue
            if not e.timestamp or (now - e.timestamp).total_seconds() > time_limit:
                url = self.get_url(host)
                if url:
                    out.append(url)
                    if len(out) >= max_urls:
                        break
        self._refresh_done()
        return out

    def establish_download_schedule(self, max_urls: int = 100,
                                    time_limit: int = 10
                                    ) -> list[tuple[float, str]]:
        """Fair-share slots + per-host backoff stamps + global time sort
        (cf. urlstore.py:455-505)."""
        hosts = self.get_unvisited_domains()
        if not hosts:
            return []
        per_host = max_urls // len(hosts) or 1
        targets: list[tuple[float, str]] = []
        for host in hosts:
            e = self.urldict[host]
            drawn: list[str] = []
            for i, (p, v) in enumerate(zip(e.paths, e.visited)):
                if len(drawn) >= per_host or len(targets) + len(drawn) >= max_urls:
                    break
                if not v:
                    drawn.append(p)
                    e.visited[i] = True
                    e.count += 1
            now = datetime.now()
            if (not e.timestamp
                    or (now - e.timestamp).total_seconds() > time_limit):
                sched = 0.0
            else:
                sched = time_limit - round(
                    (now - e.timestamp).total_seconds(), 2)
            for p in drawn:
                targets.append((sched, host + p))
                sched += time_limit
            e.timestamp = now + timedelta(seconds=sched - time_limit)
            if e.all_visited():
                e.state = HostState.ALL_VISITED
        self._refresh_done()
        return sorted(targets)

    def _refresh_done(self) -> None:
        for e in self.urldict.values():
            if e.state is HostState.OPEN and e.all_visited() and e.paths:
                e.state = HostState.ALL_VISITED
        self.done = all(e.state in (HostState.ALL_VISITED, HostState.BUSTED)
                        for e in self.urldict.values()) if self.urldict else False

    # -------------------------------------------------------------- robots

    def store_rules(self, website: str, rules: RobotFileParser | None) -> None:
        self._entry(website).rules = rules

    def get_rules(self, website: str) -> RobotFileParser | None:
        e = self.urldict.get(website)
        return e.rules if e else None

    def get_crawl_delay(self, website: str, default: float = 5) -> float:
        rules = self.get_rules(website)
        delay = rules.crawl_delay("*") if rules else None
        return float(delay) if delay is not None else float(default)

    # ------------------------------------------------------------ counters

    def get_all_counts(self) -> list[int]:
        return [e.count for e in self.urldict.values()]

    def total_url_number(self) -> int:
        return sum(e.total() for e in self.urldict.values())

    def download_threshold_reached(self, threshold: float) -> bool:
        return any(e.count >= threshold for e in self.urldict.values())

    # ---------------------------------------------------------------- dump

    def dump_urls(self) -> list[str]:
        return [h + p for h, e in sorted(self.urldict.items())
                for p in e.paths]

    def print_urls(self) -> None:
        for h, e in sorted(self.urldict.items()):
            for p, v in zip(e.paths, e.visited):
                print(f"{h}{p}\t{v}")

    def print_unvisited_urls(self) -> None:
        for h in sorted(self.urldict):
            for u in self.find_unvisited_urls(h):
                print(u)

    def write(self, filename: str) -> None:
        with open(filename, "wb") as fh:
            pickle.dump(self, fh)


def load_store(filename: str) -> RayUrlStore:
    with open(filename, "rb") as fh:
        return pickle.load(fh)
