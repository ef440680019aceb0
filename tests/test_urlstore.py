"""RayUrlStore frontier tests, mirroring the reference's store behavior
(/root/reference/tests/urlstore_tests.py: dedup/variants :57-89,225-242,
draws & scheduling :192-394, persistence :477-501)."""

import os

from courlan_ray.state.urltable import RayUrlStore, load_store, HostState


def _store(**kw) -> RayUrlStore:
    s = RayUrlStore(**kw)
    s.add_urls([
        "https://example.org/a",
        "https://example.org/b",
        "https://example.org/a",                 # exact dup
        "https://example.org/a/",                # trailing-slash variant
        "https://other.org/x?utm_source=feed",   # tracker stripped
        "http://example.org/c",                  # http variant of https host
    ])
    return s


def test_add_dedup_and_variant_unification():
    s = _store()
    assert set(s.get_known_domains()) == {"https://example.org",
                                          "https://other.org"}
    known = s.find_known_urls("https://example.org")
    assert known == ["https://example.org/a", "https://example.org/b",
                     "https://example.org/c"]
    assert s.total_url_number() == 4
    assert s.is_known("https://example.org/a")
    assert s.is_known("http://example.org/a")        # protocol variant
    assert s.is_known("https://example.org/a/")      # slash variant
    assert not s.is_known("https://example.org/zzz")
    # tracker was stripped during canonicalization
    assert s.find_known_urls("https://other.org") == ["https://other.org/x"]


def test_priority_appendleft():
    s = _store()
    s.add_urls(appendleft=["https://example.org/priority"])
    assert s.get_url("https://example.org") == "https://example.org/priority"


def test_get_url_marks_visited():
    s = _store()
    first = s.get_url("https://example.org")
    assert first == "https://example.org/a"
    assert s.has_been_visited(first)
    assert not s.has_been_visited("https://example.org/b")
    assert s.find_unvisited_urls("https://example.org") == [
        "https://example.org/b", "https://example.org/c"]
    # drain
    assert s.get_url("https://example.org") == "https://example.org/b"
    assert s.get_url("https://example.org") == "https://example.org/c"
    assert s.get_url("https://example.org") is None
    assert s.is_exhausted_domain("https://example.org")


def test_filter_unknown_and_unvisited():
    s = _store()
    probe = ["https://example.org/a", "https://example.org/new",
             "https://nowhere.net/1"]
    assert s.filter_unknown_urls(probe) == ["https://example.org/new",
                                            "https://nowhere.net/1"]
    s.get_url("https://example.org")
    # reference semantics (urlstore_tests.py:318): unknown URLs count as
    # unvisited and come back; only known-and-visited URLs are removed
    assert s.filter_unvisited_urls(probe) == ["https://example.org/new",
                                              "https://nowhere.net/1"]
    assert s.filter_unvisited_urls(["https://example.org/b"]) == [
        "https://example.org/b"]


def test_schedule_fair_share_and_sorted():
    s = RayUrlStore()
    s.add_urls([f"https://h{i}.org/p{j}" for i in range(3) for j in range(5)])
    sched = s.establish_download_schedule(max_urls=6, time_limit=10)
    assert len(sched) == 6
    secs = [t for t, _ in sched]
    assert secs == sorted(secs)
    hosts = {u.split("/p")[0] for _, u in sched}
    assert len(hosts) == 3                      # 2 per host (fair share)


def test_download_urls_and_counters():
    s = _store()
    urls = s.get_download_urls(time_limit=10)
    assert len(urls) == 2                        # one per OPEN host
    assert sum(s.get_all_counts()) == 2
    assert s.download_threshold_reached(1)
    assert not s.download_threshold_reached(5)


def test_discard_and_busted():
    s = _store()
    s.discard(["https://example.org"])
    assert s.urldict["https://example.org"].state is HostState.BUSTED
    s.add_urls(["https://example.org/zzz"])      # ignored for busted host
    assert s.find_known_urls("https://example.org") == []


def test_add_from_html():
    s = RayUrlStore()
    html = ('<a href="https://x.org/article/a.html">a</a>'
            '<a href="https://x.org/category/news/">nav</a>')
    s.add_from_html(html, "https://x.org/")
    known = s.find_known_urls("https://x.org")
    # navigation link is priority -> left insert -> first
    assert known[0] == "https://x.org/category/news/"
    assert "https://x.org/article/a.html" in known


def test_persistence_roundtrip(tmp_path):
    s = _store()
    path = os.path.join(tmp_path, "store.pickle")
    s.write(path)
    s2 = load_store(path)
    assert s2.dump_urls() == s.dump_urls()
    assert s2.total_url_number() == s.total_url_number()


def test_verbose_signal_dump(capsys):
    """verbose=True registers SIGINT/SIGTERM handlers that dump the
    unvisited frontier and exit (reference urlstore.py:144-159)."""
    import signal
    import pytest
    from courlan_ray.state.urltable import RayUrlStore

    old_int = signal.getsignal(signal.SIGINT)
    old_term = signal.getsignal(signal.SIGTERM)
    try:
        store = RayUrlStore(verbose=True)
        store.add_urls(["https://example.org/a", "https://example.org/b"])
        handler = signal.getsignal(signal.SIGTERM)
        assert callable(handler) and handler is signal.getsignal(signal.SIGINT)
        with pytest.raises(SystemExit):
            handler(signal.SIGTERM, None)
        out = capsys.readouterr().out
        assert "https://example.org/a" in out
    finally:
        signal.signal(signal.SIGINT, old_int)
        signal.signal(signal.SIGTERM, old_term)
