"""URL function parity tests.

Golden cases adapted from the reference's documented behavior
(/root/reference/tests/unit_tests.py; normalization :518-588, scrub
:156-230, check_url matrices :624-758, domain_filter :761-804,
is_known_link :913-925).  Implementation under test is from scratch."""

import pytest

from courlan_ray.functions import urls as U


# ------------------------------------------------------------- normalization

NORM_GOLDENS = [
    ("HTTP://WWW.Example.COM/Path/", "http://www.example.com/Path/"),
    ("http://example.com:80/x", "http://example.com/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("http://example.com//a//b", "http://example.com/a/b"),
    ("http://example.com/../a", "http://example.com/a"),
    ("http://example.com?b=2&a=1", "http://example.com/?a=1&b=2"),
    ("http://example.com/x?utm_source=x&id=5", "http://example.com/x?id=5"),
    ("http://example.com/x#utm_campaign=z", "http://example.com/x"),
    ("http://example.com/x#section", "http://example.com/x#section"),
]


@pytest.mark.parametrize("raw,want", NORM_GOLDENS)
def test_normalize_goldens(raw, want):
    assert U.normalize_url(raw) == want


def test_normalize_idempotent():
    for raw, want in NORM_GOLDENS:
        assert U.normalize_url(want) == want


def test_normalize_strict_drops_fragment_and_params():
    assert U.normalize_url("http://example.com/x?id=5&foo=bar#frag",
                           strict=True) == "http://example.com/x?id=5"


def test_normalize_punycode():
    assert U.normalize_url("http://xn--mnchen-3ya.de/x") == "http://münchen.de/x"


def test_trailing_slash_off():
    assert U.normalize_url("http://example.com/path/", strict=False,
                           language=None, trailing_slash=False) == \
        "http://example.com/path"


# --------------------------------------------------------------------- scrub

def test_scrub():
    assert U.scrub_url(" https://www.dwds.de ") == "https://www.dwds.de"
    assert U.scrub_url("<![CDATA[https://www.dwds.de]]>") == "https://www.dwds.de"
    assert U.scrub_url("https://www.dwds.de/test?param=test&amp;other=test") == \
        "https://www.dwds.de/test?param=test&other=test"
    assert U.scrub_url('https://www.dwds.de/test">here') == \
        "https://www.dwds.de/test"
    assert U.scrub_url("https://www.dwds.de/") == "https://www.dwds.de"


def test_clean_url():
    assert U.clean_url("HTTPS://WWW.DWDS.DE:443/") == "https://www.dwds.de"
    assert U.clean_url("http://test.net/foo.html?utm_source=twitter#gclid=123") \
        == "http://test.net/foo.html"
    assert U.clean_url(5) is None


# ------------------------------------------------------------------- filters

def test_basic_filter():
    assert U.basic_filter("http://example.com/x")
    assert not U.basic_filter("ftp://example.com/")
    assert not U.basic_filter("http://ex")
    assert not U.basic_filter("http://" + "x" * 500)


def test_validate_url():
    assert U.validate_url("http://www.example.com/")[0]
    assert not U.validate_url("http://www.")[0]
    assert not U.validate_url("gopher://example.com")[0]
    assert not U.validate_url("http://localhost")[0]      # dotless host
    assert U.validate_url("http://localhost:8080")[0]
    assert not U.validate_url(None)[0]


def test_extension_filter():
    assert U.extension_filter("/page.html")
    assert U.extension_filter("/page")
    assert U.extension_filter("/page.php5")
    assert not U.extension_filter("/image.jpg")
    assert not U.extension_filter("/archive.zip")


def test_domain_filter():
    assert U.domain_filter("www.example.org")
    assert U.domain_filter("192.0.2.1")
    assert not U.domain_filter("x" * 254 + ".com")
    assert not U.domain_filter("-example.org")
    assert not U.domain_filter("123.example")     # leading digit-only label
    assert not U.domain_filter("example.jpg")
    assert U.domain_filter("subdomain.example.co.uk")


def test_type_filter():
    assert not U.type_filter("http://x.org/feed")
    assert not U.type_filter("http://x.org/blog/wp-content/a.html")
    assert not U.type_filter("http://x.org/tags/interesting/")
    assert U.type_filter("http://x.org/article/a-good-read")
    assert not U.type_filter("http://x.org/video.mp4", strict=True)
    assert U.type_filter("http://x.org/video.mp4", strict=False)
    # navigation exemption
    assert U.type_filter("http://x.org/category/reviews/", with_nav=True)
    assert not U.type_filter("http://x.org/category/reviews/", with_nav=False)


def test_path_filter():
    assert not U.path_filter("/impressum", "")
    assert not U.path_filter("/index.html", "")
    assert U.path_filter("/index.html", "p=1")
    assert U.path_filter("/article.html", "")


def test_lang_filter():
    assert U.lang_filter("http://x.org/de/artikel", "de")
    assert not U.lang_filter("http://x.org/fr/article", "de")
    assert U.lang_filter("http://x.org/anything", "de")       # no cue: keep
    assert U.lang_filter("http://x.org/de/artikel", None)
    # strict host-prefix cue
    assert U.lang_filter("http://de.example.org/x", "de", strict=True)
    assert not U.lang_filter("http://fr.example.org/x", "de", strict=True)


def test_navigation_and_crawlable():
    assert U.is_navigation_page("http://x.org/page/2/")
    assert U.is_navigation_page("http://x.org/?p=42")
    assert not U.is_navigation_page("http://x.org/article")
    assert U.is_not_crawlable("http://x.org/login")
    assert U.is_not_crawlable("http://x.org/impressum.html")
    assert not U.is_not_crawlable("http://x.org/article")


# --------------------------------------------------------------- url parts

def test_get_base_url_and_host_path():
    assert U.get_base_url("https://example.org/path/x?q=1") == "https://example.org"
    host, path = U.get_host_and_path("https://example.org/path/x?q=1")
    assert host == "https://example.org"
    assert path == "/path/x?q=1"
    assert U.get_host_and_path("https://example.org")[1] == "/"


def test_extract_domain():
    assert U.extract_domain("https://www.example.org/x") == "example.org"
    assert U.extract_domain("https://sub.a.example.co.uk/") == "example.co.uk"
    assert U.extract_domain("http://192.0.2.4/x", fast=True) == "192.0.2.4"
    assert U.extract_domain("not a url") is None
    assert U.extract_domain("https://www.example.org/",
                            blacklist={"example.org"}) is None


def test_fix_relative_urls():
    base = "https://example.org/dir/page.html"
    assert U.fix_relative_urls(base, "other.html") == \
        "https://example.org/dir/other.html"
    assert U.fix_relative_urls(base, "/root.html") == \
        "https://example.org/root.html"
    assert U.fix_relative_urls(base, "//cdn.example.net/x.js") == \
        "https://cdn.example.net/x.js"
    assert U.fix_relative_urls(base, "https://other.org/a") == \
        "https://other.org/a"
    assert U.fix_relative_urls(base, "{template}") == "{template}"


def test_is_external():
    assert U.is_external("https://other.org/x", "https://example.org/")
    assert not U.is_external("https://sub.example.org/x", "https://example.org/")


def test_filter_urls():
    links = ["http://a.org/b", "http://a.org/b", "http://b.org/x",
             "http://feedburner.google.com/z"]
    assert U.filter_urls(links, None) == sorted(set(links))
    assert U.filter_urls(links, "a.org") == ["http://a.org/b"]
    assert U.filter_urls(links, "nomatch") == ["http://feedburner.google.com/z"]


def test_is_known_link():
    known = {"https://example.org/path"}
    assert U.is_known_link("https://example.org/path", known)
    assert U.is_known_link("https://example.org/path/", known)
    assert U.is_known_link("http://example.org/path", known)
    assert U.is_known_link("http://example.org/path/", known)
    assert not U.is_known_link("https://example.org/other", known)
    assert not U.is_known_link("", known)


# ----------------------------------------------------------------- check_url

def test_check_url_accepts():
    url, domain = U.check_url("https://www.example.org/article/one.html")
    assert url == "https://www.example.org/article/one.html"
    assert domain == "example.org"


def test_check_url_rejects():
    assert U.check_url("ftp://example.org/x") is None
    assert U.check_url("http://example.org/feed") is None
    assert U.check_url("http://example.org/pic.jpg") is None
    assert U.check_url("http://1234.org/x") is None
    assert U.check_url("http://example.org/fr/article", language="de") is None
    assert U.check_url("http://example.org/impressum",
                       strict=True) is None
    assert U.check_url("http://example.org/video.mp4", strict=True) is None


def test_check_url_normalizes():
    got = U.check_url("http://EXAMPLE.ORG:80/a//b?utm_medium=email&id=2")
    assert got == ("http://example.org/a/b?id=2", "example.org")
    # uppercase scheme fails the (case-sensitive) basic filter, like the
    # reference's `url.startswith("http")` (filters.py:138-140)
    assert U.check_url("HTTP://EXAMPLE.ORG/a/b.html") is None


# ------------------------------------------------------------ extract_links

PAGE = """
<html><body>
<a href="https://www.example.org/article/one.html">one</a>
<a href="/article/two.html">two</a>
<a href="https://other.org/external.html">ext</a>
<a href="https://www.example.org/nofollow.html" rel="nofollow">no</a>
<a hreflang="de" href="https://www.example.org/de/artikel.html">de</a>
<a hreflang="fr" href="https://www.example.org/fr/article.html">fr</a>
</body></html>
"""


def test_extract_links_internal():
    links = U.extract_links(PAGE, url="https://www.example.org/",
                            external_bool=False, strict=False)
    assert "https://www.example.org/article/one.html" in links
    assert "https://www.example.org/article/two.html" in links
    assert all("nofollow" not in l for l in links)
    assert all("other.org" not in l for l in links)


def test_extract_links_external():
    links = U.extract_links(PAGE, url="https://www.example.org/",
                            external_bool=True, strict=False)
    assert links == {"https://other.org/external.html"}


def test_extract_links_hreflang():
    links = U.extract_links(PAGE, url="https://www.example.org/",
                            language="de", strict=False)
    assert "https://www.example.org/de/artikel.html" in links
    assert all("/fr/" not in l for l in links)


def test_filter_links_priority_split():
    html = ('<a href="https://x.org/article/a.html">a</a>'
            '<a href="https://x.org/category/news/">nav</a>')
    links, priority = U.filter_links(html, "https://x.org/")
    assert links == ["https://x.org/article/a.html"]
    assert priority == ["https://x.org/category/news/"]
