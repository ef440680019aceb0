"""URL cleaning, filtering and normalization — courlan-compatible API.

From-scratch reimplementation of the reference's public URL surface
(/root/reference/courlan/__init__.py:35-57) on the stdlib only: no ``tld``
(registered domains come from a compact embedded public-suffix subset) and
no ``babel`` (locale plausibility uses an embedded ISO 639-1 code set).
Each function's docstring cites the reference behavior it mirrors; the
implementation is original.

These scalar functions define the semantics; ``urlbatch.py`` lifts them
into vectorized ``map_batches`` kernels for Dataset pipelines.
"""

from __future__ import annotations

import re
from html import unescape
from ipaddress import ip_address
from urllib.parse import (SplitResult, parse_qs, quote, urlencode, urljoin,
                          urlsplit, urlunsplit)

# ---------------------------------------------------------------- constants

_PROTOCOLS = {"http", "https"}

# web-page extensions that may serve HTML (cf. filters.py:110-135)
PAGE_EXTENSIONS = frozenset(
    ".adp .amp .asp .aspx .cfm .cgi .do .htm .html .htx .jsp .mht .mhtml "
    ".php .php3 .php4 .php5 .phtml .pl .shtml .stm .txt .xhtml .xml".split())

_EXT_RE = re.compile(r"\.[a-z]{2,5}$")

# hostname shape incl. optional port (cf. filters.py:41-54)
_HOST_RE = re.compile(
    r"^[a-z0-9](?:[a-z0-9_-]{0,61}[a-z0-9])?"
    r"(?:\.[a-z0-9](?:[a-z0-9_-]{0,61}[a-z0-9])?)*"
    r"\.[a-z][a-z0-9_-]{0,61}[a-z0-9]?"
    r"(?::(?:[1-9][0-9]{0,3}|[1-5][0-9]{4}|6[0-4][0-9]{3}|65[0-4][0-9]{2}"
    r"|655[0-2][0-9]|6553[0-5]))?$",
    re.I)

# media / asset types that are not text pages (cf. filters.py:68-73)
_MEDIA_EXT_RE = re.compile(
    r"\.(?:aac|atom|avi|css|eot|flv|gif|gz|ico|iso|jpe?g|js|json|m4a|mov|"
    r"mp3|mp4|ogg|pdf|pls|png|svg|swf|tar|tiff|ttf|web[mp]|woff|xml|zip)\b"
    r"|[/-](?:img|jpg|png)(?:\b|_)",
    re.I)

_ADULT_RE = re.compile(
    r"[/_-](?:bild-?kontakte|fick|gangbang|incest|live-?cams?|live-?chat|"
    r"porno?|sexcam|sexyeroti[ck]|swinger|x{3})\b",
    re.I)

# CMS / structural paths that are lists, not content (cf. filters.py:57-67)
_STRUCTURE_RE = re.compile(
    r"/(?:wp-(?:admin|content|includes|json|themes)|paged?|seite|search|"
    r"suche|gall?er[a-z]{1,2}|labels|archives|uploads|modules|attachment|"
    r"oembed)/"
    r"|[/_-](?:tags?|schlagwort|[ck]ategor[a-z]{1,2}|[ck]at|auth?or|user)/[^/]+/?$"
    r"|[^0-9]/[0-9]+/[0-9]+/$|[^0-9]/[0-9]{4}/$",
    re.I)

_NAVIGATION_RE = re.compile(
    r"[/_-](?:archives|auth?or|[ck]at|category|kategorie|paged?|schlagwort|"
    r"seite|tags?|topics?|user)/|\?p=[0-9]+",
    re.I)

_NOT_CRAWLABLE_RE = re.compile(
    r"/(?:[ck]onta[ck]t|datenschutzerkl.{1,2}rung|login|impressum|imprint)"
    r"(?:\.[a-z]{3,4})?/?$|/login\?|/(?:javascript:|mailto:|tel\.?:|whatsapp:)",
    re.I)

_INDEX_PAGE_RE = re.compile(r".{0,5}/(?:default|home|index)(?:\.[a-z]{3,5})?/?$",
                            re.I)

# tracking parameters (cf. clean.py:34-40; public AdGuard/ClearURLs lists)
_TRACKER_PARAM_RE = re.compile(
    r"^(?:dc|fbc|gc|twc|yc|ysc)lid"
    r"|^(?:click|gbra|msclk|igsh|partner|wbra)id"
    r"|^(?:ads?|mc|ga|gs|itm|mkt|ml|mtm|oly|pk|utm|vero)_"
    r"|(?:\b|_)(?:aff|affi|affiliate|campaign|cl?id|eid|ga|gl|kwd|keyword|"
    r"medium|ref|referr?er|session|source|uid|xtor)")

# clone-and-edit override point lives in settings.py like the reference's
from ..settings import (ALLOWED_PARAMS, LANG_PARAMS,  # noqa: F401
                        TARGET_LANGS)

# ISO 639-1 two-letter codes (public inventory) for locale plausibility
ISO_639_1 = frozenset(
    "aa ab ae af ak am an ar as av ay az ba be bg bh bi bm bn bo br bs ca "
    "ce ch co cr cs cu cv cy da de dv dz ee el en eo es et eu fa ff fi fj "
    "fo fr fy ga gd gl gn gu gv ha he hi ho hr ht hu hy hz ia id ie ig ii "
    "ik io is it iu ja jv ka kg ki kj kk kl km kn ko kr ks ku kv kw ky la "
    "lb lg li ln lo lt lu lv mg mh mi mk ml mn mr ms mt my na nb nd ne ng "
    "nl nn no nr nv ny oc oj om or os pa pi pl ps pt qu rm rn ro ru rw sa "
    "sc sd se sg si sk sl sm sn so sq sr ss st su sv sw ta te tg th ti tk "
    "tl tn to tr ts tt tw ty ug uk ur uz ve vi vo wa wo xh yi yo za zh zu".split())

# ISO 3166-1 alpha-2 territory codes (public inventory) — locale suffix
# plausibility for langcodes_score (babel raises UnknownLocaleError on
# unknown territories like XY; the score must stay unchanged there)
ISO_3166 = frozenset(
    "AD AE AF AG AI AL AM AO AQ AR AS AT AU AW AX AZ BA BB BD BE BF BG BH "
    "BI BJ BL BM BN BO BQ BR BS BT BV BW BY BZ CA CC CD CF CG CH CI CK CL "
    "CM CN CO CR CU CV CW CX CY CZ DE DJ DK DM DO DZ EC EE EG EH ER ES ET "
    "FI FJ FK FM FO FR GA GB GD GE GF GG GH GI GL GM GN GP GQ GR GS GT GU "
    "GW GY HK HM HN HR HT HU ID IE IL IM IN IO IQ IR IS IT JE JM JO JP KE "
    "KG KH KI KM KN KP KR KW KY KZ LA LB LC LI LK LR LS LT LU LV LY MA MC "
    "MD ME MF MG MH MK ML MM MN MO MP MQ MR MS MT MU MV MW MX MY MZ NA NC "
    "NE NF NG NI NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM PN PR PS PT "
    "PW PY QA RE RO RS RU RW SA SB SC SD SE SG SH SI SJ SK SL SM SN SO SR "
    "SS ST SV SX SY SZ TC TD TF TG TH TJ TK TL TM TN TO TR TT TV TW TZ UA "
    "UG UM US UY UZ VA VC VE VG VI VN VU WF WS YE YT ZA ZM ZW".split())

# ISO 15924 scripts that appear as locale subtags (zh-Hans etc.)
LOCALE_SCRIPTS = frozenset(
    "Arab Armn Beng Cyrl Deva Ethi Geor Grek Gujr Guru Hans Hant Hebr "
    "Jpan Khmr Knda Kore Laoo Latn Mlym Mymr Orya Sinh Taml Telu Thai "
    "Tibt".split())

# common multi-label public suffixes (compact embedded subset; stands in
# for the `tld` package, urlutils.py:24-42)
_SCHEME_RE = re.compile(r"https?://", re.I)
_MARKUP_REST_RE = re.compile(r"</?[a-z]{0,4}?>|\{.+?\}")   # {0,4}: '<>' too
                                                           # (clean.py:22)
_FIRST_URL_RE = re.compile(r'(https?://[^">&? ]+?)(?:https?://)')
_INNER_URL_RE = re.compile(r"https?://.+?(https?://.+?)(?:https?://|$)")
_BAD_TAIL_RE = re.compile(r'(.*?)[<>"\s]')
_CTRL = "".join(map(chr, range(0x20)))

_FIND_A_RE = re.compile(r"<a\s+[^<>]+?>", re.I)
_HREF_RE = re.compile(r'href=["\']?([^ ]+?)(["\' >])', re.I)
_HREFLANG_RE = re.compile(r'hreflang=["\']?([a-z-]+)', re.I)
_FEED_HOST_RE = re.compile(r"feed(?:burner|proxy)", re.I)

_FAST_DOMAIN_RE = re.compile(
    r"(?:ht|f)tps?://(?:[^/?#]{0,63}\.)?"
    r"([^/?#.]{4,63}\.[^/?#]{2,63}"
    r"|\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
    r"|[0-9a-f:]{16,})"
    r"(?:/|$)", re.I)
_PORT_SUFFIX_RE = re.compile(r"(?<=\D):\d+")
_WWW_PREFIX_RE = re.compile(r"^www[0-9]*\.")


# ------------------------------------------------------------------ parsing

def _parse(url: str | SplitResult) -> SplitResult:
    """str (html-unescaped) or SplitResult -> SplitResult
    (cf. urlutils.py:61-69)."""
    if isinstance(url, SplitResult):
        return url
    if isinstance(url, str):
        return urlsplit(unescape(url))
    raise TypeError(f"wrong input type: {type(url)}")


# ------------------------------------------------------------------ filters

def basic_filter(url: str) -> bool:
    """Formal gate: http(s) prefix, 10 <= len < 500 (cf. filters.py:138-140)."""
    return bool(url.startswith("http") and 10 <= len(url) < 500)


def validate_url(url: str | None) -> tuple[bool, SplitResult | None]:
    """Parse + scheme/netloc plausibility (cf. filters.py:254-274)."""
    try:
        parts = urlsplit(url)
    except (ValueError, AttributeError):
        return False, None
    if parts.scheme not in _PROTOCOLS:
        return False, None
    host = parts.netloc
    if len(host) < 4:
        return False, None
    if host.lower().startswith("www.") and len(host) < 8:
        return False, None
    if "." not in host and ":" not in host:
        return False, None
    return True, parts


def is_valid_url(url: str | None) -> bool:
    return validate_url(url)[0]


def extension_filter(urlpath: str) -> bool:
    """Keep paths with no extension or a page-serving one
    (cf. filters.py:174-177)."""
    m = _EXT_RE.search(urlpath.lower())
    return not m or m[0] in PAGE_EXTENSIONS


_IP_CHARS = frozenset("0123456789abcdef.:")


def domain_filter(domain: str) -> bool:
    """Host sanity: DNS length, IP literals, FQDN shape with idna retry,
    leading-digit label and asset-extension rejects (cf. filters.py:143-171)."""
    if len(domain) > 253:
        return False
    if domain and all(c in _IP_CHARS for c in domain):
        try:
            ip_address(domain)
            return True
        except ValueError:
            pass                          # hex-ish but not an IP: keep testing
    if not _HOST_RE.match(domain):
        try:
            if not _HOST_RE.match(domain.encode("idna").decode("utf-8")):
                return False
        except UnicodeError:
            return False
    if domain.split(".", 1)[0].isdigit() or _MEDIA_EXT_RE.search(domain):
        return False
    m = _EXT_RE.search(domain.lower())
    return not m or m[0] not in PAGE_EXTENSIONS


def type_filter(url: str, strict: bool = False, with_nav: bool = False) -> bool:
    """Reject feeds, CMS structure pages, and (strict) media/adult targets
    (cf. filters.py:236-251)."""
    if url.endswith(("/feed", "/rss", "_archive.html")):
        return False
    if _STRUCTURE_RE.search(url) and (not with_nav or not is_navigation_page(url)):
        return False
    if strict and (_MEDIA_EXT_RE.search(url) or _ADULT_RE.search(url)):
        return False
    return True


def path_filter(urlpath: str, query: str) -> bool:
    """Strict-only: drop non-crawlable paths and bare index pages
    (cf. filters.py:229-233)."""
    if _NOT_CRAWLABLE_RE.search(urlpath):
        return False
    return bool(query) or not _INDEX_PAGE_RE.match(urlpath)


def is_navigation_page(url: str) -> bool:
    return bool(_NAVIGATION_RE.search(url))


def is_not_crawlable(url: str) -> bool:
    return bool(_NOT_CRAWLABLE_RE.search(url))


def langcodes_score(language: str, segment: str, score: int) -> int:
    """±1 if the segment parses as a locale whose language does/doesn't
    match; implausible locales leave the score unchanged
    (cf. filters.py:180-191; ISO 639-1 + ISO 3166 + script tables replace
    babel's ``Locale.parse`` — same verdict on every locale in the
    reference's unit-test corpus, e.g. ``en_HK``→+1, ``en_XY``→0,
    ``de_DE``→-1 for target ``en``; the one approximation is that a valid
    (language, territory) pair babel's CLDR data lacks still scores)."""
    delim = "_" if "_" in segment else "-"
    parts = segment.split(delim)
    lang = parts[0].lower()
    if lang not in ISO_639_1:
        return score
    for suffix in parts[1:]:
        if not ((len(suffix) == 2 and suffix.upper() in ISO_3166)
                or (len(suffix) == 4 and suffix.title() in LOCALE_SCRIPTS)
                or (len(suffix) == 3 and suffix.isdigit())):
            return score          # unparseable locale: no evidence
    return score + 1 if lang == language else score - 1


_PATH_LANG_RE = re.compile(r"https?://[^/]+/([a-z]{2})(?:[_-][a-z]{2,3})?(?:/|$)",
                           re.I)
_ALL_LANGS_RE = re.compile(r"/([a-z]{2})(?:[_-][a-z]{2})?/", re.I)
_ALL_LANGS_END_RE = re.compile(r"/([a-z]{2})(?:[_-][a-z]{2})?(?:/|$)", re.I)
_HOST_LANG_RE = re.compile(r"https?://([a-z]{2})\.[^.]{4,}\.[^.]+(?:\.[^.]+)?/",
                           re.I)


def lang_filter(url: str, language: str | None = None, strict: bool = False,
                trailing_slash: bool = True) -> bool:
    """Score i18n cues in the URL; keep iff score >= 0
    (cf. filters.py:194-226)."""
    if language is None:
        return True
    score = 0
    first = _PATH_LANG_RE.match(url)
    if first:
        finder = _ALL_LANGS_RE if trailing_slash else _ALL_LANGS_END_RE
        occurrences = finder.findall(url)
        if len(occurrences) == 1:
            score = langcodes_score(language, first[1], score)
        # 2 occurrences: the reference scores NOTHING here — its
        # ALL_PATH_LANGS.findall yields (lang, suffix) tuples which
        # babel's Locale.parse rejects with TypeError, silently swallowed
        # in langcodes_score (filters.py:188-189), so the score stays 0
        # and the URL is kept.  Mirrored deliberately for strict parity
        # (e.g. '/de/page/fr/' with language='en' is KEPT).
        # 3+ candidates: ambiguous, no scoring
    if strict:
        host = _HOST_LANG_RE.match(url)
        if host:
            score += 1 if host[1].lower() == language else -1
    return score >= 0


# ----------------------------------------------------------------- cleaning

def scrub_url(url: str) -> str:
    """Strip whitespace/control chars, CDATA, markup rests, &amp;, pick the URL
    out of doubled/garbled inputs, trim embedded-URL slashes
    (cf. clean.py:51-94)."""
    url = "".join(url.split()).strip(_CTRL)
    if url.startswith("<![CDATA["):
        url = url.replace("<![CDATA[", "").replace("]]>", "")
    url = _MARKUP_REST_RE.sub("", url)
    url = re.sub(r"/\&$", "", url.replace("&amp;", "&"))
    if len(_SCHEME_RE.findall(url)) > 1 and "web.archive.org" not in url:
        m = _FIRST_URL_RE.match(url)
        if m and is_valid_url(m[1]):
            url = m[1]
        else:
            m = _INNER_URL_RE.match(url)
            if m and is_valid_url(m[1]):
                url = m[1]
    m = _BAD_TAIL_RE.match(url)
    if m:
        url = m[1]
    if url.count("/") == 3 or url.count("://") > 1:
        url = url.rstrip("/")
    return url


def clean_query(querystring: str, strict: bool = False,
                language: str | None = None) -> str:
    """Sorted params, tracker removal, strict allowlist, language-param
    gate raising ValueError on mismatch (cf. clean.py:97-127)."""
    if not querystring:
        return ""
    params = parse_qs(querystring)
    kept = {}
    for name in sorted(params):
        low = name.lower()
        if strict:
            if low not in ALLOWED_PARAMS and low not in LANG_PARAMS:
                continue
        elif _TRACKER_PARAM_RE.search(low):
            continue
        if (language in TARGET_LANGS and low in LANG_PARAMS
                and str(params[name][0]) not in TARGET_LANGS[language]):
            raise ValueError(f"wrong language param: {name}")
        kept[name] = params[name]
    return urlencode(kept, doseq=True)


def decode_punycode(string: str) -> str:
    """idna-decode xn-- labels (cf. clean.py:130-145)."""
    if "xn--" not in string:
        return string
    out = []
    for label in string.split("."):
        if label.lower().startswith("xn--"):
            try:
                label = label.encode("utf8").decode("idna")
            except UnicodeError:
                pass
        out.append(label)
    return ".".join(out)


def normalize_part(url_part: str) -> str:
    """Percent-quote path/fragment with the reference's safe set
    (cf. clean.py:148-151)."""
    return quote(url_part, safe="/%!=:,-")


def normalize_fragment(fragment: str, language: str | None = None) -> str:
    """Tracker cleaning inside #fragment (cf. clean.py:154-161)."""
    if "=" in fragment:
        if "&" in fragment:
            fragment = clean_query(fragment, False, language)
        elif _TRACKER_PARAM_RE.search(fragment):
            fragment = ""
    return normalize_part(fragment)


_MULTI_SLASH_RE = re.compile(r"/+")
_LEADING_DOTDOT_RE = re.compile(r"^(?:/\.\.(?![^/]))+")


def normalize_url(parsed_url: SplitResult | str, strict: bool = False,
                  language: str | None = None,
                  trailing_slash: bool = True) -> str:
    """THE canonical form (cf. clean.py:164-195): lowercase scheme+host,
    punycode decode, default-port strip (IPv6-safe), // collapse, leading
    /../ removal, cleaned sorted query, root-slash & trailing-slash rules,
    strict drops the fragment.  Idempotent."""
    parts = _parse(parsed_url)
    scheme = parts.scheme.lower()
    host = decode_punycode(parts.netloc.lower())
    try:
        port = parts.port
    except ValueError:
        port = None
    if (scheme, port) in (("http", 80), ("https", 443)):
        host = host.rsplit(":", 1)[0]
    path = normalize_part(
        _LEADING_DOTDOT_RE.sub("", _MULTI_SLASH_RE.sub("/", parts.path)))
    query = clean_query(parts.query, strict, language)
    if query and not path:
        path = "/"
    elif not trailing_slash and not query and path.endswith("/"):
        path = path.rstrip("/")
    fragment = "" if strict else normalize_fragment(parts.fragment, language)
    return urlunsplit((scheme, host, path, query, fragment))


def clean_url(url: str, language: str | None = None) -> str | None:
    """scrub + normalize, None on failure (cf. clean.py:43-48)."""
    try:
        return normalize_url(scrub_url(url), False, language, False)
    except (AttributeError, ValueError):
        return None


# ------------------------------------------------------------ domain logic

def get_tldinfo(url: str, fast: bool = False) -> tuple[str | None, str | None]:
    """(domain_label, registered_domain) via regex fast path with full
    public-suffix-list resolution (cf. urlutils.py:24-42; the ``tld``
    package is replaced by the vendored Mozilla PSL snapshot in
    functions/psl.py — same data, same algorithm)."""
    if not url or not isinstance(url, str):
        return None, None
    if fast:
        m = _FAST_DOMAIN_RE.match(url)
        if m:
            full = _PORT_SUFFIX_RE.sub("", m[1].split("@")[-1])
            label = full.split(".", 1)[0]
            if label:
                return label, full
    try:
        host = urlsplit(url).netloc.split("@")[-1].lower()
    except ValueError:
        return None, None
    host = _PORT_SUFFIX_RE.sub("", host)
    host = _WWW_PREFIX_RE.sub("", host)
    if not host or "." not in host:
        return None, None
    # full vendored public-suffix list (functions/psl.py) — the same
    # Mozilla PSL (ICANN + private sections) the reference's ``tld``
    # package resolves against (urlutils.py:24-58)
    from .psl import registrable_domain
    registered = registrable_domain(host)
    if registered is None:
        # host IS a public suffix: keep the historical lenient 2-label
        # fallback (the reference returns a result here too — tld's
        # fix_protocol path — rather than failing hard)
        registered = ".".join(host.split(".")[-2:])
    return registered.split(".", 1)[0], registered


def extract_domain(url: str, blacklist: set[str] | None = None,
                   fast: bool = False) -> str | None:
    """Registered domain, optionally blacklist-gated
    (cf. urlutils.py:45-58)."""
    blacklist = blacklist or set()
    label, full = get_tldinfo(url, fast=fast)
    if full and label not in blacklist and full not in blacklist:
        return full
    return None


def get_base_url(url: str | SplitResult) -> str:
    """scheme://netloc (cf. urlutils.py:72-80)."""
    parts = _parse(url)
    prefix = parts.scheme + "://" if parts.scheme else ""
    return prefix + parts.netloc


def get_host_and_path(url: str | SplitResult) -> tuple[str, str]:
    """(hostinfo, path+query+fragment), root -> '/' — the reference's
    groupby key extractor (cf. urlutils.py:83-96)."""
    parts = _parse(url)
    host = get_base_url(parts)
    pathval = urlunsplit(["", "", parts.path, parts.query, parts.fragment]) or "/"
    if not host:
        raise ValueError(f"incomplete URL: {url}")
    return host, pathval


def get_hostinfo(url: str) -> tuple[str | None, str]:
    """(registered domain, base URL) (cf. urlutils.py:99-103)."""
    return extract_domain(url, fast=True), get_base_url(url)


def fix_relative_urls(baseurl: str, url: str) -> str:
    """Resolve relative links against a base; '{template}' passthrough;
    scheme-relative handling (cf. urlutils.py:106-120)."""
    if url.startswith("{"):
        return url
    base = urlsplit(baseurl)
    target = urlsplit(url)
    if target.netloc not in (base.netloc, ""):
        if target.scheme:
            return url
        return urlunsplit(target._replace(scheme=base.scheme or "http"))
    return urljoin(baseurl, url)


def is_external(url: str, reference: str, ignore_suffix: bool = True) -> bool:
    """Compare registered domains (± suffix) (cf. urlutils.py:137-145)."""
    ref_label, ref_full = get_tldinfo(reference, fast=True)
    label, full = get_tldinfo(url, fast=True)
    return label != ref_label if ignore_suffix else full != ref_full


def filter_urls(link_list: list[str], urlfilter: str | None) -> list[str]:
    """Substring filter + feed-host fallback + sorted distinct
    (cf. urlutils.py:123-134)."""
    if urlfilter is None:
        return sorted(set(link_list))
    hits = [l for l in link_list if urlfilter in l]
    if not hits:
        hits = [l for l in link_list if _FEED_HOST_RE.search(l)]
    return sorted(set(hits))


def is_known_link(link: str, known_links: set[str]) -> bool:
    """Membership of the link and its ±slash / http↔https variants
    (cf. urlutils.py:148-174)."""
    if not link:
        return False
    if link in known_links:
        return True
    flipped = link.rstrip("/") if link.endswith("/") else link + "/"
    if flipped in known_links:
        return True
    if link.startswith("http"):
        other = "http" + link[5:] if link.startswith("https") else "https" + link[4:]
        other_flip = other.rstrip("/") if other.endswith("/") else other + "/"
        if other in known_links or other_flip in known_links:
            return True
    return False


# ------------------------------------------------------------ the pipeline

def check_url(url: str, strict: bool = False, with_redirects: bool = False,
              language: str | None = None, with_nav: bool = False,
              trailing_slash: bool = True,
              blacklist: set[str] | None = None,
              redirect_resolver=None) -> tuple[str, str] | None:
    """Flagship per-record chain (cf. core.py:39-129): basic -> scrub ->
    (redirect) -> type -> lang -> validate -> extension -> domain ->
    (strict path) -> normalize -> extract_domain; None on any failure.

    Strict mode applies the shipped domain ``BLACKLIST``
    (settings.py; reference core.py:115-119) — pass ``blacklist`` to
    override it (empty set disables).  ``with_redirects`` needs a
    resolver: pass ``redirect_resolver`` (a callable ``url -> final_url``
    raising on failure — see ``stages.redirects.RedirectResolver`` for
    the actor-pool stage with an injectable fetcher); without one it
    raises, since this engine ships no network client
    (reference network.py:47-72)."""
    try:
        if not basic_filter(url):
            return None
        url = scrub_url(url)
        if with_redirects:
            if redirect_resolver is None:
                from ..stages.redirects import redirection_test
                redirect_resolver = redirection_test
            url = redirect_resolver(url)
        if not type_filter(url, strict=strict, with_nav=with_nav):
            return None
        if language is not None and not lang_filter(url, language, strict,
                                                    trailing_slash):
            return None
        ok, parts = validate_url(url)
        if not ok or parts is None:
            return None
        if not extension_filter(parts.path):
            return None
        if not domain_filter(parts.netloc):
            return None
        if strict and not path_filter(parts.path, parts.query):
            return None
        url = normalize_url(parts, strict, language, trailing_slash)
        if strict:
            from ..settings import BLACKLIST
            bl = BLACKLIST if blacklist is None else blacklist
            domain = extract_domain(url, blacklist=bl, fast=True)
        else:
            domain = extract_domain(url, blacklist=blacklist, fast=True)
        if domain is None:
            return None
        return url, domain
    except (AttributeError, ValueError):
        return None


def extract_links(pagecontent: str, url: str | None = None,
                  external_bool: bool = False, *, no_filter: bool = False,
                  language: str | None = None, strict: bool = True,
                  trailing_slash: bool = True, with_nav: bool = False,
                  redirects: bool = False,
                  reference: str | None = None,
                  base_url: str | None = None) -> set[str]:
    """Regex link harvest + per-link check_url + internal/external split +
    variant-aware dedup (cf. core.py:132-227)."""
    if base_url:
        raise ValueError("'base_url' is deprecated, use 'url' instead.")
    validlinks: set[str] = set()
    if not pagecontent:
        return validlinks
    base = get_base_url(url or "")
    url = url or base
    reference = reference or base

    candidates: set[str] = set()
    for tag in _FIND_A_RE.findall(pagecontent):
        if "rel=" in tag and "nofollow" in tag:
            continue
        if not no_filter and language is not None and "hreflang" in tag:
            lm = _HREFLANG_RE.search(tag)
            if lm:
                lang = lm[1].lower()
                if lang.startswith(language) or lang == "x-default":
                    hm = _HREF_RE.search(tag)
                    if hm:
                        candidates.add(hm[1])
            continue
        hm = _HREF_RE.search(tag)
        if hm:
            candidates.add(hm[1])

    for link in candidates:
        if not link.startswith("http"):
            link = fix_relative_urls(url, link)
        if not no_filter:
            checked = check_url(link, strict=strict,
                                trailing_slash=trailing_slash,
                                with_nav=with_nav, with_redirects=redirects,
                                language=language)
            if checked is None:
                continue
            link = checked[0]
            if reference and external_bool != is_external(
                    url=link, reference=reference, ignore_suffix=True):
                continue
        if is_known_link(link, validlinks):
            continue
        validlinks.add(link)
    return validlinks


def filter_links(htmlstring: str, url: str | None, *,
                 lang: str | None = None, rules=None, external: bool = False,
                 strict: bool = False, with_nav: bool = True,
                 base_url: str | None = None) -> tuple[list[str], list[str]]:
    """extract_links + robots gate + navigation-priority split
    (cf. core.py:230-267)."""
    if base_url:
        raise ValueError("'base_url' is deprecated, use 'url' instead.")
    links, priority = [], []
    for link in extract_links(pagecontent=htmlstring, url=url,
                              external_bool=external, language=lang,
                              strict=strict, with_nav=with_nav):
        if is_not_crawlable(link):
            continue
        if rules is not None and not rules.can_fetch("*", link):
            continue
        (priority if is_navigation_page(link) else links).append(link)
    return links, priority
