"""Package-level setting constants — the reference's documented override
point ("clone and re-install", /root/reference/courlan/settings.py:1-109,
README.md:414-422).

``BLACKLIST`` mirrors the reference's shipped domain blacklist
(settings.py:7-85): registered-domain labels of high-traffic platform /
CDN / adult sites that strict-mode filtering drops.  It is matched by
``extract_domain`` against both the first domain label and the full
registered domain (urlutils.py:45-58) and applied by ``check_url`` in
strict mode only (core.py:115-119).  At pipeline scale the set is a
broadcast small side: shipped once per worker, probed in the kernel.
"""

from __future__ import annotations

BLACKLIST = {
    "360", "akamai", "aliexpress", "amzn", "amazon", "amazonaws", "baidu",
    "bit", "bongacams", "chaturbate", "cloudfront", "daftsex", "delicious",
    "digg", "ebay", "ebay-kleinanzeigen", "facebook", "feedburner",
    "flickr", "gettyimages", "gmx", "google", "gravatar", "http", "imgur",
    "immobilienscout24", "instagr", "instagram", "jd", "last", "linkedin",
    "live", "livejasmin", "localhost", "mail", "naver", "netflix",
    "office", "ok", "onlyfans", "otto", "paypal", "pinterest", "pornhub",
    "postbank", "qq", "reddit", "redtube", "sina", "sohu", "soundcloud",
    "spankbang", "taobao", "telegram", "tiktok", "tmall", "tnaflix",
    "twitch", "twitter", "twitpic", "txxx", "vk", "vkontakte", "vimeo",
    "web", "weibo", "whatsapp", "xhamster", "xnxx", "xvideos", "yahoo",
    "yandex", "youjizz", "youporn", "youtube", "youtu", "zoom",
}


# query-parameter filtering (reference settings.py ALLOWED_PARAMS /
# LANG_PARAMS / TARGET_LANGS — same clone-and-edit override point)
ALLOWED_PARAMS = frozenset(
    "aid article_id artnr id itemid objectid p page pagenum page_id pid "
    "post postid product_id".split())
LANG_PARAMS = frozenset({"lang", "language"})
TARGET_LANGS = {"de": {"de", "deutsch", "ger", "german"},
                "en": {"en", "english", "eng"}}
