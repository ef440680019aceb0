"""courlan_ray: a Ray-Data-native data-processing engine with the query
surface of adbar/courlan, generalized to near-duplicate detection and
clustering over image+caption tables.

Public API parity with the reference's exports
(/root/reference/courlan/__init__.py:35-57) plus the dedup engine.
"""

from .config import DedupConfig, DEFAULT_CONFIG
from .functions.urls import (
    basic_filter, check_url, clean_url, decode_punycode, extension_filter,
    extract_domain, extract_links, filter_links, filter_urls,
    fix_relative_urls, get_base_url, get_host_and_path, get_hostinfo,
    get_tldinfo, is_external, is_known_link, is_navigation_page,
    is_not_crawlable, is_valid_url, lang_filter, normalize_url, scrub_url,
    validate_url, check_url as check_url_strict_api,
)
from .pipelines.url_pipeline import sample_urls
from .state.urltable import RayUrlStore, RayUrlStore as UrlStore, load_store
from .pipelines.image_dedup import dedup_pipeline, pair_recall
from .pipelines.text_dedup import text_dedup_pipeline

__version__ = "0.1.0"

__all__ = [
    "DedupConfig", "DEFAULT_CONFIG",
    # courlan API parity
    "basic_filter", "check_url", "clean_url", "decode_punycode",
    "extension_filter", "extract_domain", "extract_links", "filter_links",
    "filter_urls", "fix_relative_urls", "get_base_url", "get_host_and_path",
    "get_hostinfo", "get_tldinfo", "is_external", "is_known_link",
    "is_navigation_page", "is_not_crawlable", "is_valid_url", "lang_filter",
    "normalize_url", "sample_urls", "scrub_url", "validate_url",
    "RayUrlStore", "UrlStore", "load_store",
    # engine
    "dedup_pipeline", "pair_recall", "text_dedup_pipeline",
]
