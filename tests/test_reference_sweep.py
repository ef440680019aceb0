"""Full parity sweep over the reference's own unit-test corpus.

Every pure (no-network, no-CLI, no-filesystem) test function in
/root/reference/tests/unit_tests.py is compiled from its AST and executed
with THIS engine's implementations bound to the reference's import names —
so every URL literal and expected verdict in the reference suite checks
our kernels directly (VERDICT round 3 next #6: TLD / langcodes breadth).

Excluded by design:
- test_urlcheck_redirects / test_redirection: live HTTP (our injectable-
  fetcher twin lives in test_reference_goldens.py).
- test_cli*: subprocess CLI of the reference package itself.
- test_sample: random.sample draw — our sampler is deterministic
  seed/key-derived by documented deviation (SURVEY.md §4).
- test_meta: pokes functools.lru_cache internals (cache_info); our
  clear_caches parity test lives in test_stages.py.
"""

from __future__ import annotations

import ast
import os

import pytest

REF_TESTS = "/root/reference/tests/unit_tests.py"

SWEEP = [
    "test_baseurls", "test_fix_relative", "test_scrub",
    "test_extension_filter", "test_spam_filter", "test_type_filter",
    "test_path_filter", "test_lang_filter", "test_navigation",
    "test_validate", "test_normalization", "test_qelems",
    "test_urlcheck", "test_urlcheck_type_and_spam",
    "test_urlcheck_language", "test_urlcheck_domain",
    "test_urlcheck_port", "test_domain_filter", "test_urlutils",
    "test_external", "test_extraction", "test_extraction_navigation",
    "test_filter_links", "test_filter_links_with_rules", "test_examples",
]


def _load_reference_tests() -> dict[str, object]:
    tree = ast.parse(open(REF_TESTS).read())
    from urllib.parse import SplitResult, urlsplit
    import logging

    from courlan_ray.functions.urls import (
        check_url, clean_url, domain_filter, extension_filter,
        extract_domain, extract_links, filter_links, filter_urls,
        fix_relative_urls, get_base_url, get_host_and_path, get_hostinfo,
        is_external, is_known_link, is_navigation_page, is_not_crawlable,
        is_valid_url, lang_filter, langcodes_score, normalize_url,
        path_filter, scrub_url, type_filter, validate_url, _parse,
    )

    ns = dict(locals())
    ns.update({"pytest": pytest, "logging": logging,
               "SplitResult": SplitResult, "urlsplit": urlsplit})
    fns = {}
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in SWEEP:
            mod = ast.Module(body=[node], type_ignores=[])
            code = compile(ast.fix_missing_locations(mod),
                           f"reference:{node.name}", "exec")
            local = dict(ns)
            exec(code, local)
            fns[node.name] = local[node.name]
    return fns


@pytest.mark.skipif(not os.path.exists(REF_TESTS),
                    reason="reference checkout not present")
@pytest.mark.parametrize("name", SWEEP)
def test_reference_parity(name):
    fns = _load_reference_tests()
    assert name in fns, f"reference test {name} vanished from the corpus"
    fns[name]()
