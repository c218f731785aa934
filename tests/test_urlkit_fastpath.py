"""Vectorized canonicalization fast path ≡ the reference-exact slow path.

The fast path (udfs.FAST_URL_RE) may only accept URLs whose canonical form
equals the input modulo a default-port strip; everything else must route
through process_url. This test runs the candidate kernel twice on a probe
corpus — fast path enabled vs force-disabled (a pass-through fetch
condition disables it) — and asserts byte-identical outputs, plus that the
common shapes actually take the fast path.

No Spark session needed: the kernel is a plain pandas generator.
"""

import pandas as pd
import pytest

from simplecrawler_spark.config import CrawlerConfig
from simplecrawler_spark.operators.udfs import (FAST_URL_RE,
                                                make_candidate_processor)

FAST_EXPECTED = [
    "http://h0.test/p/1",
    "https://a.b.c.example/x_y-z.~stuff",
    "http://h.test:8080/x",
    "http://h.test:80/x",          # default port -> stripped
    "https://h.test:443/",         # default port -> stripped
    "http://127.0.0.1/path",
    "http://localhost/x",
    "http://h.test/deep/ly/nested/path.html",
]

SLOW_EXPECTED = [
    "http://H.test/x",             # uppercase host
    "HTTP://h.test/x",             # uppercase scheme
    "http://h.test/x?q=1",         # query
    "http://h.test/a/../b",        # dot segments
    "http://h.test/a/./b",
    "http://h.test/a//b",          # empty segment
    "http://h.test/%7Euser",       # percent escape
    "http://h.test",               # no path
    "http://h.test./x",            # trailing-dot host
    "http://-h.test/x",            # bad label
    "http://h.test:080/x",         # leading-zero port
    "http://h.test:0/x",
    "http://user@h.test/x",        # userinfo
    "//h.test/x",                  # protocol-relative
    "relative/path",
    "/rooted/path",
    "ur34nfie4985:s////dsf/",      # junk
    "http://bücher.test/x",   # IDN
    "ftp://h.test/x",              # unsupported scheme prefix shape
    "",
    "http://h.test/sp ace",        # whitespace
    "http://h.test/x#frag",        # fragment
]


def _batch(urls):
    n = len(urls)
    return pd.DataFrame({
        "raw_url": urls,
        "referrer_id": range(n),
        "pos": [0] * n,
        "referrer_url": ["http://h0.test/p/0"] * n,
        "referrer_depth": [2] * n,
        "is_seed_chain": [i % 7 == 0 for i in range(n)],
        "skip_depth_gate": [i % 5 == 0 for i in range(n)],
        "weight": [1] * n,
        "referrer_item": [None] * n,
    })


def _run(cfg, pdf):
    proc = make_candidate_processor(cfg, [], "h0.test")
    out = pd.concat(list(proc(iter([pdf.copy()]))), ignore_index=True)
    return out.where(pd.notna(out), None)


@pytest.mark.parametrize("kw", [
    dict(filter_by_domain=False),
    dict(filter_by_domain=True, scan_subdomains=True),
    dict(filter_by_domain=False, max_depth=2),
])
def test_fastpath_equals_slowpath(kw):
    urls = FAST_EXPECTED + SLOW_EXPECTED
    pdf = _batch(urls)
    fast_cfg = CrawlerConfig(initial_url="http://h0.test/p/0",
                             respect_robots_txt=False, **kw)
    # a pass-through fetch condition forces every row down the slow path
    # without changing any verdict
    slow_cfg = CrawlerConfig(initial_url="http://h0.test/p/0",
                             respect_robots_txt=False,
                             fetch_conditions=[lambda item, row: True], **kw)
    a = _run(fast_cfg, pdf)
    b = _run(slow_cfg, pdf)
    for col in ("url", "protocol", "host", "port", "path", "uri_path",
                "depth", "reject_reason"):
        assert list(a[col]) == list(b[col]), col


def test_fast_classification():
    for u in FAST_EXPECTED:
        assert FAST_URL_RE.match(u), u
    for u in SLOW_EXPECTED:
        m = FAST_URL_RE.match(u)
        # a few slow URLs match the regex but are excluded by the secondary
        # dot-segment / empty-segment checks applied in the kernel
        if m:
            assert ("/./" in u or "/../" in u or "//" in m.group(4)), u


def test_clean_expand_fastpath_equivalence(monkeypatch):
    """clean_expand_resources with the canonical-absolute fast path must be
    byte-identical to the forced-slow Uri round-trip on every shape — the
    fast accepts AND the residue — including attribute fluff that clean_url
    strips before the fast check."""
    from simplecrawler_spark.functions.decode import protocol_supported
    from simplecrawler_spark.functions import discovery

    matches = (
        # fast shapes (post-clean_url canonical absolutes)
        [' href="http://h0.test/p/1"',
         " src='https://a.b.c.example/x_y-z.~stuff'",
         "http://h.test/deep/ly/nested/path.html",
         ' href="http://127.0.0.1/path"']
        # slow residue (everything the fast regex must reject)
        + [f" href=\"{u}\"" for u in SLOW_EXPECTED if u]
        + ["http://h.test:80/x",      # default port: slow (normalize strips)
           "http://h.test:8080/x",    # explicit port: slow by design
           "rel/a.html", "../up", "/rooted", "page?x=1"])

    def run():
        return discovery.clean_expand_resources(
            matches, "http://base.test/dir/page.html", "http",
            protocol_supported)

    fast = run()
    monkeypatch.setenv("SPARK_GRAFT_DISABLE_FASTPATH", "1")
    slow = run()
    assert fast == slow
    assert "http://h0.test/p/1" in fast        # fast shape survived
    assert "http://base.test/dir/rel/a.html" in fast  # relative resolved
