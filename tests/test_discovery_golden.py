"""Golden link-discovery tests, transliterated from the reference suite
(/root/reference/test/specs/discovery.unit.spec.ts:22-189). Each case
asserts the exact ordered URL list."""

from simplecrawler_spark.functions.decode import protocol_supported
from simplecrawler_spark.functions.discovery import (clean_expand_resources,
                                                     discover_resources)


def discover(text, page_url=None, page_protocol=None, **kw):
    resources = discover_resources(text, **kw)
    return clean_expand_resources(resources, page_url, page_protocol,
                                  protocol_supported)


def test_http_prefixed_urls():
    links = discover("  blah blah http://google.com/ "
                     " blah blah https://fish.com/resource blah "
                     " //example.com")
    assert len(links) == 2
    assert links[0] == "http://google.com/"
    assert links[1] == "https://fish.com/resource"


def test_quoted_attributes():
    links = discover("  <a href='google.com'> "
                     " <img src=\"http://example.com/resource with spaces.txt\"> "
                     " url('thingo.com/test.html')")
    assert len(links) == 4
    assert links[0] == "google.com"
    assert links[1] == "http://example.com/resource%20with%20spaces.txt"
    assert links[2] == "thingo.com/test.html"


def test_unquoted_attributes():
    links = discover("  <a href=google.com> "
                     " <img src=http://example.com/resource with spaces.txt> "
                     " url(thingo.com/test.html)")
    assert len(links) == 3
    assert links[0] == "google.com"
    assert links[1] == "http://example.com/resource"
    assert links[2] == "thingo.com/test.html"


def test_amp_entities():
    links = discover(
        "<a href='http://example.com/resource?with&amp;query=params&amp;and=entities'>")
    assert len(links) == 2
    assert links[0] == "http://example.com/resource?with&query=params&and=entities"
    assert links[1] == "http://example.com/resource"


def test_numeric_amp_entities():
    links = discover(
        "<a href='http://example.com/resource?with&#38;query=params&#x00026;and=entities'>")
    assert len(links) == 2
    assert links[0] == "http://example.com/resource?with&query=params&and=entities"
    assert links[1] == "http://example.com/resource"


def test_slash_entities():
    links = discover("<a href='http:&#x2f;&#x2f;example.com&#x2f;resource'>")
    assert links == ["http://example.com/resource"]


def test_meta_redirects():
    links = discover("<meta http-equiv='refresh' content='0; url=/my/other/page.html'>",
                     page_url="http://example.com/")
    assert links == ["http://example.com/my/other/page.html"]


def test_ignore_html_comments():
    links = discover("  <!-- http://example.com/oneline_comment --> "
                     " <a href=google.com> "
                     " <!-- "
                     " http://example.com/resource "
                     " <a href=example.com> "
                     " -->", parse_html_comments=False)
    assert links == ["google.com"]


def test_ignore_script_tags():
    links = discover("  <script>var a = \"<a href='http://example.com/oneline_script'></a>\";</script> "
                     " <a href=google.com> "
                     " <script type='text/javascript'> "
                     " http://example.com/resource "
                     " <a href=example.com> "
                     " </SCRIPT>", parse_script_tags=False)
    assert links == ["google.com"]


def test_urls_ending_with_quote_or_paren():
    links = discover("<a href='example.com/resource?with(parentheses)'>"
                     " <a href='example.com/resource?with\"double quotes\"'>"
                     " <a href=\"example.com/resource?with'single quotes'\">")
    assert len(links) == 3
    assert links[0] == "example.com/resource?with%28parentheses%29"
    assert links[1] == "example.com/resource?with%22double+quotes%22"
    assert links[2] == "example.com/resource?with%27single+quotes%27"


def test_javascript_links():
    links = discover("<a href='javascript:;'>"
                     " <a href='javascript: void(0);'>"
                     " <a href='javascript: goToURL(\"/page/one\")'>",
                     page_url="http://example.com/")
    assert len(links) == 2
    assert links[0] == "http://example.com/"
    assert links[1] == "http://example.com/page/one"


def test_href_src_inside_href():
    links = discover("<a href='https://example.com/?src=3'>My web page</a>")
    assert len(links) == 2
    assert links[0] == "https://example.com/?src=3"
    assert links[1] == "https://example.com/"


def test_fragment_stripping():
    links = discover("<a href='https://example.com/#section'>My web page</a>"
                     "<a href='/other/page#blabla'>Link</a>"
                     "<a href='#section'>Section</a>",
                     page_url="https://example.com/")
    assert len(links) == 2
    assert links[0] == "https://example.com/"
    assert links[1] == "https://example.com/other/page"


def test_srcset():
    links = discover("<img src='pic.png' srcset='https://example.com/pic-200.png, "
                     "/pic-400.png 400w, pic-800.png 2x'>",
                     page_url="https://example.com/")
    assert links == [
        "https://example.com/pic.png",
        "https://example.com/pic-200.png",
        "https://example.com/pic-400.png",
        "https://example.com/pic-800.png",
    ]


def test_nofollow_meta():
    assert discover("<meta name='robots' content='nofollow'>"
                    "<a href='/stage2'>Don't follow me!</a>") == []
    assert discover("<meta name='robots' content='nofollow, noindex'>"
                    "<a href='/stage2'>Don't follow me!</a>") == []
