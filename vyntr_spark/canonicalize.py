"""URL canonicalization with Rust ``url``-crate (WHATWG) parity semantics.

Reference behavior being reproduced (NOT ported — re-specified):
  * ``normalize_url``: ``Url::parse(url)`` falling back to
    ``Url::parse("http://" + url)``, then serialize
    (genesis/src/utils.rs:5-8).
  * link resolution: ``base_url.join(href)`` + ``set_fragment(None)``
    (genesis/src/html_parser.rs:39-47).
  * domain extraction: parsed ``host_str`` or error
    (genesis/src/crawler.rs:51-55).

WHATWG serialization subset implemented (documented contract — the
synthetic-web generator, the sequential oracle, and the Spark engine all
share this single implementation, so parity is exact and testable):
  * scheme lowercased; host lowercased + IDNA (punycode) encoded;
  * default ports stripped for special schemes (http 80, https 443,
    ws 80, wss 443, ftp 21);
  * empty path becomes "/" for special schemes; dot segments resolved;
  * path/query percent-encoding per the WHATWG path/query encode sets,
    existing percent-triplets preserved (no double encoding — the
    canonicalizer is idempotent, property-tested);
  * userinfo / query / fragment preserved (``normalize_url`` keeps
    fragments; only link extraction strips them);
  * non-special schemes (mailto:, data:, bare "foo:bar") are kept
    opaque: scheme lowercased, remainder verbatim.

Pure Python (stdlib only) so it can run inside Arrow-vectorized pandas
UDFs without imports beyond the distributed package.
"""

from __future__ import annotations

from urllib.parse import urljoin as _rfc_urljoin
from urllib.parse import urlsplit

SPECIAL_SCHEMES: dict[str, int | None] = {
    "http": 80,
    "https": 443,
    "ws": 80,
    "wss": 443,
    "ftp": 21,
    "file": None,
}

_C0_AND_SPACE = "".join(chr(c) for c in range(0x21)) + "\x7f"
_PRINTABLE = set(chr(c) for c in range(0x21, 0x7F))
# WHATWG path percent-encode set: C0, space, '"', '#', '<', '>', '?',
# '`', '{', '}' (backslash is converted to '/' beforehand).
_PATH_UNENCODED = _PRINTABLE - set('"#<>?`{}')
# WHATWG special-scheme query percent-encode set: C0, space, '"', '#',
# '<', '>', "'".
_QUERY_UNENCODED = _PRINTABLE - set("\"#<>'")
# WHATWG fragment percent-encode set: C0, space, '"', '<', '>', '`'.
_FRAGMENT_UNENCODED = _PRINTABLE - set('"<>`')
# WHATWG forbidden host code points (subset relevant post-split).
_FORBIDDEN_HOST = set("\x00\t\n\r #%/:<>?@[\\]^|") | {chr(c) for c in range(0x20)}


class UrlError(ValueError):
    """Raised when a URL cannot be parsed/canonicalized."""


def _unencoded_probe(unencoded: set[str]):
    """One C-level regex search replaces the per-char Python loop on the
    overwhelmingly common nothing-to-encode string."""
    import re as _re

    return _re.compile("[^" + _re.escape("".join(sorted(unencoded))) + "]")


def _pct_encode(s: str, unencoded: set[str]) -> str:
    probe = _ENC_PROBES.get(id(unencoded))
    if probe is not None and not probe.search(s):
        return s
    out = []
    for ch in s:
        if ch in unencoded:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


_ENC_PROBES = {
    id(_PATH_UNENCODED): _unencoded_probe(_PATH_UNENCODED),
    id(_QUERY_UNENCODED): _unencoded_probe(_QUERY_UNENCODED),
    id(_FRAGMENT_UNENCODED): _unencoded_probe(_FRAGMENT_UNENCODED),
}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 dot-segment removal."""
    if "." not in path:
        # no dot anywhere -> no ./ ../ /./ /../ /. /.. segment exists and
        # the loop below would re-join the segments verbatim
        return path
    output: list[str] = []
    buf = path
    while buf:
        if buf.startswith("../"):
            buf = buf[3:]
        elif buf.startswith("./"):
            buf = buf[2:]
        elif buf.startswith("/./"):
            buf = "/" + buf[3:]
        elif buf == "/.":
            buf = "/"
        elif buf.startswith("/../"):
            buf = "/" + buf[4:]
            if output:
                output.pop()
        elif buf == "/..":
            buf = "/"
            if output:
                output.pop()
        elif buf in (".", ".."):
            buf = ""
        else:
            i = buf.find("/", 1) if buf.startswith("/") else buf.find("/")
            if i == -1:
                output.append(buf)
                buf = ""
            else:
                output.append(buf[:i])
                buf = buf[i:]
    return "".join(output)


_FORBIDDEN_HOST_RE = None  # built lazily (needs _FORBIDDEN_HOST above)
#: successful host canonicalizations, memoized: a crawl calls this for
#: every resolved link but the host DIMENSION is tiny (|hosts| ≪ |urls|),
#: so the per-char validation scans collapse to one dict hit. Failures
#: are not cached (they re-raise identically on recompute).
_IDNA_CACHE: dict[str, str] = {}
_IDNA_CACHE_MAX = 1 << 16


def _idna_host(host: str) -> str:
    host = host.lower()
    hit = _IDNA_CACHE.get(host)
    if hit is not None:
        return hit
    if host.startswith("["):  # IPv6 literal, validated by urlsplit
        return host
    global _FORBIDDEN_HOST_RE
    if _FORBIDDEN_HOST_RE is None:
        import re as _re

        _FORBIDDEN_HOST_RE = _re.compile(
            "[" + _re.escape("".join(sorted(_FORBIDDEN_HOST))) + "]"
        )
    if _FORBIDDEN_HOST_RE.search(host):
        raise UrlError(f"forbidden host code point in {host!r}")
    if host.isascii():
        if len(_IDNA_CACHE) >= _IDNA_CACHE_MAX:
            _IDNA_CACHE.clear()
        _IDNA_CACHE[host] = host
        return host
    labels = host.split(".")
    encoded = []
    for label in labels:
        if not label or all(ord(c) < 0x80 for c in label):
            encoded.append(label)
        else:
            try:
                encoded.append(label.encode("idna").decode("ascii"))
            except UnicodeError as e:
                raise UrlError(f"invalid IDNA label: {label!r}") from e
    result = ".".join(encoded)
    # IDNA nameprep can map exotic code points into forbidden ones
    if not result or any(c in _FORBIDDEN_HOST or ord(c) >= 0x80 for c in result):
        raise UrlError(f"invalid host after IDNA: {host!r}")
    if len(_IDNA_CACHE) >= _IDNA_CACHE_MAX:
        _IDNA_CACHE.clear()
    _IDNA_CACHE[host] = result
    return result


def _split_netloc(netloc: str) -> tuple[str, str, str | None]:
    """Return (userinfo_with_at, host, port_str_or_None)."""
    userinfo = ""
    hostport = netloc
    if "@" in netloc:
        ui, hostport = netloc.rsplit("@", 1)
        userinfo = ui + "@"
    if hostport.startswith("["):  # IPv6
        close = hostport.find("]")
        if close == -1:
            raise UrlError(f"unclosed IPv6 host in {netloc!r}")
        host = hostport[: close + 1].lower()
        rest = hostport[close + 1 :]
        if rest.startswith(":"):
            return userinfo, host, rest[1:]
        if rest:
            raise UrlError(f"garbage after IPv6 host in {netloc!r}")
        return userinfo, host, None
    if ":" in hostport:
        host, port = hostport.rsplit(":", 1)
        return userinfo, host, port
    return userinfo, hostport, None


_SCHEME_ASCII_RE = None


def _looks_like_scheme(url: str) -> bool:
    i = url.find(":")
    if i <= 0:
        return False
    head = url[:i]
    if head.isascii():
        # C-speed twin of the loop below for the ~always case; for
        # ASCII, str.isalpha/isalnum reduce to exactly these classes
        global _SCHEME_ASCII_RE
        if _SCHEME_ASCII_RE is None:
            import re as _re

            _SCHEME_ASCII_RE = _re.compile(r"[A-Za-z][A-Za-z0-9+.\-]*\Z")
        return _SCHEME_ASCII_RE.match(head) is not None
    if not head[0].isalpha():
        return False
    return all(c.isalnum() or c in "+-." for c in head)


# Already-canonical fast path: one C-level regex accepting exactly the
# http(s) URLs the full pipeline below returns UNCHANGED — lowercase
# scheme, lowercase ASCII host with no userinfo/port/IPv6, a present
# path with no backslash and no dot SEGMENT (any "/." substring falls
# through, which covers "/./", "/../" and trailing "/."/".."), path and
# query drawn from the SAME unencoded sets _pct_encode uses (so the
# classes can never drift from the encoder), and no fragment. Everything
# else takes the full parse; equivalence is differential-fuzzed in
# tests/test_canonicalize.py.
_CANON_FAST_RE = None


def _canon_fast_re():
    import re as _re

    path_cls = _re.escape("".join(sorted(_PATH_UNENCODED - {"\\"})))
    query_cls = _re.escape("".join(sorted(_QUERY_UNENCODED)))
    return _re.compile(
        "\\A(?:http|https)://"
        "[a-z0-9](?:[a-z0-9.\\-]*[a-z0-9])?"
        "(?!.*/\\.)"                      # no dot segment anywhere
        "/[" + path_cls + "]*"
        "(?:\\?[" + query_cls + "]*)?\\Z"
    )


def canonicalize(url: str) -> str:
    """``Url::parse(url).to_string()`` analog. Raises UrlError."""
    global _CANON_FAST_RE
    if _CANON_FAST_RE is None:
        _CANON_FAST_RE = _canon_fast_re()
    if _CANON_FAST_RE.match(url):
        return url
    s = url.strip(_C0_AND_SPACE).replace("\t", "").replace("\n", "").replace("\r", "")
    if not _looks_like_scheme(s):
        raise UrlError(f"relative URL without a base: {url!r}")
    scheme, rest = s.split(":", 1)
    scheme = scheme.lower()
    if scheme not in SPECIAL_SCHEMES:
        # Opaque non-special URL: keep remainder verbatim.
        return f"{scheme}:{rest}"

    try:
        parts = urlsplit(s, allow_fragments=True)
    except ValueError as e:
        raise UrlError(f"unparseable URL: {url!r}") from e
    netloc = parts.netloc
    if not netloc:
        raise UrlError(f"special scheme with empty host: {url!r}")
    userinfo, host, port = _split_netloc(netloc)
    if not host:
        raise UrlError(f"empty host: {url!r}")
    host = _idna_host(host)

    default = SPECIAL_SCHEMES[scheme]
    port_out = ""
    if port not in (None, ""):
        try:
            pnum = int(port)
        except ValueError as e:
            raise UrlError(f"invalid port in {url!r}") from e
        if pnum != default:
            port_out = f":{pnum}"

    path = parts.path.replace("\\", "/")
    if not path:
        path = "/"
    elif not path.startswith("/"):
        path = "/" + path
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    path = _pct_encode(path, _PATH_UNENCODED)

    out = f"{scheme}://{userinfo}{host}{port_out}{path}"
    # urlsplit drops the '?' / '#' separators; reconstruct presence.
    body = s.split("#", 1)[0]
    if "?" in body:
        out += "?" + _pct_encode(parts.query, _QUERY_UNENCODED)
    if "#" in s:
        out += "#" + _pct_encode(parts.fragment, _FRAGMENT_UNENCODED)
    return out


def normalize_url(url: str) -> str:
    """genesis/src/utils.rs:5-8 parity: parse, else parse('http://'+url)."""
    try:
        return canonicalize(url)
    except UrlError:
        return canonicalize("http://" + url)


def join_url(base: str, href: str) -> str:
    """``base.join(href)`` analog (RFC 3986 resolution + canonicalize)."""
    if _looks_like_scheme(href):
        scheme = href.split(":", 1)[0].lower()
        rest = href.split(":", 1)[1]
        if scheme not in SPECIAL_SCHEMES or rest.startswith("//"):
            # absolute-authority (or opaque) href: WHATWG parses it alone;
            # "http://" with empty host is an error (link skipped), unlike
            # urljoin's legacy fall-back-to-base behavior.
            return canonicalize(href)
        # "http:foo" with a matching special base scheme resolves relative
    try:
        joined = _rfc_urljoin(base, href)
    except ValueError as e:
        raise UrlError(f"unjoinable href: {href!r}") from e
    return canonicalize(joined)


def strip_fragment(url: str) -> str:
    return url.split("#", 1)[0]


def extract_domain(url: str) -> str:
    """genesis/src/crawler.rs:51-55 parity: host or error."""
    s = canonicalize(url)
    scheme = s.split(":", 1)[0]
    if scheme not in SPECIAL_SCHEMES:
        raise UrlError(f"URL has no host: {url!r}")
    parts = urlsplit(s)
    _, host, _ = _split_netloc(parts.netloc)
    if not host:
        raise UrlError(f"URL has no host: {url!r}")
    return host


def try_normalize(url: str) -> str | None:
    try:
        return normalize_url(url)
    except UrlError:
        return None


def try_domain(url: str) -> str | None:
    try:
        return extract_domain(url)
    except UrlError:
        return None
