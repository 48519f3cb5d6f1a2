"""URL / domain kernels shared by the distributed stages and the simulator.

Semantics mirror the reference's use of ``url::Url`` via crusty-core's
``Link::new`` (relative resolution against the task's base,
``workspace/main/src/parsers/lolhtml.rs:25-37``) and the domain filter-map
(``workspace/main/src/crusty.rs:250-274``) / normalizer
(``workspace/main/src/rules.rs:28-34``).
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urljoin, urlsplit, urlunsplit

import re as _re

from .tld import DEFAULT_TLD_SET

# "." or ".." as a full path segment — urljoin applies RFC dot-segment
# removal to these; the fast paths must defer them
_DOT_SEGMENT = _re.compile(r"(^|/)\.{1,2}(/|$)")


def host_of(url: str) -> Optional[str]:
    """Lowercased host of an absolute URL, or None."""
    c = _split_canonical(url)
    if c is not None:
        return c[1]
    try:
        h = urlsplit(url).hostname
    except ValueError:
        return None
    return h.lower() if h else None


def normalize_url(url: str) -> str:
    """Canonical form: lowercase scheme+host, drop fragment, default path '/'.

    The reference relies on the WHATWG normalization done inside ``url::Url``;
    this is the subset our synthetic web exercises. Already-canonical URLs
    take a string fast path (equivalence fuzz-tested next to resolve_link's).
    """
    c = _split_canonical(url)
    if c is not None:
        scheme, host, path = c
        return f"{scheme}://{host}{path or '/'}"
    try:
        # .hostname/.port are LAZY properties — a malformed authority (e.g.
        # "//::") raises at access time, so they must be inside the try
        # (pre-r2 bug found by the equivalence fuzz: a crafted href could
        # crash the fetch stage)
        s = urlsplit(url)
        scheme = (s.scheme or "http").lower()
        host = (s.hostname or "").lower()
        port = f":{s.port}" if s.port else ""
        path = s.path or "/"
        query = s.query
    except ValueError:
        return url
    return urlunsplit((scheme, host + port, path, query, ""))


def _split_canonical(url: str):
    """(scheme, host, path) for an already-canonical http(s) URL — host
    lowercase, no userinfo/port/query/fragment — else None (slow path)."""
    if url.startswith("http://"):
        scheme, rest = "http", url[7:]
    elif url.startswith("https://"):
        scheme, rest = "https", url[8:]
    else:
        return None
    slash = rest.find("/")
    host, path = (rest, "") if slash < 0 else (rest[:slash], rest[slash:])
    if (not host or "@" in host or ":" in host or "[" in host
            or "]" in host or host != host.lower()):
        return None
    # urllib strips \t\r\n anywhere and treats ?/# specially — defer those
    # (chained `in` is memchr-speed; a generator-any here profiled hot)
    if ("?" in url or "#" in url or "\t" in url or "\r" in url
            or "\n" in url or " " in url):
        return None
    return scheme, host, path


def resolve_link(base_url: str, href: str) -> Optional[str]:
    """Resolve ``href`` against the page URL (Link::new base resolution,
    parsers/lolhtml.rs:33). Only http(s) results survive.

    Hot path of the fetch stage (profiled: urllib's urljoin/urlparse were
    ~60% of per-page compute). Canonical-shape URLs take a string fast path
    proven equivalent to the urljoin reference by
    ``tests/test_core.py::test_resolve_link_fast_path_equivalence``; anything
    unusual (ports, userinfo, queries, dot segments, protocol-relative)
    falls back to urljoin."""
    href = href.strip()
    if not href or href.startswith(("#", "javascript:", "mailto:", "data:")):
        return None
    if href.startswith(("http://", "https://")):
        # urljoin routes even absolute hrefs through urlparse/urlunparse,
        # which silently drops a trailing ';' (empty params) from the last
        # path segment — defer those to the slow path
        if ";" in href:
            return _resolve_link_slow(base_url, href)
        c = _split_canonical(href)
        if c is not None:
            scheme, host, path = c
            return f"{scheme}://{host}{path or '/'}"
        return _resolve_link_slow(base_url, href)
    if (":" not in href.partition("/")[0]
            and "?" not in href and "#" not in href and "\t" not in href
            and "\r" not in href and "\n" not in href and " " not in href
            and ";" not in href
            and not _DOT_SEGMENT.search(href)
            and not href.startswith("//")):
        b = _split_canonical(base_url)
        if b is not None:
            scheme, host, bpath = b
            if href.startswith("/"):
                # root-relative: urljoin removes dot segments (guarded
                # above) but preserves empty ("//") segments here
                return f"{scheme}://{host}{href}"
            if ("//" not in href and "//" not in bpath
                    # urljoin's segment merge dot-normalizes the BASE path
                    # too; such bases reach the crawl via absolute hrefs
                    # that _split_canonical passes verbatim
                    and not _DOT_SEGMENT.search(bpath)):
                # bare-relative goes through urljoin's segment merge, which
                # collapses empty segments — defer those to the slow path
                base_dir = (bpath[: bpath.rfind("/") + 1]
                            if "/" in bpath else "/")
                return f"{scheme}://{host}{base_dir}{href}"
    return _resolve_link_slow(base_url, href)


def _resolve_link_slow(base_url: str, href: str) -> Optional[str]:
    """The urljoin reference path (also the fast path's test oracle)."""
    try:
        absu = urljoin(base_url, href)
    except ValueError:
        return None
    if not absu.startswith(("http://", "https://")):
        return None
    return normalize_url(absu)


def domain_filter(domain: Optional[str], task_domain: str, tlds=DEFAULT_TLD_SET) -> bool:
    """The discovery filter-map predicate (crusty.rs:250-262):

    keep iff len>=4, contains '.', differs from the crawling job's domain, and
    the uppercased last label is an IANA TLD.
    """
    if not domain or len(domain) < 4 or "." not in domain or domain == task_domain:
        return False
    return domain.rpartition(".")[2].upper() in tlds


def transform_domain(domain: str, second_level_only: bool = False) -> str:
    """Top-k normalizer (rules.rs:28-34): reduce to second-level domain when
    configured (``topk.collect.second_level_only``), else strip ``www.``."""
    if second_level_only:
        parts = domain.split(".")
        return ".".join(parts[-2:])
    return domain[4:] if domain.startswith("www.") else domain


def same_domain(link_host: str, job_domain: str) -> bool:
    """www-aware same-domain test (crusty-core ``SameDomain::new(false)`` — the
    flag keeps www/non-www equivalent, rules.rs:63)."""
    def strip(d: str) -> str:
        return d[4:] if d.startswith("www.") else d
    return strip(link_host) == strip(job_domain)
