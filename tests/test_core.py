"""Unit tests for sharding / URL / TLD kernels (SURVEY.md §5 layer 1).

Vectors mirror the reference's semantics at types.rs:22-55 and
crusty.rs:250-274.
"""

import base64
import zlib

import numpy as np

from crusty_ray.core import sharding, tld, urls
from crusty_ray.core.hashing import fingerprint64, hash64, hash64_batch, stable_rng


class TestSelectAddr:
    def test_v4_sorted_first(self):
        # v4 and v6 sorted separately; fallback policy picks v4 first
        addrs = ["10.0.0.5:80", "10.0.0.2:80", "[2001:db8::1]:80"]
        assert sharding.select_addr(addrs) == "10.0.0.2:80"

    def test_v6_preferred(self):
        addrs = ["10.0.0.5:80", "[2001:db8::2]:80", "[2001:db8::1]:80"]
        assert sharding.select_addr(addrs, sharding.IPV6_PREFERRED) == "[2001:db8::1]:80"

    def test_v6_disabled(self):
        assert sharding.select_addr(["[2001:db8::1]:80"], sharding.IPV6_DISABLED) is None

    def test_fallback_to_v6(self):
        assert sharding.select_addr(["[2001:db8::1]:80"]) == "[2001:db8::1]:80"

    def test_numeric_sort_not_lexicographic(self):
        # 10.0.0.10 > 10.0.0.9 numerically even though "10" < "9" as strings
        assert sharding.select_addr(["10.0.0.10:80", "10.0.0.9:80"]) == "10.0.0.9:80"


class TestAddrKey:
    def test_v4_mask_24(self):
        # /24: last octet masked off → same politeness group
        k1 = sharding.addr_key("192.168.1.7:80")
        k2 = sharding.addr_key("192.168.1.250:8080")
        assert k1 == k2
        assert base64.b64decode(k1) == bytes([192, 168, 1, 0])

    def test_v4_different_subnet(self):
        assert sharding.addr_key("192.168.1.7:80") != sharding.addr_key("192.168.2.7:80")

    def test_v6_mask(self):
        k = sharding.addr_key("[2001:db8::1]:80", v6_mask=24)
        raw = base64.b64decode(k)
        assert len(raw) == 16 and raw[3:] == bytes(13)

    def test_shard_is_crc32_mod(self):
        key = sharding.addr_key("10.1.2.3:80")
        assert sharding.shard_of_addr_key(key, 7) == zlib.crc32(key.encode()) % 7

    def test_vectorized_matches_scalar(self):
        keys = [sharding.addr_key(f"10.{i}.{i}.1:80") for i in range(50)]
        vec = sharding.shard_of_addr_keys(keys, 8)
        assert list(vec) == [sharding.shard_of_addr_key(k, 8) for k in keys]

    def test_resolve_domain_row(self):
        sel, key, shard = sharding.resolve_domain_row(["10.0.0.2:80", "10.0.0.1:80"], 4)
        assert sel == "10.0.0.1:80"
        assert shard == sharding.shard_of_addr_key(key, 4)
        assert sharding.resolve_domain_row([], 4) is None
        assert sharding.resolve_domain_row(None, 4) is None


class TestUrls:
    def test_host_and_normalize(self):
        assert urls.host_of("http://Example.COM/a") == "example.com"
        assert urls.normalize_url("HTTP://Example.com") == "http://example.com/"
        assert urls.normalize_url("http://a.com/x#frag") == "http://a.com/x"

    def test_resolve_relative(self):
        assert urls.resolve_link("http://a.com/dir/page", "../x") == "http://a.com/x"
        assert urls.resolve_link("http://a.com/", "b.html") == "http://a.com/b.html"
        assert urls.resolve_link("http://a.com/", "https://b.org/z") == "https://b.org/z"
        assert urls.resolve_link("http://a.com/", "#anchor") is None
        assert urls.resolve_link("http://a.com/", "mailto:x@y.z") is None

    def test_domain_filter(self):
        # crusty.rs:250-262: len>=4, has dot, != task domain, valid TLD
        assert urls.domain_filter("example.com", "other.com")
        assert not urls.domain_filter("a.b", "other.com")      # len < 4
        assert not urls.domain_filter("localhost", "other.com")  # no dot
        assert not urls.domain_filter("other.com", "other.com")  # same
        assert not urls.domain_filter("site.invalidtld", "other.com")
        assert not urls.domain_filter(None, "other.com")

    def test_transform_domain(self):
        assert urls.transform_domain("www.example.com") == "example.com"
        assert urls.transform_domain("a.b.example.com", second_level_only=True) == "example.com"
        assert urls.transform_domain("sub.example.com") == "sub.example.com"

    def test_same_domain_www_aware(self):
        assert urls.same_domain("www.a.com", "a.com")
        assert urls.same_domain("a.com", "www.a.com")
        assert not urls.same_domain("b.a.com", "a.com")


class TestTld:
    def test_mask(self):
        doms = np.array(["a.com", "b.xx-notatld", "c.de", "d.io"])
        mask = tld.valid_tld_mask(doms)
        assert list(mask) == [True, False, True, True]


class TestHashing:
    def test_stability(self):
        assert hash64("abc") == hash64("abc")
        assert hash64("abc", 1) != hash64("abc", 2)
        assert list(hash64_batch(["a", "b"])) == [hash64("a"), hash64("b")]

    def test_fingerprint_stable(self):
        assert fingerprint64("x") == fingerprint64("x")

    def test_stable_rng(self):
        a = stable_rng("k", 1).integers(0, 1 << 30, 5)
        b = stable_rng("k", 1).integers(0, 1 << 30, 5)
        c = stable_rng("k", 2).integers(0, 1 << 30, 5)
        assert list(a) == list(b)
        assert list(a) != list(c)


def test_resolve_link_fast_path_equivalence():
    """The string fast paths in resolve_link must agree exactly with the
    urljoin reference (_resolve_link_slow) — fuzzed over URL-ish shapes plus
    every href the synthetic web actually emits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from crusty_ray.core.urls import _resolve_link_slow, resolve_link

    seg = st.text(alphabet="abcdefgz019.-_~%/:?#@; \t", min_size=0,
                  max_size=12)
    # generated bases too (r2 ADVICE: fixed-base fuzz missed dot-segment
    # bases like http://h/./x, which enter via absolute hrefs)
    bhost = st.text(alphabet="abz01.-w", min_size=1, max_size=8)
    bpath = st.text(alphabet="abz01./:%;~.", min_size=0, max_size=12)
    genbase = st.builds(lambda h, p: f"http://{h}/{p}", bhost, bpath)
    base = st.one_of(
        genbase,
        st.just("http://site00001.net/"),
        st.just("http://a.com/dir/page"),
        st.just("https://www.x.org/a/b/c"),
        st.just("HTTP://UP.com/p"),
        st.just("http://h.com:8080/p"),
        st.just("http://u@h.com/p"),
        st.just("http://h/./x"),
        st.just("http://h/a/../b/c"),
    )

    def reference(base, href):  # the complete pre-fast-path semantics
        href = href.strip()
        if not href or href.startswith(("#", "javascript:", "mailto:", "data:")):
            return None
        return _resolve_link_slow(base, href)

    @settings(max_examples=400, deadline=None)
    @given(base=base, href=seg)
    def fuzz(base, href):
        assert resolve_link(base, href) == reference(base, href)

    fuzz()

    # r2 ADVICE regression cases, pinned explicitly
    assert resolve_link("http://h/./x", "a/b") == "http://h/a/b"
    assert resolve_link("http://a.com/d/", "p;") == "http://a.com/d/p"
    assert resolve_link("http://b.com/", "http://a.com/d/p;") == \
        reference("http://b.com/", "http://a.com/d/p;")

    # normalize_url / host_of fast paths vs their urlsplit reference
    from urllib.parse import urlsplit, urlunsplit
    from crusty_ray.core.urls import host_of, normalize_url

    def norm_ref(url):
        try:
            s = urlsplit(url)
            scheme = (s.scheme or "http").lower()
            host = (s.hostname or "").lower()
            port = f":{s.port}" if s.port else ""
            path, query = s.path or "/", s.query
        except ValueError:  # lazy .hostname/.port raise on malformed input
            return url
        return urlunsplit((scheme, host + port, path, query, ""))

    def host_ref(url):
        try:
            h = urlsplit(url).hostname
        except ValueError:
            return None
        return h.lower() if h else None

    urlish = st.text(alphabet="htps:/abz019.-_~%?#@[] \t", min_size=0,
                     max_size=24)

    @settings(max_examples=400, deadline=None)
    @given(url=st.one_of(urlish, st.just("http://a.com/p"),
                         st.just("https://B.com:80/x?q#f"),
                         st.just("http://]x")))
    def fuzz_norm(url):
        assert normalize_url(url) == norm_ref(url)
        assert host_of(url) == host_ref(url)

    fuzz_norm()

    # plus the real corpus: every RAW href in the first pages of 40 domains
    # (absolute / root-relative / bare-relative mix straight from the HTML)
    import re
    from crusty_ray.datagen.webgraph import SyntheticWeb, WebConfig
    web = SyntheticWeb(WebConfig(n_domains=40, max_pages_per_domain=10))
    checked = 0
    for i in range(40):
        for j in range(4):
            rec = web.page_record(web.page_url(i, j))
            base_url = rec["url"]
            body = (rec.get("body") or b"").decode("utf-8", "replace")
            for href in re.findall(r'href="([^"]*)"', body):
                assert resolve_link(base_url, href) == reference(base_url, href)
                checked += 1
    assert checked > 500
