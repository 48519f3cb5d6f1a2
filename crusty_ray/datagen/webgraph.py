"""The synthetic web as a pure deterministic function.

The reference crawls the real web through crusty-core's HTTP stack; this
sandbox has no network, so the "web" is a seeded pure function:

    page_record(url)   -> full fetch result (status, redirect, body, links…)
    dns_addrs(domain)  -> resolved "ip:port" list (or None: unresolvable)
    robots_body(domain)-> robots.txt text (or None: 404)
    image_record(id)   -> encoded image payload row (input_hint schema)

Because every record derives from ``(seed, key)`` alone, the fetch stage is
**pure compute inside map_batches at any scale** — no lookup table to ship, no
join, no skewed shuffle — and the simulator oracle calls the identical
functions. ``materialize(out_dir)`` writes the FIXTURES.md parquet tables
(`seeds dns pages robots images`) for tests and the DuckDB driver checks.

Graph shape (FIXTURES.md): power-law out-degree, ~30% cross-domain edges,
addr_key collisions via shared /24 subnets, ~2% unresolvable domains, redirect
chains (some > max_redirect), non-HTML content types, robots-disallowed paths,
invalid-TLD / short / no-dot link targets, depth chains, >budget link fanouts.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..codecs.images import encode_image, phash64
from ..core.hashing import stable_rng
from ..core.urls import normalize_url, resolve_link

_TLDS = ["com", "net", "org", "io", "dev", "app"]
_CAPTION_WORDS = (
    "sunset mountain river city bridge forest ocean desert skyline harbor "
    "meadow canyon village lighthouse glacier valley island aurora dune reef"
).split()


@dataclass(frozen=True)
class WebConfig:
    seed: int = 42
    n_domains: int = 120
    max_pages_per_domain: int = 40
    hub_domains: int = 4           # first N domains are link magnets (skew)
    subnet_pair_fraction: float = 0.3   # fraction of domains sharing a /24 with a sibling
    unresolvable_fraction: float = 0.02
    robots_fraction: float = 0.25       # domains with a robots.txt
    disallow_all_fraction: float = 0.04
    images_per_page: int = 2
    image_page_fraction: float = 1.0   # <1.0: only this fraction of pages carry images
    link_lo: int = 2                   # internal links per page ~ U[link_lo, link_hi)
    link_hi: int = 7
    hub_links: int = 30                # links on hub roots (LinkPerPageBudget stress)
    img_min: int = 8
    img_max: int = 48


class SyntheticWeb:
    def __init__(self, cfg: WebConfig = WebConfig()):
        self.cfg = cfg
        self._domains: Optional[list[str]] = None

    # ------------------------------------------------------------------ domains
    def domain_name(self, i: int) -> str:
        tld = _TLDS[i % len(_TLDS)]
        return f"site{i:05d}.{tld}"

    @property
    def domains(self) -> list[str]:
        if self._domains is None:
            self._domains = [self.domain_name(i) for i in range(self.cfg.n_domains)]
        return self._domains

    def domain_index(self, domain: str) -> Optional[int]:
        d = domain[4:] if domain.startswith("www.") else domain
        if not d.startswith("site"):
            return None
        try:
            i = int(d[4:9])
        except ValueError:
            return None
        return i if 0 <= i < self.cfg.n_domains and self.domain_name(i) == d else None

    def n_pages(self, i: int) -> int:
        """Power-law page counts; hubs get the max (exercises TotalPageBudget)."""
        if i < self.cfg.hub_domains:
            return self.cfg.max_pages_per_domain
        r = stable_rng(self.cfg.seed, "npages", i).pareto(1.3)
        return int(np.clip(2 + r * 4, 2, self.cfg.max_pages_per_domain))

    # ------------------------------------------------------------------ dns
    def dns_addrs(self, domain: str) -> Optional[list[str]]:
        i = self.domain_index(domain)
        if i is None:
            return None
        rng = stable_rng(self.cfg.seed, "dns", i)
        if rng.random() < self.cfg.unresolvable_fraction:
            return None
        # subnet pairing: domains 2k/2k+1 in the paired range share a /24
        paired = i < int(self.cfg.n_domains * self.cfg.subnet_pair_fraction)
        sid = (i // 2) if paired else (1000 + i)
        a, b = (sid >> 8) & 0xFF, sid & 0xFF
        host = 1 + (i % 200)
        addrs = [f"10.{a}.{b}.{host}:80"]
        if rng.random() < 0.3:  # extra addr in another subnet (select_addr sorts)
            addrs.append(f"10.{a}.{b}.{host + 1}:80")
        if rng.random() < 0.15:  # occasional v6 (fallback policy ignores if v4 present)
            addrs.append(f"[2001:db8::{i:x}]:80")
        return addrs

    # ------------------------------------------------------------------ robots
    def robots_body(self, domain: str) -> Optional[str]:
        i = self.domain_index(domain)
        if i is None:
            return None
        rng = stable_rng(self.cfg.seed, "robots", i)
        r = rng.random()
        if r < self.cfg.disallow_all_fraction:
            return "User-agent: *\nDisallow: /\n"
        if r >= self.cfg.robots_fraction:
            return None  # 404 — everything allowed
        # the robots'd band splits into four deterministic variants that
        # exercise the full Google-parser semantics (stages/robots.py):
        # plain prefix, * / $ wildcards, Allow longest-match override,
        # and per-agent group selection
        lo, hi = self.cfg.disallow_all_fraction, self.cfg.robots_fraction
        q = (r - lo) / (hi - lo)
        if q < 0.25:
            return "User-agent: *\nDisallow: /private/\n"
        if q < 0.5:
            # wildcard: any path ending in "3" ( /p3, /p13, /private/p3 …)
            return "User-agent: *\nDisallow: /*3$\n"
        if q < 0.75:
            # Allow overrides the shorter Disallow (longest-match wins)
            return ("User-agent: *\nDisallow: /private/\n"
                    "Allow: /private/p3\n")
        # per-agent groups: crusty's own group (selected over *) only
        # blocks the /p1 prefix; the catch-all would have blocked /p
        return ("User-agent: googlebot\nDisallow: /\n\n"
                "User-agent: crusty\nDisallow: /p1\n\n"
                "User-agent: *\nDisallow: /p\n")

    # ------------------------------------------------------------------ pages
    def page_path(self, i: int, j: int) -> str:
        # every 7th page of a robots'd domain sits under the disallowed prefix
        if j % 7 == 3:
            return f"/private/p{j}"
        return f"/p{j}"

    def page_url(self, i: int, j: int) -> str:
        return f"http://{self.domain_name(i)}{self.page_path(i, j)}"

    def root_url(self, domain: str) -> str:
        return f"http://{domain}/"

    def parse_page_url(self, url: str) -> Optional[tuple[int, int]]:
        """url → (domain_idx, page_idx) for URLs inside the synthetic web."""
        u = normalize_url(url)
        if not u.startswith(("http://", "https://")):
            return None
        rest = u.split("://", 1)[1]
        host, _, path = rest.partition("/")
        host = host.split(":")[0]
        i = self.domain_index(host)
        if i is None:
            return None
        path = "/" + path
        if path == "/":
            return (i, 0)  # root maps to page 0
        tail = path.rsplit("p", 1)
        if len(tail) != 2 or not tail[1].isdigit():
            return None
        j = int(tail[1])
        expect = self.page_path(i, j)
        return (i, j) if path == expect and j < self.n_pages(i) else None

    def page_record(self, url: str) -> dict:
        """Full synthetic fetch result for ``url`` — the pure 'HTTP GET'.

        Returns status_code / redirect_to / content_type / fetch_ms / size_b /
        body / out_links(resolved ground truth, parallel rel list) / image_ids.
        Unknown URLs → 404 with empty body.
        """
        parsed = self.parse_page_url(url)
        if parsed is None:
            return _error_page(url, 404)
        i, j = parsed
        rng = stable_rng(self.cfg.seed, "page", i, j)
        roll = rng.random()

        # ---- status: 6% redirect chains, 3% client/server errors
        if roll < 0.06:
            # redirect chain along consecutive page indices; every chain from a
            # j divisible by 31 is long (> max_redirect when followed)
            nxt = self.page_url(i, (j + 1) % self.n_pages(i))
            code = 301 if rng.random() < 0.5 else 302
            return {
                "url": normalize_url(url), "domain": self.domain_name(i),
                "status_code": code, "redirect_to": nxt, "content_type": "text/html",
                "fetch_ms": int(rng.integers(5, 80)), "size_b": 0, "body": b"",
                "out_links": [], "out_rels": [], "image_ids": [],
            }
        if roll < 0.09:
            return _error_page(url, int(rng.choice([404, 500, 503])),
                               domain=self.domain_name(i))

        # ---- content type: 4% text/plain, 2% image/jpeg (filtered at load)
        ct = "text/html"
        r2 = rng.random()
        if r2 < 0.04:
            ct = "text/plain"
        elif r2 < 0.06:
            ct = "image/jpeg"

        # ---- links
        npages = self.n_pages(i)
        n_int = int(rng.integers(self.cfg.link_lo, self.cfg.link_hi))
        # hubs link to MANY pages → exercises LinkPerPageBudget at low budgets
        if i < self.cfg.hub_domains and j == 0:
            n_int = min(npages, self.cfg.hub_links)
        int_targets = sorted(set(int(x) for x in rng.integers(0, npages, n_int)) - {j})
        n_ext = int(rng.integers(0, 4)) if rng.random() < 0.5 else int(rng.integers(0, 2))
        # zipf-ish external target selection → hot hub domains (skew)
        ext_targets = []
        for _ in range(n_ext):
            z = rng.zipf(1.6)
            ext_targets.append(int(z - 1) % self.cfg.n_domains)

        hrefs: list[str] = []
        rels: list[str] = []
        for k, tj in enumerate(int_targets):
            # mix of absolute / root-relative / relative hrefs
            style = int(rng.integers(0, 3))
            path = self.page_path(i, tj)
            if style == 0:
                hrefs.append(self.page_url(i, tj))
            elif style == 1:
                hrefs.append(path)
            else:
                hrefs.append(path.lstrip("/"))
            rels.append("nofollow" if rng.random() < 0.12 else "")
        for ti in ext_targets:
            dom = self.domain_name(ti)
            if rng.random() < 0.2:
                dom = "www." + dom
            hrefs.append(f"http://{dom}/")
            rels.append("nofollow" if rng.random() < 0.08 else "")
        # junk targets exercising the discovery filter-map (crusty.rs:250-262)
        jr = rng.random()
        if jr < 0.15:
            hrefs.append("http://x.y/")            # too short
            rels.append("")
        elif jr < 0.25:
            hrefs.append("http://badhost/")        # no dot
            rels.append("")
        elif jr < 0.35:
            hrefs.append("http://site.notatld/")   # invalid TLD
            rels.append("")

        base = normalize_url(url)
        out_links, out_rels = [], []
        for href, rel in zip(hrefs, rels):
            res = resolve_link(base, href)
            if res is not None:
                out_links.append(res)
                out_rels.append(rel)

        if self.cfg.image_page_fraction >= 1.0:
            n_img = int(rng.integers(0, self.cfg.images_per_page + 1))
        else:  # extra draw only on the non-default path (keeps default streams)
            n_img = (int(rng.integers(1, self.cfg.images_per_page + 1))
                     if rng.random() < self.cfg.image_page_fraction else 0)
        image_ids = [f"im{i}_{j}_{k}" for k in range(n_img)]
        body = self._render_html(i, j, hrefs, rels, image_ids, rng)
        return {
            "url": base, "domain": self.domain_name(i), "status_code": 200,
            "redirect_to": None, "content_type": ct,
            "fetch_ms": int(rng.integers(5, 120)), "size_b": len(body),
            "body": body, "out_links": out_links, "out_rels": out_rels,
            "image_ids": image_ids,
        }

    def _render_html(self, i: int, j: int, hrefs, rels, image_ids, rng) -> bytes:
        parts = [f"<!doctype html><html><head><title>site{i} page {j}</title>"]
        parts.append('<meta charset="utf-8"></head><body>')
        if rng.random() < 0.2:
            parts.append("<p>unclosed paragraph<div><span>malformed")
        for href, rel in zip(hrefs, rels):
            attrs = f' rel="{rel}"' if rel else ""
            alt = f' alt="link{j}"' if rng.random() < 0.1 else ""
            parts.append(f'<a href="{href}"{attrs}{alt}>anchor {href[:20]}</a>')
        for img in image_ids:
            parts.append(f'<img src="/img/{img}.bin">')
        parts.append(f"<p>filler {'x' * int(rng.integers(0, 512))}</p></body></html>")
        return "".join(parts).encode("utf-8")

    # ------------------------------------------------------------------ images
    def image_pixels_raw(self, image_id: str) -> tuple[np.ndarray, str, str]:
        """(original pixels, fmt, caption) — the generation step alone."""
        rng = stable_rng(self.cfg.seed, "image", image_id)
        w = int(rng.integers(self.cfg.img_min, self.cfg.img_max + 1))
        h = int(rng.integers(self.cfg.img_min, self.cfg.img_max + 1))
        yy, xx = np.mgrid[0:h, 0:w]
        f1, f2 = rng.uniform(0.05, 0.5, 2)
        base = (
            np.stack([
                127 + 120 * np.sin(f1 * xx + rng.uniform(0, 6)),
                127 + 120 * np.cos(f2 * yy + rng.uniform(0, 6)),
                (xx * 255 / max(1, w - 1) + yy * 255 / max(1, h - 1)) / 2,
            ], axis=-1)
        )
        noise = rng.normal(0, 12, (h, w, 3))
        pixels = np.clip(base + noise, 0, 255).astype(np.uint8)
        fmt = ["png", "jpeg", "webp"][int(rng.integers(0, 3))]
        cap_words = rng.choice(_CAPTION_WORDS, size=int(rng.integers(3, 8)), replace=True)
        caption = f"a photo of {' '.join(cap_words)} ({image_id})"
        return pixels, fmt, caption

    def image_record(self, image_id: str) -> dict:
        """input_hint row: (image_id, bytes, w, h, fmt, caption, phash)."""
        pixels, fmt, caption = self.image_pixels_raw(image_id)
        h, w = pixels.shape[:2]
        return {
            "image_id": image_id, "bytes": encode_image(pixels, fmt),
            "w": w, "h": h, "fmt": fmt, "caption": caption,
            "phash": phash64(pixels),
        }

    def image_pixels(self, image_id: str) -> np.ndarray:
        rec = self.image_record(image_id)
        from ..codecs.images import decode_image
        return decode_image(rec["bytes"], rec["fmt"])

    # ------------------------------------------------------------------ seeds
    def seeds(self, n: int = 5) -> list[str]:
        """Deterministic seed list: hub roots plus a couple of mid domains."""
        idxs = list(range(min(self.cfg.hub_domains, n)))
        k = self.cfg.hub_domains
        while len(idxs) < n and k < self.cfg.n_domains:
            idxs.append(k)
            k += max(1, self.cfg.n_domains // (n + 1))
        return [self.root_url(self.domain_name(i)) for i in idxs[:n]]


def _error_page(url: str, code: int, domain: str = "") -> dict:
    return {
        "url": normalize_url(url), "domain": domain, "status_code": code,
        "redirect_to": None, "content_type": "text/html", "fetch_ms": 5,
        "size_b": 0, "body": b"", "out_links": [], "out_rels": [], "image_ids": [],
    }


# ---------------------------------------------------------------------- tables
def materialize(web: SyntheticWeb, out_dir: str) -> dict[str, int]:
    """Write the FIXTURES.md parquet tables for a small-scale web."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    counts = {}

    pq.write_table(pa.table({"url": web.seeds()}), f"{out_dir}/seeds.parquet")
    counts["seeds"] = len(web.seeds())

    dns_rows = [(d, web.dns_addrs(d)) for d in web.domains]
    pq.write_table(
        pa.table({
            "domain": [d for d, _ in dns_rows],
            "addrs": pa.array([a for _, a in dns_rows], type=pa.list_(pa.string())),
        }),
        f"{out_dir}/dns.parquet",
    )
    counts["dns"] = len(dns_rows)

    rob = [(d, web.robots_body(d)) for d in web.domains]
    rob = [(d, b) for d, b in rob if b is not None]
    pq.write_table(
        pa.table({"domain": [d for d, _ in rob], "body": [b for _, b in rob]}),
        f"{out_dir}/robots.parquet",
    )
    counts["robots"] = len(rob)

    pages, image_ids = [], []
    for i in range(web.cfg.n_domains):
        for j in range(web.n_pages(i)):
            rec = web.page_record(web.page_url(i, j))
            image_ids.extend(rec["image_ids"])
            pages.append(rec)
    pq.write_table(
        pa.table({
            "url": [p["url"] for p in pages],
            "domain": [p["domain"] for p in pages],
            "status_code": pa.array([p["status_code"] for p in pages], pa.int16()),
            "redirect_to": [p["redirect_to"] for p in pages],
            "content_type": [p["content_type"] for p in pages],
            "fetch_ms": pa.array([p["fetch_ms"] for p in pages], pa.int32()),
            "size_b": pa.array([p["size_b"] for p in pages], pa.int32()),
            "body": pa.array([p["body"] for p in pages], pa.binary()),
            "out_links": pa.array([p["out_links"] for p in pages], pa.list_(pa.string())),
        }),
        f"{out_dir}/pages.parquet",
    )
    counts["pages"] = len(pages)

    imgs = [web.image_record(iid) for iid in image_ids]
    pq.write_table(
        pa.table({
            "image_id": [r["image_id"] for r in imgs],
            "bytes": pa.array([r["bytes"] for r in imgs], pa.binary()),
            "w": pa.array([r["w"] for r in imgs], pa.int32()),
            "h": pa.array([r["h"] for r in imgs], pa.int32()),
            "fmt": [r["fmt"] for r in imgs],
            "caption": [r["caption"] for r in imgs],
            "phash": pa.array([r["phash"] for r in imgs], pa.int64()),
        }),
        f"{out_dir}/images.parquet",
    )
    counts["images"] = len(imgs)
    return counts
