"""HTML link extraction — the reference's lol_html/html5ever parser stage.

The reference streams each page body through a rewriter with the single
selector ``a[href]`` capturing ``{href, rel, alt}`` and discarding everything
else (``workspace/main/src/parsers/lolhtml.rs:43-75``; html5ever variant
``parsers/html5ever.rs:69-134``). No DOM retained, no content kept.

No HTML library ships in this container, so the parser is a compiled-regex
scanner with the same observable behavior: find ``<a …>`` start tags, pull
``href``/``rel`` attributes, resolve relative hrefs against the page URL
(``Link::new`` base resolution, parsers/lolhtml.rs:33). The regex is compiled
once per actor (stateful-stage rule) and applied per batch.
"""

from __future__ import annotations

import re

from ..core.urls import resolve_link

# start-tag scanner: the attribute blob of every <a ...> tag
_A_TAG = re.compile(rb"<a\s+([^>]*?)>", re.IGNORECASE | re.DOTALL)
_HREF = re.compile(rb"""href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)
_REL = re.compile(rb"""rel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE)


def _attr(m: re.Match | None) -> str:
    if m is None:
        return ""
    for g in (2, 3, 4):
        if m.group(g) is not None:
            return m.group(g).decode("utf-8", "replace")
    return ""


def extract_links(body: bytes, base_url: str) -> tuple[list[str], list[str]]:
    """(resolved_hrefs, rels) for every ``<a href>`` in document order.

    Unresolvable / non-http hrefs are dropped (Link::new returns Err there).
    """
    hrefs: list[str] = []
    rels: list[str] = []
    for m in _A_TAG.finditer(body):
        attrs = m.group(1)
        href = _attr(_HREF.search(attrs))
        if not href:
            continue
        resolved = resolve_link(base_url, href)
        if resolved is None:
            continue
        hrefs.append(resolved)
        rels.append(_attr(_REL.search(attrs)))
    return hrefs, rels


class _ATagParser:
    """Stdlib-tokenizer variant — the reference's feature-gated html5ever
    parser (``workspace/main/src/parsers/html5ever.rs:69-134``,
    ``main/Cargo.toml:13-18``): a full start-tag tokenizer instead of a
    selector rewriter, proving the parser slot is a pluggable UDF."""

    def __init__(self):
        from html.parser import HTMLParser

        outer = self

        class P(HTMLParser):
            def handle_starttag(self, tag, attrs):
                if tag != "a":
                    return
                d = dict(attrs)
                href = d.get("href")
                if href:
                    outer.found.append((href, d.get("rel") or ""))

        self._cls = P
        self.found: list[tuple[str, str]] = []

    def parse(self, body: bytes) -> list[tuple[str, str]]:
        self.found = []
        p = self._cls(convert_charrefs=True)
        p.feed(body.decode("utf-8", "replace"))
        p.close()
        return self.found


def extract_links_htmlparser(body: bytes, base_url: str) -> tuple[list[str], list[str]]:
    """Alternate implementation of ``extract_links`` (same contract) built on
    the stdlib HTML tokenizer — select via ``CrawlSettings``/FetchStage
    ``parser="htmlparser"``."""
    hrefs: list[str] = []
    rels: list[str] = []
    for href, rel in _ATagParser().parse(body):
        resolved = resolve_link(base_url, href)
        if resolved is None:
            continue
        hrefs.append(resolved)
        rels.append(rel)
    return hrefs, rels


PARSERS = {"regex": extract_links, "htmlparser": extract_links_htmlparser}
