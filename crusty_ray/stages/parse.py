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
