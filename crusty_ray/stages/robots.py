"""robots.txt parsing + allow checks (reference F7, rules.rs:70-72,89-92).

The reference delegates to crusty-core's port of Google's robots parser; our
synthetic web only emits ``User-agent: *`` sections with ``Disallow:`` prefix
rules, so the matcher implements exactly that subset (documented limitation —
the plumbing, caching and filter-chain position are the real thing).
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import urlsplit


def parse_disallows(body: Optional[str]) -> list[str]:
    """Disallow prefixes applying to ``User-agent: *`` (empty = allow all)."""
    if not body:
        return []
    out: list[str] = []
    applies = False
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            out.append(val)
    return out


def allowed(url: str, disallows: list[str]) -> bool:
    if not disallows:
        return True
    path = urlsplit(url).path or "/"
    return not any(path.startswith(d) for d in disallows)
