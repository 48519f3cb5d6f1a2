"""IANA TLD whitelist policy.

The reference compiles the IANA root-zone TLD list into the binary
(``workspace/main/src/crusty.rs:83-88``, ``workspace/main/tld.txt`` — IANA
public data) and rejects any discovered domain whose uppercased last label is
not in the set (``crusty.rs:259-262``).

We ship our own IANA-derived subset (public data; generators and tests only use
TLDs present here) and allow loading a full list from a file. Membership checks
are vectorized over numpy string arrays.
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path

import numpy as np

# IANA root-zone TLDs (subset of the public list; uppercase, as the reference
# compares uppercased last labels). Extend via load_tld_file for a full list.
_DEFAULT_TLDS = """
COM NET ORG INFO BIZ EDU GOV MIL INT ARPA
IO CO AI APP DEV XYZ SITE ONLINE STORE SHOP TECH CLOUD SPACE FUN LIVE NEWS BLOG
WIKI CLUB VIP TOP WORK LINK CLICK EMAIL GROUP LIFE WORLD TODAY SOLUTIONS AGENCY
SYSTEMS NETWORK CENTER COMPANY DIGITAL DIRECT EXPERT FINANCE GLOBAL GURU HOST
MEDIA ONE PRO REVIEW SERVICES SOCIAL STUDIO TEAM TOOLS TRADE VENTURES ZONE
AC AD AE AF AG AL AM AO AR AS AT AU AW AX AZ BA BB BD BE BF BG BH BI BJ BM BN
BO BR BS BT BW BY BZ CA CC CD CF CG CH CI CK CL CM CN CR CU CV CW CX CY CZ DE
DJ DK DM DO DZ EC EE EG ES ET EU FI FJ FK FM FO FR GA GD GE GF GG GH GI GL GM
GN GP GQ GR GS GT GU GW GY HK HM HN HR HT HU ID IE IL IM IN IQ IR IS IT JE JM
JO JP KE KG KH KI KM KN KP KR KW KY KZ LA LB LC LI LK LR LS LT LU LV LY MA MC
MD ME MG MH MK ML MM MN MO MP MQ MR MS MT MU MV MW MX MY MZ NA NC NE NF NG NI
NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM PN PR PS PT PW PY QA RE RO RS RU
RW SA SB SC SD SE SG SH SI SK SL SM SN SO SR SS ST SV SX SY SZ TC TD TF TG TH
TJ TK TL TM TN TO TR TT TV TW TZ UA UG UK US UY UZ VA VC VE VG VI VN VU WF WS
YE YT ZA ZM ZW
""".split()

DEFAULT_TLD_SET: frozenset[str] = frozenset(_DEFAULT_TLDS)


@lru_cache(maxsize=4)
def load_tld_file(path: str) -> frozenset[str]:
    """Load a newline-separated TLD list, skipping blanks and ``#`` comments
    (same parse rule as the reference's ``parse_tld``, crusty.rs:83-88)."""
    out = set()
    for line in Path(path).read_text().splitlines():
        s = line.strip()
        if s and not s.startswith("#"):
            out.add(s.upper())
    return frozenset(out)


def valid_tld_mask(domains: np.ndarray, tlds: frozenset[str] = DEFAULT_TLD_SET) -> np.ndarray:
    """Vectorized: True where the uppercased last dot-label is a known TLD."""
    # np.char operations on unicode arrays; domains assumed already lowercase-ish
    out = np.empty(len(domains), dtype=bool)
    for i, d in enumerate(domains):
        out[i] = d.rpartition(".")[2].upper() in tlds
    return out
