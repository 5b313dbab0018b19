"""Standalone long-run differential fuzz: _fast_dom vs html.parser on
random tag-soup compositions (the same fragment alphabet as
tests/test_property_fuzz.py, plus raw random text), at counts far beyond
what the in-suite hypothesis pass sweeps per run.

Usage: python tools/fuzz_differential.py [n_cases] [seed]
Prints progress every 50k cases and exits non-zero on the first divergence.
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_spark.core import html_extract as H  # noqa: E402

FRAGMENTS = [
    "<p>", "</p>", "<div class='page'>", "</div>", "<table>", "</table>",
    "<tr>", "</tr>", "<td>", "</td>", "<b>", "<br/>", "<a href='x'>", "</a>",
    "<script>", "</script>", "<style>", "</style>", "<!-- c -->", "<!DOCTYPE x>",
    "text", "Total revenues", "1,234", "&amp;", "&#65;", "<", ">", "&",
    "\n", " ", "CONSOLIDATED BALANCE SHEETS", "<p", "='", '"', "<3", "</",
    "<td nowrap>", "<P>", "</ x>",
    "<![CDATA[ a>b ]]>", "<![CDATA[", "]]>", "<![if x]>", "<![endif]>",
    "<![cdata]>", "<![rcdata[x] ]>", "<![",
    "</div/x>", "</div x>", "</p attr='v'>", "</>", "</ div>", "</P/>",
    "</script foo>", "</SCRIPT >", "</style\n>", "<script>a=1;",
    "<!--x-- >", "<!-->", "<!x y>", "<?php x ?>", "<?>", "<!",
    "<a b=1,c=2>", "<a 'q'>", "<a ==x>", "<a b='c'd>", "<div class=page>",
    "<div class = 'page'>", '<a b=">">', "<a b=>", "/>", "=",
]
RAW_CHARS = "abx<>&;='\"/ \n\t\x00é中"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = random.Random(seed)
    for i in range(n):
        k = rng.randrange(0, 60)
        bits = []
        for _ in range(k):
            if rng.random() < 0.8:
                bits.append(rng.choice(FRAGMENTS))
            else:
                bits.append("".join(
                    rng.choice(RAW_CHARS) for _ in range(rng.randrange(0, 7))
                ))
        html = "".join(bits)
        fast = H._pages_from_root(H._fast_dom(html))  # must never raise
        try:
            ref = H._pages_from_root(H._reference_dom(html))
        except AssertionError:
            continue  # reference parser rejects; fail-soft is enough
        if fast != ref:
            print(f"DIVERGENCE at case {i}: {html!r}", flush=True)
            return 1
        if (i + 1) % 50_000 == 0:
            print(f"{i + 1}/{n} clean", flush=True)
    print(f"ALL {n} CASES CLEAN (seed={seed})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
