"""Generate fixtures/robots.parquet — deterministic robots.txt bodies
for the hosts of fixtures/pages.parquet, exercising every branch of the
operators/robots.py grammar subset:

* site0: plain prefix disallow + a LONGER allow carve-out (longest-match
  override), plus a same-length Allow/Disallow tie (allow must win);
* site1: a group for another agent only -> everything stays allowed;
* site2: stacked User-agent lines (googlebot + *), comments, CRLF line
  endings, an unknown key (Crawl-delay) that must be ignored;
* site3: an EMPTY Disallow (no rule) plus wildcard paths that the
  subset truncates at the first * / $ (conservative prefix);
* site4: Disallow: / (block everything);
* site5/site6: no robots row at all -> default allowed.

Usage: python tools/make_robots_fixture.py  (writes fixtures/robots.parquet)
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)

ROBOTS = {
    "site0.example.org": (
        "User-agent: *\n"
        "Disallow: /articles/1\n"
        "Allow: /articles/12   # longest match re-permits the 12x ids\n"
        "Disallow: /articles/7\n"
        "Allow: /articles/7    # same length as the disallow: allow wins\n"
    ),
    "site1.example.org": (
        "User-agent: googlebot\n"
        "Disallow: /\n"
    ),
    "site2.example.org": (
        "# stacked agents, CRLF endings, unknown keys\r\n"
        "User-agent: googlebot\r\n"
        "User-agent: *\r\n"
        "Crawl-delay: 10\r\n"
        "Disallow: /articles/\r\n"
        "Allow: /articles/4\r\n"
    ),
    "site3.example.org": (
        "User-agent: *\n"
        "Disallow:\n"
        "Disallow: /articles/*9\n"
        "Allow: /articles/16$\n"
    ),
    "site4.example.org": (
        "User-agent: *\n"
        "Disallow: /\n"
    ),
}


def main():
    df = pd.DataFrame(
        [{"host": h, "robots_txt": t} for h, t in sorted(ROBOTS.items())]
    )
    dest = os.path.join(FIXTURE_DIR, "robots.parquet")
    df.to_parquet(dest, index=False)
    print(f"wrote {len(df)} robots rows -> {dest}")


if __name__ == "__main__":
    main()
