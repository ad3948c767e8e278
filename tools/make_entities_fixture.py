"""Generate fixtures/entities.parquet — a deterministic entity
surface-form table (ent_id, name) for the blocked entity-resolution
queries: base names (people / orgs / places, 1-3 tokens) plus typo
variants at edit distance 1-2 (substitution, deletion, transposition,
duplication), including edits in the FIRST token (which the first-token
blocking pass must miss and the last-token pass recover — and
vice-versa), plus similar-but-distinct names at distance > 2 that must
NOT match.

Used by the ``entity_match_pairs`` / ``entity_resolution_clusters``
queries, whose DuckDB oracles independently re-derive the multi-pass
blocking + levenshtein matching (no golden of the engine's own output).

Usage: python tools/make_entities_fixture.py   (writes fixtures/entities.parquet)
"""

from __future__ import annotations

import os
import random
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 20260818

FIRST = ["Alan", "Grace", "Barack", "Albert", "Marie", "Isaac", "Rosalind",
         "Nikola", "Katherine", "Alonzo", "Emmy", "Srinivasa"]
LAST = ["Turing", "Hopper", "Obama", "Einstein", "Curie", "Newton",
        "Franklin", "Tesla", "Johnson", "Church", "Noether", "Ramanujan"]
ORGS = ["Princeton University", "Bell Labs", "Royal Society",
        "Institute for Advanced Study", "Cavendish Laboratory"]
PLACES = ["Princeton", "Warsaw", "Cambridge", "Zurich", "Gottingen"]


def _sub(rng, s):
    i = rng.randrange(len(s))
    c = chr(ord("a") + rng.randrange(26))
    return s[:i] + c + s[i + 1:]


def _drop(rng, s):
    i = rng.randrange(len(s))
    return s[:i] + s[i + 1:]


def _swap(rng, s):
    if len(s) < 2:
        return s + s
    i = rng.randrange(len(s) - 1)
    return s[:i] + s[i + 1] + s[i] + s[i + 2:]


def _dup(rng, s):
    i = rng.randrange(len(s))
    return s[:i] + s[i] + s[i:]


EDITS = [_sub, _drop, _swap, _dup]


def rows():
    rng = random.Random(SEED)
    bases = (
        [f"{f} {l}" for f, l in zip(FIRST, LAST)]
        + [f"{f} {l}" for f, l in zip(FIRST[::-1], LAST)]
        + ORGS
        + PLACES
    )
    out = []
    ent_id = 0
    for b in bases:
        out.append((ent_id, b))
        ent_id += 1
        for _ in range(rng.randrange(4)):  # 0-3 typo variants, dist 1-2
            v = b
            for _ in range(1 + rng.randrange(2)):
                v = EDITS[rng.randrange(len(EDITS))](rng, v)
            out.append((ent_id, v))
            ent_id += 1
    # similar-but-distinct decoys (distance > 2 from every base): same
    # last token, different first token -> same block, must NOT match
    for i, l in enumerate(LAST):
        out.append((ent_id, f"Director {l}"))
        ent_id += 1
    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "fixtures", "entities.parquet")
    df = pd.DataFrame(rows(), columns=["ent_id", "name"])
    df["ent_id"] = df["ent_id"].astype("int64")
    df.to_parquet(dest, index=False)
    print(f"wrote {dest}: {len(df)} surface forms")


if __name__ == "__main__":
    main()
