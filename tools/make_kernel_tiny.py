"""Export the kernel_tiny_sql / kernel_tiny2_sql fixtures: a sentence
slice + its surrogate attention matrices + entity segments, so DuckDB can
RE-DERIVE the tiny-config beam search independently (see
deepex_spark/kernel/tiny_oracle.py). Usage:

    python tools/make_kernel_tiny.py      # variant 1 (kernel_tiny)
    python tools/make_kernel_tiny.py 2    # variant 2 (kernel_tiny2)
    python tools/make_kernel_tiny.py 3    # variant 3 (kernel_tiny3)
    python tools/make_kernel_tiny.py 4    # variant 4 (kernel_tiny4, beam 6)

Selection (documented, does not bias correctness — both engines run on
the final set): sentences from the deterministic synthetic corpus whose
pruned entity window is 4..MAX_PRUNED tokens, whose segment positions all
fall inside the window, with at least one 2+-entity segment (so walks
exist) and a non-empty tiny-config output. Variant 2 additionally
requires a 3+-entity segment, so bounds at pair distance 2 actually
exist and the dist_const=2 enumeration order is exercised. First
N_SENTENCES matches.

After writing, the tool SELF-CHECKS: runs the real kernel AND the DuckDB
oracle SQL and asserts identical (sent_id, seq_rank, path, score) rows —
exact float equality, no tolerance. A mismatch aborts before commit.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_SENTENCES = 50


def main(variant: int = 1) -> None:
    import duckdb

    from deepex_spark.kernel.sentence_kernel import (
        beam_search_ie,
        entity_segments,
        featurize,
    )
    from deepex_spark.kernel.tiny_oracle import (
        MAX_PRUNED,
        VARIANTS,
        kernel_tiny_oracle_sql,
        tiny_cfg,
    )
    from deepex_spark.local_oracle import local_sentencize
    from deepex_spark.nlp.attention import get_attention_provider
    from deepex_spark.sources.pages import synth_page_rows

    fixture_dir = VARIANTS[variant][1]
    cfg = tiny_cfg(variant)
    provider = get_attention_provider(cfg)

    sent_rows, att_rows, seg_rows, engine_rows = [], [], [], []
    sent_id = 0
    for url, text in ((r[0], r[3]) for r in synth_page_rows(n_docs=200, seed=11)):
        if sent_id >= N_SENTENCES:
            break
        for _pos, offset, sent in local_sentencize(text):
            if sent_id >= N_SENTENCES:
                break
            feat = featurize(url, int(offset), sent, cfg)
            eid, segs = entity_segments(feat, cfg)
            if eid is None:
                continue
            off0, end = eid[0], eid[-1]
            size = end - off0 + 1
            if not (4 <= size <= MAX_PRUNED):
                continue
            if any(p < off0 or p > end for seg in segs for p in seg):
                continue
            if not any(len(seg) >= 2 for seg in segs):
                continue
            # larger-variant gates: dist_const=D enumeration order is only
            # exercised when distance-D bounds exist, i.e. a (D+1)-entity
            # segment appears in the window
            if variant >= 2 and not any(len(seg) >= 3 for seg in segs):
                continue
            if variant >= 3 and not any(len(seg) >= 4 for seg in segs):
                continue
            att = provider.attention(feat.tokens)
            seqs = beam_search_ie(att, feat, cfg)
            if not seqs:
                continue
            sent_rows.append((sent_id, url, int(offset), sent))
            pruned = np.asarray(att)[off0 : end + 1, off0 : end + 1]
            for i in range(size):
                for j in range(size):
                    att_rows.append((sent_id, i, j, float(pruned[i][j])))
            for gi, seg in enumerate(segs):
                for pi, p in enumerate(seg):
                    seg_rows.append((sent_id, gi, pi, p - off0))
            for rank, (path, s) in enumerate(seqs, 1):
                engine_rows.append(
                    (sent_id, rank, "-".join(str(p - off0) for p in path), float(s))
                )
            sent_id += 1

    assert sent_id == N_SENTENCES, f"only {sent_id} qualifying sentences found"
    os.makedirs(fixture_dir, exist_ok=True)
    pd.DataFrame(
        sent_rows, columns=["sent_id", "docid", "offset", "text"]
    ).to_parquet(os.path.join(fixture_dir, "sentences.parquet"), index=False)
    pd.DataFrame(att_rows, columns=["sent_id", "i", "j", "v"]).to_parquet(
        os.path.join(fixture_dir, "attention.parquet"), index=False
    )
    pd.DataFrame(
        seg_rows, columns=["sent_id", "seg_id", "pos_idx", "pos"]
    ).to_parquet(os.path.join(fixture_dir, "segments.parquet"), index=False)

    # --- self-check: engine vs independent SQL, exact equality ---
    oracle = duckdb.sql(kernel_tiny_oracle_sql(variant=variant)).fetchall()
    got = sorted((int(a), int(b), c, float(d)) for a, b, c, d in oracle)
    want = sorted(engine_rows)
    if got != want:
        gs, ws = set(got), set(want)
        print("ORACLE-ONLY:", sorted(gs - ws)[:10])
        print("ENGINE-ONLY:", sorted(ws - gs)[:10])
        raise SystemExit("kernel_tiny self-check FAILED")
    print(
        f"wrote {fixture_dir}: {len(sent_rows)} sentences, "
        f"{len(att_rows)} attention cells, {len(seg_rows)} segment rows; "
        f"self-check PASSED on {len(want)} sequences"
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
