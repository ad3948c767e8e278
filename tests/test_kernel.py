"""Kernel unit tests: alignment, segments, beam constraints, assembly,
dedup ranking — against hand-built attention matrices (FIXTURES.md F5)."""

import numpy as np
import pytest

from deepex_spark.config import DeepExConfig
from deepex_spark.kernel.sentence_kernel import (
    NIL,
    _first_hop,
    assemble_and_dedup,
    beam_search_ie,
    convert_to_triplet,
    entity_segments,
    featurize,
    process_sentence,
    relation_text,
    uni_beam,
)


class FixedAttention:
    def __init__(self, mat):
        self.mat = np.asarray(mat, dtype=np.float64)

    def attention(self, tokens):
        assert self.mat.shape[0] == len(tokens), (self.mat.shape, len(tokens))
        return self.mat


CFG = DeepExConfig.task()


def test_alignment_spans():
    feat = featurize("d", 10, "Obama visited Paris", CFG)
    # tokens: [CLS] Obama visited Paris [SEP] — 'visited' is verbish
    assert feat.tokens == ["[CLS]", "Obama", "visi", "##ted", "Paris", "[SEP]"]
    assert feat.ent_names[1] == "Obama"
    assert feat.ent_spans[1] == (10, 15)  # shifted by sentence offset
    assert feat.ent_names[2] == NIL
    assert feat.ent_names[4] == "Paris"
    assert feat.ent_spans[4] == (24, 29)


def test_entity_segments_add_extra_and_splits():
    feat = featurize("d", 0, "Obama won ! Paris fell", CFG)
    # tokens: [CLS] Obama won !  Paris fell [SEP]
    eids, segs = entity_segments(feat, CFG)
    # '!' at index 3 splits segments; add_extra appends first (1) and
    # last-minus-one (= index len-3) tokens
    assert segs[0] != segs[1]
    assert all(e < 3 for e in segs[0])
    assert all(e > 3 for e in segs[1])


def _diag_attention(n, strong_pairs):
    m = np.full((n, n), 0.01)
    for i, j, v in strong_pairs:
        m[i, j] = v
    return m


def test_simple_triple_extraction():
    text = "Obama lives in Hawaii"
    feat = featurize("d", 0, text, CFG)
    # tokens: [CLS](0) Obama(1) lives(2) in(3) Hawaii(4) [SEP](5)
    assert feat.tokens == ["[CLS]", "Obama", "lives", "in", "Hawaii", "[SEP]"]
    att = _diag_attention(6, [(1, 2, 0.9), (2, 3, 0.9), (3, 4, 0.9), (4, 3, 0.9), (3, 2, 0.9), (2, 1, 0.9)])
    rows = process_sentence("d", 0, text, CFG, FixedAttention(att))
    keys = [r["triple_key"] for r in rows]
    assert "Obama [SEP] lives in [SEP] Hawaii" in keys
    top = rows[0]
    assert (top["subj_s"], top["subj_e"]) == (0, 5)
    assert (top["obj_s"], top["obj_e"]) == (15, 21)


def test_beam_no_revisit_and_direction():
    # walk right from 0 to 3 on a 4-node clique; paths must be monotone
    # after the first hop and never revisit
    m = np.full((4, 4), 0.5)
    order_np = np.argsort(-m, axis=1, kind="stable")
    order = order_np.tolist()
    vals = np.take_along_axis(m, order_np, 1).tolist()
    att_rows = m.tolist()
    ridx = [order_np[v][order_np[v] > v].tolist() for v in range(4)]
    rval = [
        np.take_along_axis(m, order_np, 1)[v][order_np[v] > v].tolist()
        for v in range(4)
    ]
    fb = _first_hop(0, 0, vals, order, 6)
    beams = uni_beam(0, 0, rval, ridx, att_rows, 6, 3, fb)
    for path, score, visited, *_rest in beams:
        assert visited
        assert len(set(path)) == len(path)  # no revisit
        assert path[0] == 0 and path[-1] == 3
        # monotone increasing after first hop (right direction)
        for a, b in zip(path[1:], path[2:]):
            assert b > a or b == 3


def test_score_clamp_quirk():
    # a sequence whose summed score exceeds 1.0 is accumulated as 1.0
    # (reference kgm.py:234 seq[1:-1]=sorted(...) bool/float quirk)
    text = "Obama lives in Hawaii"
    feat = featurize("d", 0, text, CFG)
    seqs = [((1, 2, 3, 4), 2.5), ((1, 2, 3, 4), 0.4)]
    ranked = assemble_and_dedup(seqs, feat, CFG)
    assert len(ranked) == 1
    key, freq, score, h_span, t_span, attlen = ranked[0]
    assert freq == 2
    assert score == pytest.approx(1.0 + 0.4)


def test_same_span_rejected():
    text = "Obama lives in Hawaii"
    feat = featurize("d", 0, text, CFG)
    # path starting and ending inside the same mention
    trip, spans = convert_to_triplet([1, 2, 1], feat)
    assert trip is None


def test_relation_wordpiece_pruning():
    # relation tokens adjacent to head with ## continuation get pruned
    text = "Obama collaborated Hawaii"
    feat = featurize("d", 0, text, CFG)
    # tokens: [CLS] Obama coll ##abor ##ated Hawaii [SEP]
    assert feat.tokens[2] == "coll" and feat.tokens[3] == "##abor"
    r = relation_text([1, 2, 3, 4, 5], feat)
    assert r == "collaborated"
    # faithful quirk: a relation starting mid-word away from the head is
    # NOT pruned (the reference prunes only at head/tail adjacency) — the
    # raw '##' piece survives detokenization (kgm.py:114-121,47-50)
    assert relation_text([1, 3, 5], feat) == "##abor"
    # pruning fires when the relation's first piece continues the head's
    # word: first_rid - pre_offset <= hid -> skip past the word; here that
    # leaves nothing between head and tail -> None
    assert relation_text([2, 3, 5], feat) is None


def test_title_casing_python_semantics():
    text = "the young-men's club met o'neill"
    feat = featurize("d", 0, text, CFG)
    names = [n for n in feat.ent_names if n != NIL]
    assert names  # chunker found something
    # Python str.title() differs from initcap on apostrophes: O'Neill
    assert "o'neill".title() == "O'Neill"


def test_dedup_ranking_types():
    text = "Obama lives in Hawaii"
    feat = featurize("d", 0, text, CFG)
    seqs = [((1, 2, 3, 4), 0.9), ((1, 2, 3, 4), 0.1), ((1, 3, 4), 0.6)]
    from dataclasses import replace

    for rt, want_first in [
        ("freq", "Obama [SEP] lives in [SEP] Hawaii"),
        ("score", "Obama [SEP] lives in [SEP] Hawaii"),
        ("score_len", "Obama [SEP] in [SEP] Hawaii"),
    ]:
        cfg = replace(CFG, dedup_ranking_type=rt)
        ranked = assemble_and_dedup(seqs, feat, cfg)
        assert ranked[0][0] == want_first, rt


def test_gpt2_attention_symmetrization():
    """GPT-2 causal attention (lower-triangular) is symmetrized by folding
    the transpose's strict upper triangle back in (kgm.py:402-404): a walk
    that needs a forward edge only finds it via the mirrored backward one."""
    from dataclasses import replace

    text = "Obama lives in Hawaii"
    # tokens: [CLS](0) Obama(1) lives(2) in(3) Hawaii(4) [SEP](5)
    # causal matrix: ONLY backward (j < i) entries are non-tiny
    att = np.full((6, 6), 0.0)
    att[2, 1] = 0.9   # lives -> Obama (backward)
    att[3, 2] = 0.9   # in -> lives
    att[4, 3] = 0.9   # Hawaii -> in
    gpt2_cfg = replace(CFG, model_name_or_path="gpt2")

    rows_gpt2 = process_sentence("d", 0, text, gpt2_cfg, FixedAttention(att))
    keys_gpt2 = [r["triple_key"] for r in rows_gpt2]
    assert "Obama [SEP] lives in [SEP] Hawaii" in keys_gpt2

    # without the gpt2 branch (BERT config), the same causal matrix gives a
    # DIFFERENT candidate set: the forward walk can't traverse the mirrored
    # edges, so the full forward triple never forms with this score
    rows_bert = process_sentence("d", 0, text, CFG, FixedAttention(att))
    sym = att + np.triu(att.T, k=1)
    rows_manual = process_sentence("d", 0, text, CFG, FixedAttention(sym))
    as_set = lambda rows: {(r["triple_key"], round(r["score"], 9)) for r in rows}
    assert as_set(rows_gpt2) == as_set(rows_manual)   # branch == manual fold
    assert as_set(rows_gpt2) != as_set(rows_bert)     # and it changes results


def test_windowed_long_sentence_still_extracts():
    from dataclasses import replace

    words = " ".join(f"w{i} item{i}" for i in range(200))
    cfg = replace(DeepExConfig.small(), max_kernel_tokens=32)
    from deepex_spark.nlp.attention import get_attention_provider

    rows = process_sentence("d", 0, words, cfg, get_attention_provider(cfg))
    assert rows  # windows produced candidates without O(n^3) blowup


def _reference_uni_beam(node, offset, svals, sidx, topk, direction, bound):
    """Straight transcription of the reference walk (kgm.py:358-391): scan
    the FULL pre-sorted attention row every hop, filtering direction/
    cross-segment/revisit inline. The optimized uni_beam (prefiltered
    direction streams + merge-injected bound + shared first hop) must
    produce byte-identical beams."""
    bl = bound - offset
    is_left = direction == "left"
    beam = [((node,), 0.0, False, 0.0, 1 << node)]
    while True:
        if all(c[2] for c in beam):
            break
        new = []
        for path, score, visited, mean, mask in beam:
            v = path[-1] - offset
            if v != bl:
                row_i, row_v = sidx[v], svals[v]
                plen1 = len(path) + 1
                last = v + offset
                multi = plen1 > 2
                check_cross = multi and last != node and last != bound
                if check_cross:
                    loc_last = (last < node) + (last < bound)
                tempk = 0
                for k in range(len(row_i)):
                    if tempk == topk:
                        break
                    tgt = row_i[k]
                    tga = tgt + offset
                    if (mask >> tga) & 1:
                        continue
                    if multi and tgt != bl:
                        if is_left:
                            if tgt >= v:
                                continue
                        elif tgt <= v:
                            continue
                        if check_cross and ((tga < node) + (tga < bound)) != loc_last:
                            continue
                    ns = score + row_v[k]
                    new.append((path + (tga,), ns, False, ns / plen1, mask | (1 << tga)))
                    tempk += 1
            else:
                new.append((path, score, True, mean, mask))
        new.sort(key=lambda t: t[3], reverse=True)
        beam = new[:topk]
    return beam


def test_uni_beam_equals_fullscan_reference():
    # randomized equivalence incl. duplicate attention values (tie-order
    # stress) and both directions, every (node, bound) pair
    rng = np.random.default_rng(7)
    for trial in range(30):
        S = int(rng.integers(3, 14))
        m = rng.random((S, S))
        if trial % 3 == 0:
            # quantize to force ties in the stable sort
            m = np.round(m, 1)
        order_np = np.argsort(-m, axis=1, kind="stable")
        vals_np = np.take_along_axis(m, order_np, axis=1)
        order, vals = order_np.tolist(), vals_np.tolist()
        att_rows = m.tolist()
        lidx = [order_np[v][order_np[v] < v].tolist() for v in range(S)]
        lval = [vals_np[v][order_np[v] < v].tolist() for v in range(S)]
        ridx = [order_np[v][order_np[v] > v].tolist() for v in range(S)]
        rval = [vals_np[v][order_np[v] > v].tolist() for v in range(S)]
        topk = int(rng.integers(2, 7))
        for node in range(S):
            fb = _first_hop(node, 0, vals, order, topk)
            for bound in range(S):
                if bound == node:
                    continue
                direction = "left" if bound < node else "right"
                dval, didx = (lval, lidx) if direction == "left" else (rval, ridx)
                got = uni_beam(node, 0, dval, didx, att_rows, topk, bound, fb)
                want = _reference_uni_beam(node, 0, vals, order, topk, direction, bound)
                assert got == want, (trial, node, bound, direction)
