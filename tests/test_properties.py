"""Property-based invariants (SURVEY.md §5 list)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from deepex_spark.config import DeepExConfig
from deepex_spark.kernel.sentence_kernel import NIL, assemble_and_dedup, featurize
from deepex_spark.local_oracle import local_distill

CFG = DeepExConfig.task(dist_const=2)

words = st.lists(
    st.text(alphabet=st.characters(codec="ascii", categories=["Lu", "Ll", "Nd"]), min_size=1, max_size=10),
    min_size=1,
    max_size=25,
)


@given(words)
@settings(max_examples=120, deadline=None)
def test_alignment_span_containment(ws):
    """O8: every aligned mention span indexes text that equals the mention
    surface (shifted by the sentence offset)."""
    text = " ".join(ws)
    offset = 7
    feat = featurize("d", offset, text, CFG)
    for name, (s, e) in zip(feat.ent_names, feat.ent_spans):
        if name == NIL:
            continue
        assert text[s - offset : e - offset] == name


@given(words, st.integers(min_value=0, max_value=5))
@settings(max_examples=60, deadline=None)
def test_dedup_count_conservation(ws, extra):
    """O19: sum of freqs over dedup'd candidates == number of assembled
    sequences that survived assembly filters."""
    text = " ".join(ws)
    feat = featurize("d", 0, text, CFG)
    n = len(feat.tokens)
    if n < 5:
        return
    # synthetic raw sequences between positions 1..n-2
    seqs = []
    for k in range(3 + extra):
        a = 1 + (k % (n - 3))
        b = min(n - 2, a + 2)
        if b - a >= 1:
            seqs.append(((a, a + 1, b), 0.1 * (k + 1)))
    ranked = assemble_and_dedup(seqs, feat, CFG)
    from deepex_spark.kernel.sentence_kernel import convert_to_triplet

    survived = 0
    for path, score in seqs:
        p = list(path)
        if not (p[0] < p[-1]):
            p = list(reversed(p))
        trip, spans = convert_to_triplet(p, feat)
        if trip is not None and spans is not None and spans[0] != [-1, -1] and spans[1] != [-1, -1]:
            if len(trip.strip().split(" ")) >= CFG.cand_min_len:
                survived += 1
    assert sum(r[1] for r in ranked) == survived


def test_reverse_emission_symmetry():
    """O21: distill emits exactly one reverse per forward, with subj/obj
    and spans swapped and identical score/sentence/offset."""
    cand = {
        "docid": "d",
        "sent_offset": 0,
        "sent_pos": 0,
        "sent_text": "Obama was born in Hawaii",
        "triple_key": "Obama [SEP] was born in [SEP] Hawaii",
        "subj": "Obama",
        "rel": "was born in",
        "obj": "Hawaii",
        "subj_s": 0,
        "subj_e": 5,
        "obj_s": 18,
        "obj_e": 24,
        "freq": 2,
        "score": 0.5,
        "attended_len": 8,
        "cand_rank": 0,
    }
    out = local_distill([cand], CFG)
    assert len(out) == 2
    fwd = next(r for r in out if r["is_rev"] == 0)
    rev = next(r for r in out if r["is_rev"] == 1)
    assert (fwd["subj"], fwd["obj"]) == (rev["obj"], rev["subj"])
    assert (fwd["subj_s"], fwd["subj_e"]) == (rev["obj_s"], rev["obj_e"])
    assert (fwd["obj_s"], fwd["obj_e"]) == (rev["subj_s"], rev["subj_e"])
    assert fwd["rel"] == rev["rel"]
    assert fwd["score"] == rev["score"]
    assert fwd["sentence"] == rev["sentence"]


def test_approx_sketch_booleans_pinned_true(spark):
    """o_approx_distinct / o_approx_quantile hash-compare a tolerance
    BOOLEAN (sketches are engine-specific), which would also 'match' if
    both engines' sketches were insane (false == false). Pin the
    Spark-side booleans to literally True so that degenerate pass is
    impossible."""
    from deepex_spark.queries import REGISTRY

    for q in ("o_approx_distinct", "o_approx_quantile", "o_hll_mergeable"):
        rows = REGISTRY[q].spark_fn(spark, "/root/testdata/sf0.001").collect()
        assert rows and all(r["within_5pct"] is True for r in rows), q


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([0, 2, 4, 6]),
    st.integers(min_value=0, max_value=255),
)
@settings(max_examples=80, deadline=None)
def test_png_roundtrip_property(w, h, ctype, seed):
    """PNG codec: decode(encode(raster)) == raster for every size, color
    type and seed — all five filter types appear once h >= 5, and 1-pixel
    edge shapes exercise the first-row/first-pixel zero predictors."""
    from deepex_spark.operators.multimodal import (
        _PNG_CHANNELS,
        _decode_png,
        _png_pixels,
        make_png_payload,
    )

    d = _decode_png(make_png_payload(w, h, seed=seed, color_type=ctype))
    assert (d["width"], d["height"]) == (w, h)
    assert d["body"] == _png_pixels(w, h, _PNG_CHANNELS[ctype], seed)
