"""The reversed-emission contrastive distance equals the forward one
bit-for-bit: ``str((obj, rel, subj))`` is an element permutation of
``str((subj, rel, obj))``, regex tokens never cross element boundaries, and
``_hash_embed`` accumulates exact ±1 integers (order-free float sums) —
so ``candidate_distances`` computes the embedding once. This test pins the
symmetry argument against the direct two-sided computation, including
adversarial strings (quotes, non-ASCII, repeated tokens, empties)."""

from deepex_spark.operators.rerank import (
    _NON_ASCII,
    candidate_distances,
    contrastive_distance_py,
)

CASES = [
    ("The Cat Sat", "sat on", "The Mat"),
    ("It'S A Quote", "holds", 'Double "Q" Here'),
    ("Café Del Mar", "plays ♪ tunes", "Ibiza"),
    ("A A A", "a a", "A A A"),
    ("", "rel only", ""),
    ("X", "", "Y"),
    ("Comma, Inc.", "acquired (fully)", "Paren) Corp"),
]


def test_reversed_distance_bit_identical():
    for subj, rel, obj in CASES:
        sent = f"{subj} {rel} {obj} and some trailing sentence text."
        cache: dict = {}
        d_fwd, d_rev = candidate_distances(sent, subj, rel, obj, 64, cache)
        # recompute the reversed side the long way
        rel_s = _NON_ASCII.sub(" ", rel).strip()
        sentence = "$input_txt:$ " + sent
        d_rev_direct = contrastive_distance_py(sentence, obj, rel_s, subj, 64, cache)
        assert d_fwd == d_rev == d_rev_direct, (subj, rel, obj)
