from hypothesis import given, settings
from hypothesis import strategies as st

from deepex_spark.nlp.tokenizer import basic_tokens, detok_single, detokenize, encode


def test_encode_shape():
    enc = encode("Barack Obama was born.")
    assert enc.tokens[0] == "[CLS]" and enc.tokens[-1] == "[SEP]"
    assert enc.special_mask[0] == 1 and enc.special_mask[-1] == 1
    assert enc.offsets[0] == (0, 0) and enc.offsets[-1] == (0, 0)
    assert len(enc.tokens) == len(enc.offsets) == len(enc.special_mask)


def test_offsets_point_back_into_text():
    text = "The president (Barack Obama) visited   Paris!"
    enc = encode(text)
    for tok, (s, e), sp in zip(enc.tokens, enc.offsets, enc.special_mask):
        if sp:
            continue
        piece = tok[2:] if tok.startswith("##") else tok
        assert text[s:e] == piece


def test_wordpiece_roundtrip():
    enc = encode("The presidential administration collaborated internationally.")
    body = enc.tokens[1:-1]
    assert any(t.startswith("##") for t in body)
    assert detokenize(body) == "The presidential administration collaborated internationally ."


def test_truncation():
    enc = encode("word " * 500, max_length=256)
    assert len(enc.tokens) == 256


def test_detok_single_quirk():
    # reference convert_tokens_to_string on a single str iterates chars
    assert detok_single("!") == "!"
    assert detok_single("ab") == "a b"
    assert "" in "!=?"  # the membership quirk the kernel relies on


@given(st.text(alphabet=st.characters(codec="ascii", exclude_categories=["Cc"]), max_size=200))
@settings(max_examples=150, deadline=None)
def test_basic_tokens_spans(t):
    for tok, s, e in basic_tokens(t):
        assert t[s:e] == tok
        assert tok.strip() == tok and tok != ""
