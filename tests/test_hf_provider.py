"""HFAttentionProvider — the production attention path (reference
generator.py:92-93, kgm.py:30-44 layer-select + head-aggregate).

torch/transformers are absent in this sandbox, so the provider is gated
behind an import-try. Two layers of coverage so the path does not rot:

* ``test_hf_provider_real_weights`` — skipif(no torch): runs the REAL
  HuggingFace path the moment the deps appear (shape / row-normalization
  contract vs the surrogate on one sentence);
* mocked-API tests — always run: a minimal fake torch/transformers is
  injected into sys.modules and the provider's layer-select + head-agg
  arithmetic is asserted against an independent numpy computation for
  every (layer_id, head_type) combination the reference supports.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager
from types import ModuleType, SimpleNamespace

import numpy as np
import pytest

TOKENS = ["obama", "lives", "in", "hawaii", "."]

try:  # pragma: no cover - sandbox has neither
    import torch  # noqa: F401
    import transformers  # noqa: F401

    _HAVE_HF = True
except ImportError:
    _HAVE_HF = False


@pytest.mark.skipif(not _HAVE_HF, reason="torch/transformers not installed")
def test_hf_provider_real_weights():  # pragma: no cover - needs weights
    """The day torch/transformers (and weights) exist, the production path
    must satisfy the same contract the kernel assumes of the surrogate:
    [n, n] float matrix; with head_type='mean' each row sums to ~1 (softmax
    rows averaged over heads stay row-stochastic)."""
    from deepex_spark.nlp.attention import HFAttentionProvider

    try:
        provider = HFAttentionProvider(
            "bert-base-uncased", head_type="mean", layer_id=-1
        )
    except OSError as e:  # offline box with torch but no weight cache
        pytest.skip(f"weights unavailable: {e}")
    toks = provider.tokenizer.tokenize("Obama lives in Hawaii.")
    att = provider.attention(toks)
    n = len(toks)
    assert att.shape == (n, n)
    assert np.all(att >= 0)
    assert np.allclose(att.sum(axis=1), 1.0, atol=1e-4)


# ---------------------------------------------------------------------------
# mocked torch/transformers — verifies the provider's own logic today
# ---------------------------------------------------------------------------


class _FakeTensor:
    def __init__(self, a):
        self.a = np.asarray(a, dtype=np.float64)

    def mean(self, dim):
        return _FakeTensor(self.a.mean(axis=dim))

    def sum(self, dim):
        return _FakeTensor(self.a.sum(axis=dim))

    def max(self, dim):
        return SimpleNamespace(values=_FakeTensor(self.a.max(axis=dim)))

    def __getitem__(self, k):
        return _FakeTensor(self.a[k])

    def cpu(self):
        return self

    def numpy(self):
        return self.a


def _fake_attentions(ids, n_layers=4, n_heads=3):
    """Deterministic per-layer [1, heads, n, n] stacks from the token ids —
    the same arrays the test's independent numpy aggregation reads."""
    n = len(ids)
    out = []
    for layer in range(n_layers):
        rng = np.random.default_rng(1000 * layer + int(np.sum(ids)))
        out.append(rng.random((1, n_heads, n, n)))
    return out


def _install_fakes(monkeypatch, n_layers=4, n_heads=3):
    @contextmanager
    def _no_grad():
        yield

    fake_torch = ModuleType("torch")
    fake_torch.tensor = lambda x: _FakeTensor(x)
    fake_torch.no_grad = _no_grad
    fake_torch.stack = lambda ts, dim=0: _FakeTensor(
        np.stack([t.a for t in ts], axis=dim)
    )

    class _Tok:
        def convert_tokens_to_ids(self, tokens):
            return [7 + i * 13 for i, _ in enumerate(tokens)]

    class _Model:
        def eval(self):
            return self

        def __call__(self, input_ids):
            ids = [int(x) for x in input_ids.a[0]]
            atts = tuple(
                _FakeTensor(a) for a in _fake_attentions(ids, n_layers, n_heads)
            )
            return SimpleNamespace(attentions=atts)

    fake_tf = ModuleType("transformers")
    fake_tf.AutoTokenizer = SimpleNamespace(
        from_pretrained=lambda name, use_fast=True: _Tok()
    )
    fake_tf.AutoModel = SimpleNamespace(
        from_pretrained=lambda name, output_attentions=True: _Model()
    )

    monkeypatch.setitem(sys.modules, "torch", fake_torch)
    monkeypatch.setitem(sys.modules, "transformers", fake_tf)


@pytest.mark.parametrize("layer_id", [-1, 0, -100])
@pytest.mark.parametrize("head_type", ["mean", "max", "sum"])
def test_hf_provider_layer_and_head_aggregation(monkeypatch, layer_id, head_type):
    """Against the mocked API, the provider must reproduce exactly the
    reference aggregation (kgm.py:30-44): layer -1 = last, -100 = mean of
    all layers, else index; heads mean/max/sum over axis 1."""
    _install_fakes(monkeypatch)
    from deepex_spark.nlp.attention import HFAttentionProvider

    provider = HFAttentionProvider("any-model", head_type=head_type, layer_id=layer_id)
    got = provider.attention(TOKENS)

    ids = [7 + i * 13 for i in range(len(TOKENS))]
    layers = np.stack(_fake_attentions(ids), axis=0)  # [L, 1, H, n, n]
    sel = layers.mean(axis=0) if layer_id == -100 else layers[layer_id]
    agg = {
        "mean": sel.mean(axis=1),
        "max": sel.max(axis=1),
        "sum": sel.sum(axis=1),
    }[head_type]
    want = agg[0]
    assert got.shape == (len(TOKENS), len(TOKENS))
    np.testing.assert_array_equal(got, want)


def test_hf_provider_unknown_head_type_raises(monkeypatch):
    _install_fakes(monkeypatch)
    from deepex_spark.nlp.attention import HFAttentionProvider

    provider = HFAttentionProvider("any-model", head_type="median", layer_id=-1)
    with pytest.raises(ValueError, match="mean max sum"):
        provider.attention(TOKENS)


def test_hf_provider_loud_without_deps():
    """In this sandbox (no torch): the provider must fail LOUDLY with the
    documented NotImplementedError, never silently fall back."""
    if _HAVE_HF:  # pragma: no cover
        pytest.skip("torch installed; loud-failure branch not reachable")
    from deepex_spark.nlp.attention import HFAttentionProvider

    with pytest.raises(NotImplementedError, match="surrogate"):
        HFAttentionProvider("bert-large-cased")


def test_get_provider_dispatch(monkeypatch):
    """cfg.attention_provider='hf' reaches HFAttentionProvider with the
    cfg's layer/head knobs (mocked deps)."""
    _install_fakes(monkeypatch)
    from deepex_spark.config import DeepExConfig
    from deepex_spark.nlp.attention import HFAttentionProvider, get_attention_provider

    cfg = DeepExConfig.task(
        attention_provider="hf", search_layer_id=-100,
        search_attention_head_type="max",
    )
    p = get_attention_provider(cfg)
    assert isinstance(p, HFAttentionProvider)
    assert p.layer_id == -100 and p.head_type == "max"
