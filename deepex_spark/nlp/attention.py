"""Attention-matrix providers.

The reference obtains per-sentence attention from a pretrained BERT forward
pass with ``output_attentions=True`` (reference ``scripts/generator.py:92-93``,
``src/deepex/model/kgm.py:578-594``), then selects a layer
(``search_layer_id=-1`` → last; -100 → mean of all layers, ``kgm.py:30-34``)
and aggregates heads (mean/max/sum, ``kgm.py:36-44``).

Providers here return the *post-aggregation* ``[seq, seq]`` float matrix for
one tokenized sentence:

* ``SurrogateAttentionProvider`` — deterministic, model-free: row-softmaxed
  mixture of a token-pair hash signal and a locality prior. Fixed given
  (tokens, seed), identical across partitionings/cluster sizes, so golden
  outputs are stable. This is the provider the committed goldens pin
  (SURVEY.md §7.0).
* ``HFAttentionProvider`` — the production path: loads a HuggingFace
  encoder and mirrors the reference's layer-select + head-aggregate. Gated
  behind an import-try since torch/transformers are absent in this sandbox.

Both are used *inside* the fused ``mapInPandas`` kernel — the matrix never
leaves the executor (SURVEY.md D7).
"""

from __future__ import annotations

import numpy as np
from zlib import crc32


class SurrogateAttentionProvider:
    def __init__(self, seed: int = 1266, head_type: str = "mean", layer_id: int = -1):
        # layer/head knobs perturb the surrogate deterministically so config
        # changes change outputs (as they would with a real model)
        mix = crc32(f"{head_type}|{layer_id}".encode())
        self.salt = np.uint64((seed * 0xFF51AFD7ED558CCD + mix) & 0xFFFFFFFFFFFFFFFF)

    def attention(self, tokens: list[str]) -> np.ndarray:
        n = len(tokens)
        codes = np.array([crc32(t.encode("utf-8")) for t in tokens], dtype=np.uint64)
        i = np.arange(n, dtype=np.uint64)
        # 64-bit mix of (token_i, token_j, pos_i, pos_j, seed)
        a = codes * np.uint64(0x9E3779B97F4A7C15)
        b = codes * np.uint64(0xC2B2AE3D27D4EB4F)
        h = (a[:, None] ^ np.roll(b, 1)[None, :]) + (i[:, None] * np.uint64(0x165667B19E3779F9))
        h ^= (i[None, :] + np.uint64(1)) * np.uint64(0x27D4EB2F165667C5)
        h ^= self.salt
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)  # uniform [0,1)
        # locality prior: adjacent tokens attend more (smooths beams toward
        # contiguous relations, like real transformer attention does)
        ii = np.arange(n, dtype=np.float64)
        dist = np.abs(ii[:, None] - ii[None, :])
        logits = 2.0 * u + 3.0 / (1.0 + dist)
        logits -= logits.max(axis=1, keepdims=True)
        e = np.exp(logits)
        att = e / e.sum(axis=1, keepdims=True)
        return att


class HFAttentionProvider:
    """Production path: real transformer attention (layer select + head agg
    exactly as reference kgm.py:30-44). Requires torch + transformers."""

    def __init__(self, model_name: str, head_type: str = "mean", layer_id: int = -1):
        try:
            import torch  # noqa: F401
            from transformers import AutoModel, AutoTokenizer  # noqa: F401
        except ImportError as e:  # pragma: no cover - sandbox has no torch
            raise NotImplementedError(
                "HFAttentionProvider requires torch+transformers; use the "
                "'surrogate' provider in environments without them"
            ) from e
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_name, use_fast=True)
        self.model = AutoModel.from_pretrained(model_name, output_attentions=True)
        self.model.eval()
        self.head_type = head_type
        self.layer_id = layer_id

    def attention(self, tokens: list[str]) -> np.ndarray:  # pragma: no cover
        torch = self.torch
        ids = self.tokenizer.convert_tokens_to_ids(tokens)
        with torch.no_grad():
            out = self.model(input_ids=torch.tensor([ids]))
        atts = out.attentions
        if self.layer_id == -100:
            layer = torch.stack(atts, dim=0).mean(dim=0)
        else:
            layer = atts[self.layer_id]
        if self.head_type == "mean":
            agg = layer.mean(1)
        elif self.head_type == "max":
            agg = layer.max(1).values
        elif self.head_type == "sum":
            agg = layer.sum(1)
        else:
            raise ValueError("support mean max sum")
        return agg[0].cpu().numpy()


def get_attention_provider(cfg):
    if cfg.attention_provider == "surrogate":
        return SurrogateAttentionProvider(
            seed=cfg.attention_seed,
            head_type=cfg.search_attention_head_type,
            layer_id=cfg.search_layer_id,
        )
    if cfg.attention_provider == "hf":  # pragma: no cover
        return HFAttentionProvider(
            cfg.model_name_or_path,
            head_type=cfg.search_attention_head_type,
            layer_id=cfg.search_layer_id,
        )
    raise ValueError(f"unknown attention provider {cfg.attention_provider}")
