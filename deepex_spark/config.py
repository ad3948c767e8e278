"""Pipeline configuration.

Mirrors the reference's knob surface (ModelArguments dataclass,
reference ``src/deepex/args.py:24-132``) plus the task-level defaults wired
through ``scripts/manager.py:133`` / ``scripts/processing.sh:30-60``:

    task defaults: beam_size=6, dist_const(=--max-distance)=2048,
    search_max_len=256, search_min_len=3, search_layer_id=-1,
    head agg 'mean', search_ranking_type 'sum', dedup_ranking_type
    'score_len', sentence=1, add_extra_entity=1, cand_min_len=3,
    search_cand_type 'entity'.

Library defaults below follow ``args.py`` (beam_size=2, dist_const=2, ...);
``DeepExConfig.task()`` returns the task-tuned configuration.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class DeepExConfig:
    # --- beam search (reference args.py:49-132) ---
    beam_size: int = 2
    search_n: int | None = None          # top-n sequences kept per sentence (None = all)
    search_max_len: int = 20
    search_min_len: int = 3
    search_score_threshold: float = 0.0
    search_ranking_type: str = "sum"     # 'sum' | 'mean'
    dedup_ranking_type: str = "freq"     # freq|score|score_freq|score_freq_len|score_len
    cand_min_len: int = 3                # min words in the 'H [SEP] R [SEP] T' key
    sentence: int = 1                    # split token stream into segments at ! = ?
    add_extra_entity: int = 1            # add first/last non-special tokens as entities
    dist_const: int = 2                  # max #neighbour entities searched per direction
    beam_mode: str = "IE"                # 'IE' | 'RC'

    # --- attention stage (reference kgm.py:30-44, generator.py:92-93) ---
    search_layer_id: int = -1            # -1 last layer, -100 mean of all layers
    search_attention_head_type: str = "max"  # mean|max|sum over heads
    attention_provider: str = "surrogate"    # 'surrogate' (deterministic) | 'hf'
    attention_seed: int = 1266           # master_port in processing.sh, reused as seed
    model_name_or_path: str = "bert-large-cased"

    # --- tokenizer / front-end ---
    max_length: int = 256                # wordpiece truncation (manager.py:133 arg 11)
    wordpiece_max_chars: int = 6         # words longer than this split into ## pieces
    wordpiece_piece_chars: int = 4
    max_mentions_np_len: int = 3         # NP chunker: max tokens per chunk
    max_kernel_tokens: int | None = None  # window over-long sentences (scale guard)
    # sentence-offset mode: 'scan' = reference-faithful first-occurrence
    # instr (O(n_sents x doc_len) serial per doc — the skew bottleneck for
    # mega-docs, EXPLAIN.md §6); 'reconstruct' = linear aligned-offset
    # reconstruction (same sentence TEXT, offsets deviate only on
    # duplicate/embedded sentences); 'auto' (default) = per-doc switch:
    # scan below sentencize_scan_max_len chars, reconstruct above — the
    # scale-safe default (no serial instr term on uncurated crawl)
    sentencize_offsets: str = "auto"
    sentencize_scan_max_len: int = 64 * 1024

    # --- reranking (scripts/bert_contrastive.py) ---
    encoder_provider: str = "surrogate"
    encoder_dim: int = 64
    rerank_sorted: bool = True           # '.sorted' mode (rerank) vs '.unsort'

    # --- kernel output width (scale knob) ---
    # sent_text / triple_key are DERIVABLE payloads: the sentence is needed
    # only by the eval/TSV stages (distill builds the '$input_txt:$ '
    # sentence from it) and triple_key only by corpus_dedup /
    # 'score_freq_len' ranking. Both are pure string freight through the
    # python->JVM Arrow boundary and the docid shuffle — on webtext they are
    # most of the row bytes — so the triples-only production path switches
    # them off (DeepExConfig.small()). Defaults keep the full reference-
    # faithful surface.
    emit_sent_text: bool = True
    emit_triple_key: bool = True

    # --- scale / execution ---
    shuffle_partitions: int = 32
    arrow_max_records: int = 2048        # reference example_batch_size (re_data.py:88)
    repartition_by_url: int | None = None  # repartition(n, xxhash64(url)) after ingest
    salt_buckets: int = 8                # salting for skewed alias joins
    run_id: str = "run0"

    @classmethod
    def task(cls, **overrides) -> "DeepExConfig":
        """Task-tuned defaults, matching ``manager.py:133``'s argument string."""
        base = cls(
            beam_size=6,
            dist_const=2048,
            search_max_len=256,
            search_ranking_type="sum",
            dedup_ranking_type="score_len",
            search_attention_head_type="mean",
            sentence=1,
            add_extra_entity=1,
        )
        return replace(base, **overrides)

    @classmethod
    def small(cls, **overrides) -> "DeepExConfig":
        """Cheap config for smoke checks / benchmarks on word-salad docs:
        task semantics but a bounded pair search (dist_const=2, the library
        default in args.py:130-132) and windowed over-long sentences."""
        base = cls.task(
            dist_const=2,
            max_kernel_tokens=48,
            emit_sent_text=False,
            emit_triple_key=False,
        )
        return replace(base, **overrides)
