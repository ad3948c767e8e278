"""RC-mode kernel (relation classification over FewRel/TACRED-style data).

Re-creates the reference's RC path:

* mentions from gold subject/object token-index spans + alias-matched
  relation candidates (``src/deepex/data/rc.py:24-105``): token runs are
  merged into one mention per span (first-wins non-overlap filter), the
  mention name is the joined surface text;
* wordpiece alignment identical to IE but over the head_/tail_/relation_
  mention lists (``re_data.py:247-326``);
* exhaustive relation-span search ``sim_beam0`` (``kgm.py:422-503``):
  per (head, tail) pair and relation candidate, every contiguous sub-span
  ``relation[l:r]`` is scored ``att[h, r_start] + sum(chain) +
  att[r_end, t]``; best per relation kept, both directions (tail/head
  swapped, then endpoint swap), top ``2 * beam_size`` per pair by
  score/len;
* assembly: head/tail ``.title()``, relation = the matched mention's
  surface text (``kgm.py:124-144`` RC branch), same dedup/ranking as IE.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from deepex_spark.kernel.sentence_kernel import (
    NIL,
    NIL_SPAN,
    entity_segments,
    rank_candidates,
)
from deepex_spark.nlp.tokenizer import encode


@dataclass
class RCFeatures:
    docid: str
    offset: int
    text: str
    tokens: list[str]
    special: list[int]
    head_names: list[str]
    head_spans: list[tuple[int, int]]
    tail_names: list[str]
    tail_spans: list[tuple[int, int]]
    rel_names: list[str]
    rel_spans: list[tuple[int, int]]


def rc_mentions(record: dict) -> dict:
    """Faithful port of RCMentionGenerator.get_mentions_raw_text
    (rc.py:24-105) for one record with keys: tokens, subject_spans
    (token-index lists), object_spans, rel_candidates
    [{aliase, relation, len, char_span}]."""
    tokens = list(record["tokens"])
    entities = []
    idx = 0
    for i, word in enumerate(tokens):
        entities.append(([i, i], word, 1.0, [idx, idx + len(word)]))
        idx += len(word) + 1

    def merge(span_lists):
        ents_out = []
        for ss in span_lists:
            ss_set = set(ss)
            ents = [e for e in entities if e[0][0] in ss_set]
            if not ents:
                continue
            new = (
                [min(e[0][0] for e in ents), max(e[0][1] for e in ents)],
                " ".join(e[1] for e in ents),
                [min(e[3][0] for e in ents), max(e[3][1] for e in ents)],
            )
            if all(e1[2][1] <= new[2][0] or new[2][1] <= e1[2][0] for e1 in ents_out):
                ents_out.append(new)
        return ents_out

    head_ents = merge(record["subject_spans"])
    tail_ents = merge(record["object_spans"])

    rel_ents = []
    # reference groups candidates by relation name then emits one mention
    # per (name, candidate) — duplicates per span are faithful (rc.py:68-81)
    rel_index: dict[str, list] = {}
    for cand in record.get("rel_candidates", []):
        for rname in cand["relation"]:
            rel_index.setdefault(rname, []).append(cand)
    for rname in rel_index:
        for cand in rel_index[rname]:
            cs = cand["char_span"]
            words = [e for e in entities if not (cs[1] <= e[3][0] or e[3][1] <= cs[0])]
            if not words:
                continue
            rel_ents.append(
                (
                    [min(e[0][0] for e in words), max(e[0][1] for e in words)],
                    " ".join(e[1] for e in words),
                    [min(e[3][0] for e in words), max(e[3][1] for e in words)],
                )
            )
    return {
        "text": " ".join(tokens),
        "head": head_ents,
        "tail": tail_ents,
        "relation": rel_ents,
    }


def _align(enc, mentions, offset):
    """Wordpiece -> mention alignment for one mention list (re_data.py
    first-overlap-wins loop). mentions: [(tok_span, name, char_span)]."""
    names, spans = [], []
    for (ts, te), is_special in zip(enc.offsets, enc.special_mask):
        if is_special or (ts == 0 and te == 0):
            names.append(NIL)
            spans.append(NIL_SPAN)
            continue
        hit = False
        for _tok_span, name, (ms, me) in mentions:
            if ms == -1 and me == -1:
                continue
            if me > ts and ms < te:
                names.append(name)
                spans.append((ms + offset, me + offset))
                hit = True
                break
        if not hit:
            names.append(NIL)
            spans.append(NIL_SPAN)
    return names, spans


def featurize_rc(docid: str, offset: int, record: dict, cfg) -> RCFeatures:
    m = rc_mentions(record)
    text = m["text"]
    enc = encode(
        text,
        max_length=cfg.max_length,
        wordpiece_max_chars=cfg.wordpiece_max_chars,
        wordpiece_piece_chars=cfg.wordpiece_piece_chars,
    )
    hn, hs = _align(enc, m["head"], offset)
    tn, ts_ = _align(enc, m["tail"], offset)
    rn, rs = _align(enc, m["relation"], offset)
    return RCFeatures(
        docid=docid,
        offset=offset,
        text=text,
        tokens=enc.tokens,
        special=enc.special_mask,
        head_names=hn,
        head_spans=hs,
        tail_names=tn,
        tail_spans=ts_,
        rel_names=rn,
        rel_spans=rs,
    )


def _group_by_span(seg, spans):
    """Distinct-span token groups in segment order (kgm.py:436-476)."""
    groups = []
    for k, i in enumerate(seg):
        new = True
        group = []
        for p, j in enumerate(seg):
            if spans[i] == spans[j]:
                if p < k:
                    new = False
                    break
                group.append(j)
        if new:
            groups.append(group)
    return groups


def _sim_beam0(head, relation, tail, att, offset):
    """Exhaustive contiguous sub-span scoring (kgm.py:478-489)."""
    beam_score = -1.0
    beam = None
    for r in range(1, len(relation) + 1):
        for l in range(r):
            part = relation[l:r]
            rel_score = sum(att[i - offset][j - offset] for i, j in zip(part, part[1:]))
            for h in head:
                for t in tail:
                    score = float(
                        att[h - offset][part[0] - offset]
                        + rel_score
                        + att[part[-1] - offset][t - offset]
                    )
                    if score > beam_score:
                        beam_score = score
                        beam = [[h] + part + [t], score, True]
    return beam


def beam_search_rc(att: np.ndarray, feat: RCFeatures, cfg):
    """RC pair/relation enumeration (kgm.py:422-503). Returns filtered
    [(path_tuple, score)] like beam_search_ie."""
    h_eid, h_segs = entity_segments(feat, cfg, names=feat.head_names, add_extra=False)
    t_eid, t_segs = entity_segments(feat, cfg, names=feat.tail_names, add_extra=False)
    r_eid, r_segs = entity_segments(feat, cfg, names=feat.rel_names, add_extra=False)
    if h_eid is None or t_eid is None or r_eid is None:
        return []
    offset = min(h_eid[0], t_eid[0], r_eid[0])
    bound = max(h_eid[-1], t_eid[-1], r_eid[-1])
    win = att[offset : bound + 1, offset : bound + 1]
    if "gpt2" in cfg.model_name_or_path:
        # GPT-2 causal attention: fold the transpose's strict upper
        # triangle back in (kgm.py:432-434)
        win = win + np.triu(win.T, k=1)
    pruned = win.tolist()
    res = []
    for h_seg, r_seg, t_seg in zip(h_segs, r_segs, t_segs):
        heads = _group_by_span(h_seg, feat.head_spans)
        tails = _group_by_span(t_seg, feat.tail_spans)
        relations = _group_by_span(r_seg, feat.rel_spans)
        for head in heads:
            for tail in tails:
                cur = []
                for relation in relations:
                    b1 = _sim_beam0(head, relation, tail, pruned, offset)
                    if b1 is not None:
                        cur.append(b1)
                    b2 = _sim_beam0(tail, relation, head, pruned, offset)
                    if b2 is not None:
                        # endpoint swap (kgm.py:499)
                        b2[0][0], b2[0][-1] = b2[0][-1], b2[0][0]
                        cur.append(b2)
                cur.sort(key=lambda x: -x[1] / len(x[0]))
                res.extend(cur[: cfg.beam_size * 2])
    out = []
    for path, score, _v in res:
        L = len(path)
        if cfg.search_min_len <= L <= cfg.search_max_len:
            s = score / L if cfg.search_ranking_type == "mean" else score
            if s > cfg.search_score_threshold:
                out.append((tuple(path), s))
    out.sort(key=lambda t: t[1], reverse=True)
    if cfg.search_n is not None and cfg.search_n != "None":
        out = out[: cfg.search_n]
    return out


def assemble_rc(seqs, feat: RCFeatures, cfg):
    """RC triple assembly + per-sentence dedup (kgm.py:124-144 RC branch,
    221-265). No direction flip in RC; score clamp quirk applies."""
    dedup: dict[str, list] = {}
    for path, score in seqs:
        p = list(path)
        if len(p) < 3:
            continue
        s = score if score <= 1.0 else 1.0
        h = feat.head_names[p[0]]
        t = feat.tail_names[p[-1]]
        r = feat.rel_names[p[1]]
        h_span = feat.head_spans[p[0]]
        t_span = feat.tail_spans[p[-1]]
        if h == NIL or t == NIL or r == NIL:
            continue
        if h_span == t_span:
            continue
        if h_span == NIL_SPAN or t_span == NIL_SPAN:
            continue
        key = (h.title() + " [SEP] " + r + " [SEP] " + t.title()).strip()
        attended = len(p)
        if key not in dedup:
            dedup[key] = [1, s, [list(h_span), list(t_span)], attended]
        else:
            e = dedup[key]
            e[0] += 1
            e[1] += s
            e[3] += attended
    return rank_candidates(dedup, cfg)


def process_rc_record(docid: str, record: dict, cfg, att_provider) -> list[dict]:
    feat = featurize_rc(docid, 0, record, cfg)
    att = att_provider.attention(feat.tokens)
    seqs = beam_search_rc(att, feat, cfg)
    if not seqs:
        return []
    rows = []
    for rank, (key, freq, score, h_span, t_span, attended) in enumerate(assemble_rc(seqs, feat, cfg)):
        h, r, t = (part.strip() for part in key.split("[SEP]"))
        rows.append(
            {
                "docid": docid,
                "sent_offset": 0,
                "sent_text": feat.text,
                "triple_key": key,
                "subj": h,
                "rel": r,
                "obj": t,
                "subj_s": h_span[0],
                "subj_e": h_span[1],
                "obj_s": t_span[0],
                "obj_e": t_span[1],
                "freq": freq,
                "score": float(score),
                "attended_len": attended,
                "cand_rank": rank,
            }
        )
    return rows
