"""Write BENCH/BASELINE.md from the best clean interleaved round in
BENCH/scaling_attempts.jsonl.

The box's wall-clock throughput varies ~2x on minute timescales: bursty
hypervisor steal (tagged per sample) plus slower phase drift in overall
box speed that hits BOTH parallelism levels multiplicatively. Cross-phase
pairing of per-level minima therefore biases the ratio; the honest
estimator is the WITHIN-ROUND ratio — each t8 sample paired with the
nearest-in-time t32 sample (interleaved, minutes apart, same phase),
pairs restricted to the SAME git revision and SAME triple count (a pair
across code revisions compares different work), both levels clean
(steal < 1%), gap < 15 min — quoted as the MEDIAN clean-pair ratio
(picking the max of noisy ratios would be an upward-biased estimator).

Usage: python tools/quote_scaling.py [git_rev_prefix ...] [--n-docs N]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "BENCH/scaling_attempts.jsonl"


def main():
    args = sys.argv[1:]
    n_docs = 240000
    # BENCH/BASELINE.md is a CURATED document (clean-pair tables, 960k
    # corpus-robustness notes, per-round provenance); regenerating it from
    # this template DESTROYS that curation, so overwriting is opt-in —
    # without --write this tool only prints the quote JSON.
    write_md = "--write" in args
    if write_md:
        args.remove("--write")
    if "--n-docs" in args:
        i = args.index("--n-docs")
        n_docs = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    revs = tuple(args)
    samples = []
    n_samples: dict[int, int] = {}
    for line in open(LOG):
        r = json.loads(line)
        if r["n_docs"] != n_docs:
            continue
        if revs and not str(r.get("git_rev", "")).startswith(revs):
            continue
        n_samples[r["threads"]] = n_samples.get(r["threads"], 0) + 1
        samples.append(r)
    samples.sort(key=lambda r: r["ts"])
    # pair each t8 with the nearest-in-time t32 (same interleaved round ==
    # same host phase); quote the best CLEAN pair
    pairs = []
    t32s = [r for r in samples if r["threads"] == 32]
    for r8 in (r for r in samples if r["threads"] == 8):
        # same code revision + same output: the ratio is only meaningful
        # when both sides ran the identical job on the identical input
        cands = [
            r for r in t32s
            if r.get("git_rev") == r8.get("git_rev")
            and r["n_triples"] == r8["n_triples"]
        ]
        if not cands:
            continue
        r32 = min(cands, key=lambda r: abs(r["ts"] - r8["ts"]))
        pairs.append((r8, r32, abs(r32["ts"] - r8["ts"])))
    # steal is an EXOGENOUS, per-run-measured corruption (hypervisor CPU
    # theft tagged from /proc/stat deltas), so filtering on it is excluding
    # corrupted measurements, not cherry-picking outcomes. Same for the
    # hw_mops canary (round 4): an all-core busy-loop measured BEFORE each
    # run — the box sometimes degrades all-core throughput ~40% with <1%
    # reported steal, and the canary tags those windows without ever
    # seeing the measurement it guards. Tiered thresholds: prefer rounds
    # where both levels ran steal-free (<1%) and at full canary speed
    # (>= 90% of the best observed), fall back to <5% steal, then to
    # everything — always the MEDIAN ratio within the tier, always
    # labeled with the tier used.
    in_window = [(a, b) for a, b, gap in pairs if gap < 900]
    if not in_window:
        raise SystemExit(f"no pairs among {len(pairs)}: {n_samples}")
    hw_vals = [r["hw_mops"] for pair in in_window for r in pair if "hw_mops" in r]
    hw_ref = max(hw_vals) if hw_vals else None

    def hw_ok(r) -> bool:
        # legacy samples (pre-canary, or the scale-bug 0.0s) carry no
        # usable tag; the steal filter is their only exogenous signal
        return not r.get("hw_mops") or (hw_ref and r["hw_mops"] >= 0.9 * hw_ref)

    steal_note = ""
    for cap in (1.0, 5.0):
        clean = [(a, b) for a, b in in_window
                 if a["steal_pct"] < cap and b["steal_pct"] < cap
                 and hw_ok(a) and hw_ok(b)]
        if clean:
            if cap > 1.0:
                steal_note = (
                    f"No fully steal-clean round available this session — "
                    f"quoting the median of rounds with both levels under "
                    f"{cap:.0f}% hypervisor steal ({len(clean)} of "
                    f"{len(in_window)} rounds). "
                )
            break
    else:
        clean = in_window
        steal_note = (
            "**No steal-clean round available** — every sampled local[32] "
            "window lost CPU to the hypervisor (see steal column); the "
            "quoted efficiency is as-measured under that theft. "
        )
    # median ratio, quoted FROM the pair that realizes it (len//2 of the
    # ratio-sorted list) — an even count quotes the lower-middle pair, the
    # conservative side of the two medians
    clean.sort(key=lambda p: p[0]["sec"] / p[1]["sec"])
    b8, b32 = clean[(len(clean) - 1) // 2]
    assert b8["n_triples"] == b32["n_triples"] and b8.get("git_rev") == b32.get("git_rev")
    eff = (b8["sec"] / b32["sec"]) / 4
    # steal-corrected: approximate each run's quiet-host wall time by its
    # busy share (1 - steal); exact if theft is uniform over the run
    corr8 = b8["sec"] * (1 - b8["steal_pct"] / 100.0)
    corr32 = b32["sec"] * (1 - b32["steal_pct"] / 100.0)
    eff_corr = (corr8 / corr32) / 4
    # ceiling: keep the most recently measured one unless re-run
    ceiling = float(os.environ.get("HW_CEILING", "0.835"))
    out = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "queries": {"local[8]": b8["sec"], "local[32]": b32["sec"]},
        "n_docs": n_docs,
        "hw_ceiling": ceiling,
        "normalized_efficiency": round(eff / ceiling, 3),
        "steal_corrected_efficiency": round(eff_corr, 3),
        "n_clean_pairs": len(clean),
        "n_samples": n_samples,
        "detail": {"8": b8, "32": b32},
    }
    if not write_md:
        print(json.dumps(out))
        return
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured throughput & scaling\n\n"
            "Protocol (BASELINE.md): identical end-to-end triple-extraction "
            "job (pages -> normalize -> sentencize -> fused beam-search "
            "kernel -> distill -> contrastive rerank) on identical input at "
            "two parallelism levels — the sandbox substitute for N vs 4N "
            "executors. Input: deterministic synthetic Common-Crawl-style "
            f"corpus, {n_docs} pages, seed 42 (FIXTURES.md F10); corpus "
            "sized so the 32-thread run lasts >60s (a scaling measurement "
            "needs enough work per core to amortize fixed stage overhead).\n\n"
            "| parallelism | triples | wall sec | triples/sec | hypervisor steal % |\n"
            "|---|---|---|---|---|\n"
            f"| local[8] | {b8['n_triples']} | {b8['sec']} | {b8['rate']} | {b8['steal_pct']} |\n"
            f"| local[32] | {b32['n_triples']} | {b32['sec']} | {b32['rate']} | {b32['steal_pct']} |\n\n"
            f"MEDIAN of {len(clean)} CLEAN interleaved rounds (both levels "
            "< 1% hypervisor steal, measured minutes apart in the same host "
            "phase, same git revision, identical triple count) out of "
            f"{n_samples.get(8, 0)}x local[8] and {n_samples.get(32, 0)}x "
            "local[32] samples (BENCH/scaling_attempts.jsonl logs every "
            "sample; the box loses 0-23% of CPU in steal bursts and its "
            "overall speed drifts by phase, so the within-round ratio is "
            "phase-free and the median over clean rounds avoids picking a "
            "lucky tail).\n\n"
            + steal_note +
            f"Scaling efficiency (rate32/rate8)/4 = **{eff:.3f}** "
            "(target >= 0.8 for a real N->4N executor scale-out); "
            f"steal-corrected (each run scaled by its busy share 1-steal): "
            f"**{eff_corr:.3f}**.\n\n"
            "**Hardware scaling reference on this box** (pure-Python "
            f"busy-loop throughput, 32 vs 8 processes, /4): **{ceiling:.3f}** "
            "— all-cores turbo is lower than 8-core turbo and the "
            "hypervisor taxes full-box usage, so single-box ratios "
            "undershoot 1.0 for reasons a real 4N-executor scale-out (more "
            "machines) does not share. It is an indicative envelope for a "
            "pure-CPU workload, not a hard bound: a mixed JVM+Python "
            "pipeline can exceed it when its 8-thread baseline leaves less "
            "headroom than the busy-loop's. Efficiency relative to it: "
            f"**{eff/ceiling:.3f}**.\n\n"
            "Single-box caveats (documented because the sandbox substitutes "
            "cores for executors): at full 32-thread saturation the "
            "JVM<->python-worker Arrow IPC turns syscall-bound and the "
            "executor JVM competes with the python workers for the same "
            "cores. Mitigations: single fused Python stage (kernel + "
            "contrastive distance), per-sentence struct-of-arrays Arrow "
            "batching (sentence bytes cross the boundary once per sentence), "
            "Arrow batches 8192, 1 MiB IO buffers, python-worker warm-up. "
            "On a real cluster, size executor cores below node cores for "
            "pandas-UDF-heavy stages (standard practice).\n\n"
            "Determinism: the job's output is partition-count invariant "
            "(tests/test_parity.py), so all runs produce identical triples.\n"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
