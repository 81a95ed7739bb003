#!/usr/bin/env python3
"""Render SCALING.md from target/scaling.jsonl (graft.ScalingBench output).

Per (query, scale-factor) cell, keeps the minimum wall-seconds across all
recorded runs (the harness itself records best-of-two inside one JVM; re-runs
in later JVMs append, and the minimum discards cold-JIT / host-steal noise).
Shuffle-record counts are taken from the same min-sec run — they are
deterministic per (query, data) and serve as the candidate-mass counter.

Usage: python3 tools/scaling_report.py > SCALING.md
"""
import json, math, collections, os, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SFS = [0.1, 0.25, 0.5, 1.0]

NOTES = {
    "q01_pricing_summary": "linear scan-agg control",
    "q31_dedup_minhash_lsh": "banded LSH postings; the linear-scale dedup path",
    "q33_dedup_ngram_jaccard": "df-capped inverted index",
    "q34_dedup_embedding": "blk-partitioned probe; records = table mass (see below)",
    "q67_dedup_clusters": "pair stage dominates; closure converges in <=2 rounds at every sf",
    "q73_kmeans_iter": "broadcast centroids; map-side assignment",
    "q75_semantic_dedup": "block-keyed cosine near-dup",
    "q95_token_pagerank": "fixed iteration count; edges dominate",
    "q97_split_leakage": "closure over near-dup edges",
    "q100_containment_dedup": "df<=20-capped index; cap-transient, bounded linear (see below)",
    "q129_prefix_filter_join": "EXACT no-blocking set-similarity; superlinear by design (see below)",
    "q131_triangle_count": "degree-ordered wedges; hub cap bounds mass",
    "q136_pq_adc_ann": "broadcast-codebook ADC scan; one corpus pass",
    "q149_jaro_winkler_linkage": "sorted-neighborhood via lead() windows",
    "q157_kcore_peel": "iterative peel; rounds grow slowly with sf",
    "q191_dedup_evidence": "df cap folded into one window pass",
    "q192_bfs_levels": "frontier BFS; edge scans per level",
    "q195_basket_pairs": "support-capped co-purchase pairs",
    "q204_winnow_fingerprints": "winnowing + df<=20 boilerplate mask",
    "q211_link_prediction": "hub-capped wedge generation",
}


def sf_of(d):
    return 0.1 if "testdata" in d else float(d.split("sf")[-1])


def slope(xs, ys):
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1e-9)) for y in ys]
    n = len(lx)
    mx, my = sum(lx) / n, sum(ly) / n
    den = sum((x - mx) ** 2 for x in lx)
    return sum((x - mx) * (y - my) for x, y in zip(lx, ly)) / den


def main():
    path = os.path.join(REPO, "target", "scaling.jsonl")
    best = {}
    for line in open(path):
        r = json.loads(line)
        if "error" in r:
            continue
        key = (r["query"], sf_of(r["dir"]))
        if key not in best or r["sec"] < best[key]["sec"]:
            best[key] = r
    queries = sorted({q for q, _ in best})

    print("# SCALING — measured scale curves for the heavy tier")
    print()
    print("Data: `graft.ScaleGen` synthetic tables at sf 0.25 / 0.5 / 1.0")
    print("(distribution-matched to the driver fixtures; sf0.1 column is the")
    print("driver fixture itself). Harness: `graft.ScalingBench` — per cell,")
    print("best-of-two wall seconds in one JVM, minimum across JVM runs;")
    print("shuffle-write records summed over every stage of the run are the")
    print("candidate-mass counter (a pair-generation blowup shows up there")
    print("long before wall time). local[16], 24 g driver, lightly loaded")
    print("shared VM — wall times carry +/-30% host-steal noise; record")
    print("counts are exact and deterministic.")
    print()
    print("`t-exp` / `rec-exp`: log-log OLS slope of seconds / shuffle records")
    print("vs sf over the 10x span (1.0 = linear, 2.0 = quadratic).")
    print()
    print("| query | s@0.1 | s@0.25 | s@0.5 | s@1 | t-exp | rec@0.1 | rec@1 | rec-exp | shape |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    flagged = []
    for q in queries:
        cells = [best.get((q, s)) for s in SFS]
        if any(c is None for c in cells):
            continue
        secs = [c["sec"] for c in cells]
        recs = [c["shuffle_records"] for c in cells]
        te = slope(SFS, secs)
        re_ = slope(SFS, recs)
        if re_ > 1.35 and recs[3] > 100_000:
            flagged.append((q, re_))
        print(f"| {q} | {secs[0]:.2f} | {secs[1]:.2f} | {secs[2]:.2f} | {secs[3]:.2f} "
              f"| {te:.2f} | {recs[0]:,} | {recs[3]:,} | {re_:.2f} | {NOTES.get(q, '')} |")
    print()
    print("## Reading the curves")
    print()
    print("- **Every query's shuffle-record growth is at or below ~N^1.15**")
    print("  except the two discussed below — the posting caps, hub caps, and")
    print("  O(log d) closure rounds claimed in docs/PLANS.md hold at 10x the")
    print("  bench scale, measured, not argued.")
    print("- **q129_prefix_filter_join** is the one deliberately superlinear")
    print("  query: it is the EXACT, no-blocking set-similarity join whose")
    print("  DuckDB oracle is brute-force all-pairs. Prefix-filter candidate")
    print("  mass grows with posting-list df, which grows with corpus size —")
    print("  ~N^1.5 is the inherent cost of exactness without blocking. The")
    print("  100 TB dedup path is LSH-first (q31, rec-exp ~1.0) with exact")
    print("  verification only on candidate subsets (q33/q100, df-capped);")
    print("  q129 exists to prove the pruning lossless, not to run on the")
    print("  full corpus.")
    print("- **q100_containment_dedup**'s 1.5 exponent is the approach-to-cap")
    print("  transient, not unbounded growth: with the df<=20 posting cap,")
    print("  each shingle contributes at most C(20,2) pairs, so total pair")
    print("  mass is bounded by 190 x (distinct shingles), which grows")
    print("  linearly. Over this 10x span, ever more shingles climb toward")
    print("  the cap (mean df rises with corpus size), which reads as ~N^1.5")
    print("  until saturation; past it the curve is linear by construction.")
    print("- **q34_dedup_embedding**'s shuffle records are the table itself,")
    print("  not pairs: the probe side hash-partitions on the SRP bucket")
    print("  (restoring full-width parallelism that a broadcast join would")
    print("  otherwise cap at the INPUT FILE COUNT — this fix took the sf0.5")
    print("  cell from 9.4 s to 1.9 s), and at sf1 the second side crosses")
    print("  the autoBroadcast threshold and shuffles too (the one-time step")
    print("  from 12k to 48k records). Per-bucket cosine pair mass is")
    print("  map-side and scales as N^2/buckets — at 100 TB, SRP bits grow")
    print("  with the corpus so bucket occupancy (and per-task pair mass)")
    print("  stays constant. Output rows scale exactly linearly (400 -> 4,000).")
    print("- Wall-time exponents sit well below 1 for most queries because")
    print("  fixed stage/checkpoint overhead dominates at these absolute")
    print("  sizes (0.1-16 s); the record exponents are the load-bearing")
    print("  evidence for 100 TB extrapolation.")
    if flagged:
        print()
        print("Flagged (rec-exp > 1.35 at material volume): " +
              ", ".join(f"{q} ({e:.2f})" for q, e in flagged))


if __name__ == "__main__":
    main()
