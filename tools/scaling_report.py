#!/usr/bin/env python3
"""Render SCALING.md from target/scaling.jsonl (graft.ScalingBench output).

Per (query, scale-factor) cell, keeps the minimum wall-seconds across all
recorded runs (the harness itself records best-of-two inside one JVM; re-runs
in later JVMs append, and the minimum discards cold-JIT / host-steal noise).
Shuffle-record counts are taken from the same min-sec run — they are
deterministic per (query, data) and serve as the candidate-mass counter.

Everything numeric in the output is COMPUTED from the jsonl — the report
carries no hand-written measurements, so re-running it against fresh data
cannot reprint stale numbers. Interpretation prose lives in
docs/SCALING_NOTES.md and is appended verbatim (marked as such).

Usage: python3 tools/scaling_report.py > SCALING.md
"""
import json, math, os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SFS = [0.1, 0.25, 0.5, 1.0]   # the core span every query is measured on
FLAG_EXP = 1.35                    # rec-exp above this at material volume → flagged
FLAG_MIN_RECS = 100_000
LINEARISH = 1.15                   # the "at or below ~N^x" summary threshold

# Design-shape labels (what the operator IS, not what was measured)
NOTES = {
    "q01_pricing_summary": "linear scan-agg control",
    "q31_dedup_minhash_lsh": "banded LSH postings; the linear-scale dedup path",
    "q33_dedup_ngram_jaccard": "blocked inverted index (source x length bucket)",
    "q34_dedup_embedding": "blk-partitioned probe; records = table mass",
    "q67_dedup_clusters": "pair stage dominates; shallow closure",
    "q73_kmeans_iter": "broadcast centroids; map-side assignment",
    "q75_semantic_dedup": "block-keyed cosine near-dup, rank-window refinement",
    "q95_token_pagerank": "fixed iteration count; edges dominate",
    "q97_split_leakage": "closure over near-dup edges",
    "q100_containment_dedup": "df<=20 boilerplate mask (round 6)",
    "q129_prefix_filter_join": "EXACT no-blocking set-similarity; superlinear by design",
    "q131_triangle_count": "degree-ordered wedges; hub cap bounds mass",
    "q136_pq_adc_ann": "broadcast-codebook ADC scan; one corpus pass",
    "q149_jaro_winkler_linkage": "block-keyed sorted-neighborhood lead() windows",
    "q157_kcore_peel": "iterative peel; rounds grow slowly with sf",
    "q191_dedup_evidence": "df cap folded into one window pass",
    "q192_bfs_levels": "frontier BFS; edge scans per level",
    "q186_k_anonymity": "zipWithIndex rank; no single-partition window (round 6)",
    "q193_behavior_alignment": "two-bucket rank pairs; was a nested-loop theta join (round 6)",
    "q106_rfm_segments": "3x range-partitioned rank + ntile arithmetic; was 3x global ntile (round 7)",
    "q156_zorder_skipping": "rank-arithmetic file bins; was 3x global ntile (round 7)",
    "q153_rrf_hybrid": "range-partitioned rank fusion; was a global row_number (round 7)",
    "q195_basket_pairs": "support-capped co-purchase pairs",
    "q204_winnow_fingerprints": "winnowing + df<=20 boilerplate mask",
    "q211_link_prediction": "hub-capped wedge generation",
    "q224_ppjoin_stratum": "exact PPJoin on a fixed md5 decile; q129's audit at 1/10^1.5 the pair mass",
    "q225_greedy_admission": "frontier-fixpoint kernel admission over LSH pairs (round 7)",
    "q226_eval_contamination": "bloom-pruned eval/train 5-gram overlap join (round 7)",
    "q227_exact_substring_spans": "window-count shuffle + doc-partitioned island merge (round 7)",
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
    best, diverse = {}, {}
    for line in open(path):
        r = json.loads(line)
        if "error" in r:
            continue
        key = (r["query"], sf_of(r["dir"]))
        tgt = diverse if "diverse" in r["dir"] else best
        if key not in tgt or r["sec"] < tgt[key]["sec"]:
            tgt[key] = r
    queries = sorted({q for q, _ in best})
    extra_sfs = sorted({s for _, s in best if s not in BASE_SFS})

    print("# SCALING — measured scale curves for the heavy tier")
    print()
    print("Data: `graft.ScaleGen` synthetic tables (distribution match to the")
    print("driver fixture asserted by `ScaleGenFidelitySpec`); the sf0.1 column")
    print("is the driver fixture itself. Harness: `graft.ScalingBench` — per")
    print("cell, best-of-two wall seconds in one JVM, minimum across JVM runs;")
    print("shuffle-write records summed over every stage of the run are the")
    print("candidate-mass counter (a pair-generation blowup shows up there")
    print("long before wall time). local[16], shared VM — wall times carry")
    print("+/-30% host-steal noise; record counts are exact and deterministic.")
    print()
    print("`t-exp` / `rec-exp`: log-log OLS slope of seconds / shuffle records")
    print(f"vs sf over the {BASE_SFS[0]}-{BASE_SFS[-1]} span "
          "(1.0 = linear, 2.0 = quadratic).")
    print()
    hdr = ["query"] + [f"s@{s:g}" for s in BASE_SFS] + ["t-exp"] + \
        [f"rec@{BASE_SFS[0]:g}", f"rec@{BASE_SFS[-1]:g}", "rec-exp", "shape"]
    print("| " + " | ".join(hdr) + " |")
    print("|" + "---|" * len(hdr))
    flagged = []
    linear_count = 0
    for q in queries:
        cells = [best.get((q, s)) for s in BASE_SFS]
        if any(c is None for c in cells):
            continue
        secs = [c["sec"] for c in cells]
        recs = [c["shuffle_records"] for c in cells]
        te = slope(BASE_SFS, secs)
        re_ = slope(BASE_SFS, recs)
        if re_ > FLAG_EXP and recs[-1] > FLAG_MIN_RECS:
            flagged.append((q, re_))
        if re_ <= LINEARISH:
            linear_count += 1
        print(f"| {q} | " + " | ".join(f"{s:.2f}" for s in secs) +
              f" | {te:.2f} | {recs[0]:,} | {recs[-1]:,} | {re_:.2f} "
              f"| {NOTES.get(q, '')} |")
    print()

    if extra_sfs:
        print(f"## Extended span (sf {', '.join(f'{s:g}' for s in extra_sfs)})")
        print()
        print("Per-doubling shuffle-record exponents beyond the core span, for")
        print("the queries measured there (saturation evidence for posting")
        print("caps: a capped index's exponent must FALL as the cap binds):")
        print()
        print("| query | span | rec ratio | rec-exp | sec | rows |")
        print("|---|---|---|---|---|---|")
        for q in queries:
            pts = sorted((s, best[(q, s)]) for s in [1.0] + extra_sfs
                         if (q, s) in best)
            for (s0, c0), (s1, c1) in zip(pts, pts[1:]):
                # guard both ends: a zero-record cell would otherwise
                # crash the whole report with a log(0) domain error
                rr = max(c1["shuffle_records"], 1) / max(c0["shuffle_records"], 1)
                e = math.log(rr) / math.log(s1 / s0)
                print(f"| {q} | sf{s0:g}→sf{s1:g} | x{rr:.2f} | {e:.2f} "
                      f"| {c1['sec']:.2f} | {c1['rows']:,} |")
        print()

    if diverse:
        print("## Diverse-vocabulary control corpus (graft.DiverseGen)")
        print()
        print("Same doc-length and dup-injection structure as the fixture but")
        print("the vocabulary grows with the corpus (like real text), so the")
        print("3-shingle space does NOT saturate. Per-doubling record")
        print("exponents for the uncapped exact queries — the control for the")
        print("claim that their sf2-sf4 drift on the fixture corpus is shingle-")
        print("space saturation, not operator design:")
        print()
        print("| query | span | rec ratio | rec-exp | sec | rows |")
        print("|---|---|---|---|---|---|")
        dqueries = sorted({q for q, _ in diverse})
        for q in dqueries:
            pts = sorted((s, diverse[(q, s)]) for s in {s for _, s in diverse}
                         if (q, s) in diverse)
            for (s0, c0), (s1, c1) in zip(pts, pts[1:]):
                # guard both ends: a zero-record cell would otherwise
                # crash the whole report with a log(0) domain error
                rr = max(c1["shuffle_records"], 1) / max(c0["shuffle_records"], 1)
                e = math.log(rr) / math.log(s1 / s0)
                print(f"| {q} | sf{s0:g}→sf{s1:g} | x{rr:.2f} | {e:.2f} "
                      f"| {c1['sec']:.2f} | {c1['rows']:,} |")
        print()

    total = sum(1 for q in queries if all((q, s) in best for s in BASE_SFS))
    print("## Computed summary")
    print()
    print(f"- {linear_count}/{total} queries have rec-exp <= {LINEARISH} over "
          f"the {BASE_SFS[-1] / BASE_SFS[0]:.0f}x core span.")
    if flagged:
        print(f"- Flagged (rec-exp > {FLAG_EXP} at material volume): " +
              ", ".join(f"{q} ({e:.2f})" for q, e in flagged))
    else:
        print(f"- Flagged (rec-exp > {FLAG_EXP} at material volume): none.")
    print()

    notes = os.path.join(REPO, "docs", "SCALING_NOTES.md")
    if os.path.exists(notes):
        print("## Reading the curves (maintained in docs/SCALING_NOTES.md)")
        print()
        print(open(notes).read().rstrip())


if __name__ == "__main__":
    main()
