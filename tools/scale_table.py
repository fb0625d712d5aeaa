#!/usr/bin/env python3
"""Assemble the measured-vs-predicted scaling table (r14 verdict #1).

Reads three bench artifacts produced by the same SPARK_GRAFT_BENCH_ONLY
heavy-query list at generated sf0.01/sf0.1/sf1 (tools/gen_scale.py) and
prints, per query:

  - warm-median wall at each scale and the per-decade wall ratios
  - shuffle ROW volume (probe sh_read_rows, warm rep) and its ratios —
    the candidate-pair/exchange-volume evidence, immune to host speed
  - the measured exponent  e = log10(metric_sf1 / metric_sf0.01) / 2
    (two decades), against the predicted exponent per query

Predictions (1.0 = linear in sf unless stated):
  q_j11_interval_bucket_join is ~2.0 BY DESIGN on the shuffle-rows axis:
  matches-per-point grows with range density, so pairs ∝ sf². Everything
  else in the heavy family is banded/bucketed/routed → ~1.0.

Usage: python3 tools/scale_table.py SF001.json SF01.json SF1.json
"""
import json
import math
import sys

PREDICTED = {
    "q_j11_interval_bucket_join": 2.0,
}
DEFAULT_PRED = 1.0


def warm_probe_rows(art, q):
    probes = art.get("queries_probe", {}).get(q)
    if not probes:
        return None
    warm = probes[1:] or probes
    vals = sorted(p.get("sh_read_rows", 0) + p.get("sh_write_rows", 0)
                  for p in warm)
    return vals[len(vals) // 2]


def main():
    allow_untagged = "--allow-untagged" in sys.argv
    paths = [p for p in sys.argv[1:] if p != "--allow-untagged"][:3]
    arts = [json.load(open(p)) for p in paths]
    # provenance gate (r15 verdict #7): artifacts carry the sf dir's
    # generator metadata since r16 — refuse to build an exponent table
    # over mixed generator versions/seeds, where ratios are meaningless.
    # r17 (advisor): ALSO refuse when tagged and untagged (pre-r16)
    # artifacts are mixed — a generator-null artifact could hide a
    # cross-generator mix; --allow-untagged is the explicit override for
    # deliberately comparing against a pre-r16 artifact.
    gens = [a.get("generator") for a in arts]
    tagged = [(g.get("generator"), g.get("seed")) for g in gens if g]
    if len(set(tagged)) > 1:
        sys.exit(f"REFUSING: mixed generator provenance: {sorted(set(tagged))}")
    if tagged and gens.count(None) and not allow_untagged:
        sys.exit(f"REFUSING: {gens.count(None)} untagged artifact(s) mixed "
                 "with tagged ones — provenance unverifiable; pass "
                 "--allow-untagged to compare against pre-r16 artifacts "
                 "deliberately")
    print(f"# generator: {sorted(set(tagged)) or 'untagged (pre-r16 artifacts)'}"
          f"  untagged_artifacts: {gens.count(None)}")
    cals = [a.get("cal_start_sec") for a in arts]
    parts = [a.get("shuffle_partitions", a.get("cpus")) for a in arts]
    print(f"# cal_start per scale: {cals}  shuffle_partitions: {parts}")
    qs = [a.get("queries_median") or a["queries"] for a in arts]
    names = sorted(set(qs[0]) & set(qs[1]) & set(qs[2]))
    hdr = (f"{'query':42s} {'w.01':>6s} {'w.1':>6s} {'w1':>7s} "
           f"{'wexp':>5s} {'rows.01':>9s} {'rows.1':>10s} {'rows1':>11s} "
           f"{'rexp':>5s} {'pred':>4s} {'verdict':>8s}")
    print(hdr)
    for q in names:
        w = [qd[q] for qd in qs]
        wexp = (math.log10(w[2] / w[0]) / 2
                if w[0] > 0 and w[2] > 0 else float("nan"))
        rows = [warm_probe_rows(a, q) for a in arts]
        if all(r is not None and r > 0 for r in rows):
            rexp = math.log10(rows[2] / rows[0]) / 2
            rtxt = [f"{r}" for r in rows]
        else:
            rexp = float("nan")
            rtxt = ["-"] * 3
        pred = PREDICTED.get(q, DEFAULT_PRED)
        # rows are the attributable axis (host-speed-free); wall is noisy
        # at the small end (fixed per-query overhead dominates sf0.01)
        basis = rexp if not math.isnan(rexp) else wexp
        if math.isnan(basis):
            verdict = "NO_DATA"  # neither axis measured — not a diverge
        elif abs(basis - pred) <= 0.35:
            verdict = "OK"
        elif basis < pred:
            # growing SLOWER than predicted is not the scale hazard the
            # table exists to catch (log-round CC, bounded-output aggs)
            verdict = "SUBLIN"
        else:
            verdict = "DIVERGES"
        print(f"{q:42s} {w[0]:6.2f} {w[1]:6.2f} {w[2]:7.2f} "
              f"{wexp:5.2f} {rtxt[0]:>9s} {rtxt[1]:>10s} {rtxt[2]:>11s} "
              f"{rexp:5.2f} {pred:4.1f} {verdict:>8s}")


if __name__ == "__main__":
    main()
