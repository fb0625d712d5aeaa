#!/usr/bin/env python3
"""Cross-round bench diff with mechanical attribution.

Usage: python3 tools/diff_bench.py [--median] OLD.json NEW.json [ratio_threshold]

--median compares warm-rep medians (queries_median) instead of the
last-rep wall time when BOTH artifacts carry them (r13 verdict stretch):
position cold-start — a query that runs early in a short sweep vs deep
inside a warm long sweep (q_stream_join_attrib read 5.86x on last-rep in
the r12->r13 diff) — is rep-1-only, so the warm median removes the
biggest JVM_STATE noise class from the >threshold list instead of merely
labeling it. Falls back to last-rep (with a notice) when either side
lacks medians.

Applies the SCALING.md round-12 attribution rules to every shared query:

  verdict        meaning
  -------        -------
  PLAN_CHANGED   the distinct action-plan fingerprint set differs between
                 rounds (real plan change OR code change) -> read the plans
  AQE_UNSTABLE   the query's plans conflicted between reps INSIDE either
                 round's own sweep (runtime build-side races) -> wall-time
                 deltas are not attributable to code
  JVM_STATE      same plans, wall-time moved WITH executor-CPU
                 (proportional) -> JIT/codegen warmth, not a regression
  CONTENTION     same plans, wall time moved but executor-CPU did not ->
                 the host stole cores mid-query
  WORK_CHANGED   same plan fingerprints but task count or shuffle bytes
                 moved >20% -> data or config changed
  UNEXPLAINED    none of the above fired; investigate

Only rounds whose artifacts carry queries_probe (r12+) can be fully
attributed; older artifacts degrade to ratio-only rows.
"""
import json
import sys


def probe_agg(probes):
    """Aggregate a query's per-rep probe records for comparison."""
    if not probes:
        return None
    # "off" = the sweep ran with SPARK_GRAFT_PROBE=0 (the overhead-A/B
    # control): no evidence, same as a pre-r12 artifact
    if all(s.get("plan_fp") == "off" for s in probes):
        return None
    actions = set()
    for s in probes:
        # plan_fp is the multiset hash; per-rep distinct actions are only
        # in plan_actions (query-level), so fall back to fp set here
        actions.add(s.get("plan_fp"))
    warm = probes[1:] or probes
    return {
        "fps": actions,
        "exec_ms": sorted(s.get("exec_run_ms", 0) for s in warm)[len(warm) // 2],
        "tasks": warm[-1].get("tasks", 0),
        "sh_mb": warm[-1].get("sh_read_mb", 0.0) + warm[-1].get("sh_write_mb", 0.0),
    }


def main():
    args = [a for a in sys.argv[1:] if a != "--median"]
    want_median = "--median" in sys.argv[1:]
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    thr = float(args[2]) if len(args) > 2 else 1.2
    if old.get("cpus") != new.get("cpus"):
        # r14 post-mortem: a sweep launched without SPARK_GRAFT_CPUS runs
        # local[4] (the Bench default) while driver sweeps run local[32];
        # partition counts sit inside every Exchange node, so EVERY
        # fingerprint differs and every mover mislabels as PLAN_CHANGED.
        print(f"WARNING: cpus mismatch ({old.get('cpus')} vs "
              f"{new.get('cpus')}) — timings AND plan fingerprints are "
              f"not comparable across parallelism; rerun with matched "
              f"SPARK_GRAFT_CPUS before trusting any verdict below")
    use_median = (want_median and old.get("queries_median")
                  and new.get("queries_median"))
    if want_median and not use_median:
        print("note: --median requested but queries_median missing on one "
              "side; falling back to last-rep wall times")
    series = "queries_median" if use_median else "queries"
    qo, qn = old.get(series, {}), new.get(series, {})
    shared = sorted(q for q in qn
                    if q in qo and qo[q] > 0 and qn[q] > 0)
    t_old = sum(qo[q] for q in shared)
    t_new = sum(qn[q] for q in shared)
    print(f"shared {len(shared)} queries ({'warm-rep median' if use_median else 'last-rep'}): "
          f"{t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.3f}x)  "
          f"cal {old.get('cal_start_sec', '?')} -> {new.get('cal_start_sec', '?')}")
    oa_all = old.get("plan_actions", {})
    na_all = new.get("plan_actions", {})
    flips_old = set(old.get("plan_flips", []))
    flips_new = set(new.get("plan_flips", []))
    rows = []
    for q in shared:
        r = qn[q] / qo[q]
        if r < thr and 1 / r < thr:
            continue
        po = probe_agg(old.get("queries_probe", {}).get(q))
        pn = probe_agg(new.get("queries_probe", {}).get(q))
        verdict = "NO_PROBE_DATA"
        if po and pn:
            acts_o = set(oa_all.get(q, [])) or po["fps"]
            acts_n = set(na_all.get(q, [])) or pn["fps"]
            cpu_ratio = (pn["exec_ms"] / po["exec_ms"]) if po["exec_ms"] else 0
            if q in flips_old or q in flips_new:
                verdict = "AQE_UNSTABLE"
            elif acts_o != acts_n and (acts_o <= acts_n or acts_n <= acts_o):
                # one run's action set contains the other's: the cold
                # ensureBuilt artifact build attached to a DIFFERENT query
                # of the sharing group in one of the runs (registry-order
                # effect), or per-rep event loss — the common serve plan
                # is unchanged, so this is not a plan change
                verdict = "BUILD_MIGRATED"
            elif acts_o != acts_n:
                verdict = "PLAN_CHANGED"
            elif po["tasks"] and (abs(pn["tasks"] - po["tasks"]) / po["tasks"] > 0.2
                                  or (po["sh_mb"] > 1 and
                                      abs(pn["sh_mb"] - po["sh_mb"]) / po["sh_mb"] > 0.2)):
                verdict = "WORK_CHANGED"
            elif cpu_ratio and abs(cpu_ratio - r) / r < 0.35:
                verdict = "JVM_STATE"
            elif cpu_ratio and cpu_ratio < (1 + (r - 1) * 0.4):
                verdict = "CONTENTION"
            else:
                verdict = "UNEXPLAINED"
        rows.append((r, q, verdict, qo[q], qn[q]))
    rows.sort(reverse=True)
    if not rows:
        print(f"no query moved past {thr}x in either direction")
        return
    print(f"\nqueries past {thr}x (either direction), most-regressed first:")
    for r, q, verdict, o, n in rows:
        print(f"  {q}: {o:.2f} -> {n:.2f} ({r:.2f}x)  {verdict}")


if __name__ == "__main__":
    main()
