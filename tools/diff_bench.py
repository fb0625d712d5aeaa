#!/usr/bin/env python3
"""Cross-round bench diff with mechanical attribution.

Usage: python3 tools/diff_bench.py [--median] [--ctrl CTRL.json] \
           OLD.json NEW.json [ratio_threshold]
       python3 tools/diff_bench.py --abba A1.json B1.json B2.json A2.json \
           [ratio_threshold]   (paired both-orders protocol, r17)

--ctrl CTRL.json (r14 verdict #3) subtracts HOST drift mechanically:
CTRL is the OLD code swept on the NEW host (same day, same machine as
NEW). The report then splits every ratio into
    host  = ctrl/old   (same code, different host state)
    code  = new/ctrl   (same host, different code)
and movers are selected and attributed on the CODE ratio — the r13->r14
raw diff labeled ~10 movers UNEXPLAINED that the same-host control
proved were host state (cal 0.155->0.170). Plan fingerprints are
compared ctrl-vs-new (both carry the respective code's plans on the
same host), so a PLAN_CHANGED verdict under --ctrl really is code.

Without --ctrl, cal-ratio normalization kicks in when both artifacts
carry cal_start_sec and they differ by >5%: the headline adds a
cal-normalized total, per-query ratios are normalized by the cal ratio
before thresholding, and movers whose RAW ratio crossed the threshold
only because of host drift are reported as HOST_DRIFT instead of
polluting the verdict list. A loud warning fires when cal drift
exceeds 25% — past that the linear normalization itself is suspect.

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
  HOST_DRIFT     (no --ctrl) the raw ratio crossed the threshold but the
                 cal-normalized ratio did not -> the host, not the code
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


def attribute(q, r, base, side, flips_base, flips_side, acts_base_all,
              acts_side_all):
    """SCALING.md r12 attribution rules for one mover: base -> side."""
    pb = probe_agg(base.get("queries_probe", {}).get(q))
    ps = probe_agg(side.get("queries_probe", {}).get(q))
    if not (pb and ps):
        return "NO_PROBE_DATA"
    acts_b = set(acts_base_all.get(q, [])) or pb["fps"]
    acts_s = set(acts_side_all.get(q, [])) or ps["fps"]
    cpu_ratio = (ps["exec_ms"] / pb["exec_ms"]) if pb["exec_ms"] else 0
    if q in flips_base or q in flips_side:
        return "AQE_UNSTABLE"
    if acts_b != acts_s and (acts_b <= acts_s or acts_s <= acts_b):
        # one run's action set contains the other's: the cold
        # ensureBuilt artifact build attached to a DIFFERENT query
        # of the sharing group in one of the runs (registry-order
        # effect), or per-rep event loss — the common serve plan
        # is unchanged, so this is not a plan change
        return "BUILD_MIGRATED"
    if acts_b != acts_s:
        return "PLAN_CHANGED"
    if pb["tasks"] and (abs(ps["tasks"] - pb["tasks"]) / pb["tasks"] > 0.2
                        or (pb["sh_mb"] > 1 and
                            abs(ps["sh_mb"] - pb["sh_mb"]) / pb["sh_mb"] > 0.2)):
        return "WORK_CHANGED"
    if cpu_ratio and abs(cpu_ratio - r) / r < 0.35:
        return "JVM_STATE"
    if cpu_ratio and cpu_ratio < (1 + (r - 1) * 0.4):
        return "CONTENTION"
    return "UNEXPLAINED"


def abba_main(argv):
    """Paired-ordering consumer for tools/bench_abba.py runs (r16 verdict
    #2): A1 B1 B2 A2 artifacts; movers are selected on the per-query
    GEOMEAN of the two per-order code ratios (B1/A1, B2/A2), which
    cancels linear host drift exactly, and attributed on the closest-in-
    time pair (A2 vs B2 — adjacent runs, minimal drift between them)."""
    arts = [json.load(open(p)) for p in argv[:4]]
    thr = float(argv[4]) if len(argv) > 4 else 1.2
    a1, b1, b2, a2 = arts
    med = [a.get("queries_median") or a["queries"] for a in arts]
    shared = sorted(q for q in med[0]
                    if all(q in m and m[q] > 0 for m in med))
    tot = [sum(m[q] for q in shared) for m in med]
    code_ab, code_ba = tot[1] / tot[0], tot[2] / tot[3]
    code = (code_ab * code_ba) ** 0.5
    print(f"ABBA {len(shared)} shared queries: "
          f"A1 {tot[0]:.1f}s B1 {tot[1]:.1f}s B2 {tot[2]:.1f}s A2 {tot[3]:.1f}s")
    print(f"code A->B {code_ab:.3f}x  code B->A {code_ba:.3f}x  "
          f"geomean {code:.3f}x  "
          f"order disagreement {code_ab / code_ba:.3f}")
    cals = [a.get("cal_start_sec") for a in arts]
    print(f"cals along the protocol: {cals}")
    flips_a2 = set(a2.get("plan_flips", []))
    flips_b2 = set(b2.get("plan_flips", []))
    aa_all, ba_all = a2.get("plan_actions", {}), b2.get("plan_actions", {})
    rows = []
    for q in shared:
        r = ((med[1][q] / med[0][q]) * (med[2][q] / med[3][q])) ** 0.5
        if r < thr and 1 / r < thr:
            continue
        verdict = attribute(q, med[2][q] / med[3][q], a2, b2,
                            flips_a2, flips_b2, aa_all, ba_all)
        rows.append((r, q, verdict,
                     f"{med[0][q]:.2f}/{med[1][q]:.2f}/"
                     f"{med[2][q]:.2f}/{med[3][q]:.2f} (paired {r:.2f}x)"))
    rows.sort(reverse=True)
    if not rows:
        print(f"no query moved past {thr}x on the paired code ratio")
        return
    print(f"\nqueries past {thr}x paired (either direction), "
          f"most-regressed first:")
    for r, q, verdict, desc in rows:
        print(f"  {q}: {desc}  {verdict}")


def main():
    argv = list(sys.argv[1:])
    if "--abba" in argv:
        return abba_main([a for a in argv if a != "--abba"])
    want_median = "--median" in argv
    argv = [a for a in argv if a != "--median"]
    ctrl = None
    if "--ctrl" in argv:
        i = argv.index("--ctrl")
        ctrl = json.load(open(argv[i + 1]))
        del argv[i:i + 2]
    old = json.load(open(argv[0]))
    new = json.load(open(argv[1]))
    thr = float(argv[2]) if len(argv) > 2 else 1.2
    sides = [("OLD", old), ("NEW", new)] + ([("CTRL", ctrl)] if ctrl else [])
    for (na, a), (nb, b) in zip(sides, sides[1:]):
        if a.get("cpus") != b.get("cpus"):
            # r14 post-mortem: a sweep launched without SPARK_GRAFT_CPUS runs
            # local[4] (the Bench default) while driver sweeps run local[32];
            # partition counts sit inside every Exchange node, so EVERY
            # fingerprint differs and every mover mislabels as PLAN_CHANGED.
            print(f"WARNING: cpus mismatch ({na}={a.get('cpus')} vs "
                  f"{nb}={b.get('cpus')}) — timings AND plan fingerprints are "
                  f"not comparable across parallelism; rerun with matched "
                  f"SPARK_GRAFT_CPUS before trusting any verdict below")
    use_median = (want_median and all(s.get("queries_median")
                                      for _, s in sides))
    if want_median and not use_median:
        print("note: --median requested but queries_median missing on one "
              "side; falling back to last-rep wall times")
    series = "queries_median" if use_median else "queries"
    qo, qn = old.get(series, {}), new.get(series, {})
    qc = ctrl.get(series, {}) if ctrl else {}
    shared = sorted(q for q in qn
                    if q in qo and qo[q] > 0 and qn[q] > 0
                    and (not ctrl or qc.get(q, 0) > 0))
    t_old = sum(qo[q] for q in shared)
    t_new = sum(qn[q] for q in shared)
    label = "warm-rep median" if use_median else "last-rep"
    print(f"shared {len(shared)} queries ({label}): "
          f"{t_old:.1f}s -> {t_new:.1f}s "
          f"({t_new / t_old:.3f}x)  "
          f"cal {old.get('cal_start_sec', '?')} -> {new.get('cal_start_sec', '?')}")
    # host-drift handling: three-way control if given, else cal-ratio
    cal_ratio = None
    if ctrl:
        t_ctrl = sum(qc[q] for q in shared)
        print(f"three-way split via ctrl (old code on new host, "
              f"cal {ctrl.get('cal_start_sec', '?')}):\n"
              f"  HOST  old->ctrl: {t_old:.1f}s -> {t_ctrl:.1f}s "
              f"({t_ctrl / t_old:.3f}x)\n"
              f"  CODE  ctrl->new: {t_ctrl:.1f}s -> {t_new:.1f}s "
              f"({t_new / t_ctrl:.3f}x)  <- the round-over-round verdict")
    else:
        try:
            cal_o = float(old.get("cal_start_sec"))
            cal_n = float(new.get("cal_start_sec"))
            cal_ratio = cal_n / cal_o
        except (TypeError, ValueError, ZeroDivisionError):
            cal_ratio = None
        if cal_ratio and abs(cal_ratio - 1) > 0.25:
            print(f"WARNING: cal drift {cal_ratio:.3f}x exceeds the 25% "
                  f"envelope — linear normalization is itself suspect; "
                  f"re-sweep on a quiet host or supply --ctrl")
        if cal_ratio and abs(cal_ratio - 1) > 0.05:
            print(f"host drift detected (cal {cal_ratio:.3f}x): "
                  f"cal-normalized total {t_new / t_old / cal_ratio:.3f}x; "
                  f"per-query ratios below are thresholded on the "
                  f"normalized value, raw-only movers -> HOST_DRIFT")
        else:
            cal_ratio = None  # within noise: raw ratios stand
    oa_all = old.get("plan_actions", {})
    na_all = new.get("plan_actions", {})
    ca_all = ctrl.get("plan_actions", {}) if ctrl else {}
    flips_old = set(old.get("plan_flips", []))
    flips_new = set(new.get("plan_flips", []))
    flips_ctrl = set(ctrl.get("plan_flips", [])) if ctrl else set()
    rows = []
    for q in shared:
        r_raw = qn[q] / qo[q]
        if ctrl:
            # select + attribute on the same-host CODE ratio
            r = qn[q] / qc[q]
            if r < thr and 1 / r < thr:
                continue
            verdict = attribute(q, r, ctrl, new, flips_ctrl, flips_new,
                                ca_all, na_all)
            rows.append((r, q, verdict,
                         f"{qo[q]:.2f} -> {qc[q]:.2f} -> {qn[q]:.2f} "
                         f"(host {qc[q] / qo[q]:.2f}x, code {r:.2f}x)"))
        else:
            r_norm = r_raw / cal_ratio if cal_ratio else r_raw
            raw_moved = r_raw >= thr or 1 / r_raw >= thr
            norm_moved = r_norm >= thr or 1 / r_norm >= thr
            if not (raw_moved or norm_moved):
                continue
            if cal_ratio and raw_moved and not norm_moved:
                verdict = "HOST_DRIFT"
            else:
                # attribute on the SAME ratio movers are selected on:
                # under cal normalization the proportionality tests
                # (JVM_STATE/CONTENTION) must compare executor-CPU
                # against the host-drift-corrected wall ratio, not the
                # raw one (r15 ADVICE)
                verdict = attribute(q, r_norm if cal_ratio else r_raw,
                                    old, new, flips_old,
                                    flips_new, oa_all, na_all)
            extra = f" (cal-norm {r_norm:.2f}x)" if cal_ratio else ""
            rows.append((r_norm, q, verdict,
                         f"{qo[q]:.2f} -> {qn[q]:.2f} ({r_raw:.2f}x){extra}"))
    rows.sort(reverse=True)
    if not rows:
        print(f"no query moved past {thr}x in either direction")
        return
    print(f"\nqueries past {thr}x (either direction), most-regressed first:")
    for r, q, verdict, desc in rows:
        print(f"  {q}: {desc}  {verdict}")


if __name__ == "__main__":
    main()
