#!/usr/bin/env python3
"""Per-key bench-budget regression gate.

Compares a fresh bench JSON (the one-line {"queries": {key: sec}}
record Bench.scala prints and the driver stores as BENCH_r{N}.json /
bench_out.json) against the committed prior-round baseline
(tools/bench_baseline.json, refreshed each round from the DRIVER
artifact, never from a best local pass).

A key FAILS the gate when it regresses > 50% round-over-round AND the
new time is above the jitter floor (0.3 s — sub-300ms keys swing with
JVM/disk contention, not plan shape), unless tools/bench_allowlist.json
carries a `key: "reason"` entry pointing at the SURVEY note that
explains the regression. This is the check that would have caught
q_dedup_embcos's three-round drift (0.8 -> 3.1 s) and q_knn_classify's
creep (1.79 -> 1.84 -> 1.99) the round they started.

IMPROVEMENTS over 50% (time more than halved, old time above the
jitter floor) are flagged for annotation too: a silent 13x drop is
indistinguishable from a silently-broken key (or an accounting change
like r12's prestage move) in a regression-only gate. Unannotated
improvements print IMPROVED-UNANNOTATED and exit 1 the same way
unexplained regressions do; an allowlist entry turns them into
"improved (annotated)".

Ratios are MEDIAN-NORMALIZED before gating: a whole-run inflation
(JVM/disk contention lifts the 300+-key board together — the r13
closing runs measured medians of 1.18x/1.08x/1.05x on identical
binaries, each lifting a different random subset of small keys past a
raw 1.5x) is machine state, not plan drift; a real plan regression
moves AGAINST the board. The run median over shared keys above the
jitter floor divides every ratio; both raw and normalized ratios
print, and the median itself is reported (a median far from 1.0 is
its own signal that the run is not comparable).

Usage: python3 tools/bench_drift.py <new_bench.json> [<baseline.json>]
Exit 0 = clean (or explained), 1 = unexplained regression/improvement.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
JITTER_FLOOR_SEC = 0.3
REGRESSION_RATIO = 1.5
IMPROVEMENT_RATIO = 0.5


def load_queries(path):
    with open(path) as f:
        data = json.load(f)
    qs = data.get("queries", data)
    return {k: v for k, v in qs.items() if not k.startswith("_")}


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    new = load_queries(sys.argv[1])
    base_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "bench_baseline.json")
    base = load_queries(base_path)
    allow_path = os.path.join(HERE, "bench_allowlist.json")
    allow = json.load(open(allow_path)) if os.path.exists(allow_path) else {}

    shared = [(k, base[k], new[k]) for k in sorted(new) if k in base and base[k] > 0]
    floor_ratios = sorted(n / b for _, b, n in shared
                          if b > JITTER_FLOOR_SEC and n > JITTER_FLOOR_SEC)
    med = floor_ratios[len(floor_ratios) // 2] if floor_ratios else 1.0
    print(f"run median ratio (shared keys above jitter floor): {med:.3f}")

    failures, explained, improved_ok, improved_bad = [], [], [], []
    added = sorted(set(new) - set(base))
    for key, t_old, t_new in shared:
        ratio = t_new / t_old
        norm = ratio / med if med > 0 else ratio
        if norm > REGRESSION_RATIO and t_new > JITTER_FLOOR_SEC:
            line = (f"{key}: {t_old:.3f} -> {t_new:.3f} s "
                    f"({ratio:.2f}x raw, {norm:.2f}x vs run median)")
            if key in allow:
                explained.append(f"{line} [allowlisted: {allow[key]}]")
            else:
                failures.append(line)
        elif norm < IMPROVEMENT_RATIO and t_old > JITTER_FLOOR_SEC:
            line = (f"{key}: {t_old:.3f} -> {t_new:.3f} s "
                    f"({ratio:.2f}x raw, {norm:.2f}x vs run median)")
            if key in allow:
                improved_ok.append(f"{line} [annotated: {allow[key]}]")
            else:
                improved_bad.append(line)
    removed = sorted(set(base) - set(new))

    if added:
        print(f"new keys (no baseline yet): {len(added)}: {', '.join(added)}")
    if removed:
        print(f"keys gone from the bench: {', '.join(removed)}")
    for line in explained:
        print(f"EXPLAINED {line}")
    for line in improved_ok:
        print(f"improved (annotated) {line}")
    for line in improved_bad:
        print(f"IMPROVED-UNANNOTATED {line}")
    for line in failures:
        print(f"REGRESSED {line}")
    if failures or improved_bad:
        print(f"== {len(failures)} unexplained >50% regressions, "
              f"{len(improved_bad)} unannotated >50% improvements — add a SURVEY "
              "note + tools/bench_allowlist.json entry, or fix the plan ==")
        return 1
    print(f"== bench drift clean: {len(new)} keys vs baseline {len(base)} ==")
    return 0


if __name__ == "__main__":
    sys.exit(main())
