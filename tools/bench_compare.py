#!/usr/bin/env python3
"""Cross-round bench comparison, canary-normalized.

Usage: python3 tools/bench_compare.py OLD_BENCH_DETAIL.json NEW_BENCH_DETAIL.json
       [--threshold R] [--basis min|median]

Compares two tracked BENCH_DETAIL.json artifacts (graft.Bench output) and
prints one line per query shared by both, plus totals. Two ratio columns:

  raw   = new / old seconds
  norm  = raw / (new_canary / old_canary)  -- machine-speed-normalized:
          the canary is a fixed single-thread Spark-free workload timed by
          each Bench run (BenchContract.canarySeconds), so dividing by the
          canary ratio removes uniform host-speed drift between rounds.
          Rounds before the canary existed (r9 and earlier) have no
          canary_sec field; norm falls back to raw with a warning.

Default basis is MIN (the steady-state floor; medians carry the full-suite
GC lottery documented in BENCH_ISOLATION.md). Queries whose normalized
ratio exceeds --threshold (default 1.5) are flagged `CHECK` -- candidates
for the SPARK_GRAFT_BENCH_ONLY isolation protocol, NOT verdicts by
themselves; per-query spreads in a full-suite run are wide (see
BENCH_ISOLATION.md r10: a 5x median spike on a 0.2 s query reproduced at
1.0x in isolation).

Queries whose OLD basis time is under --floor seconds (default 0.5) are
ratio-reported but never flagged: BENCH_ISOLATION.md's r10 cross-round
triage showed sub-0.5 s queries drift 1.2-1.6x with multi-thread host era
at EQUAL canary (their code bit-identical across rounds), and their
isolated runs pay cold-pool floors the full suite amortizes -- min-basis
ratios on them carry no plan signal. Set --floor 0 to flag everything.

Exit code is 0 always -- this is a triage report, not a gate; the gates
are sbt test and oracle_check.py.

Driver-side tooling (python stdlib only), not part of the Scala library.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="old-basis seconds below which a query is never "
                         "flagged (sub-second ratios carry no plan signal; "
                         "see BENCH_ISOLATION.md)")
    ap.add_argument("--basis", choices=("min", "median"), default="min")
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    # a 10x data-scale change reads as a uniform ~2x "regression" --
    # refuse mismatched sf the way failed-query totals are refused
    # (BENCH_ISOLATION.md round 12)
    so, sn = old.get("sf"), new.get("sf")
    if so and sn and so != sn:
        sys.exit(f"refusing to compare artifacts at different scale "
                 f"factors: old sf={so}, new sf={sn} -- ratios would "
                 f"reflect the data-size change, not the code")
    co, cn = old.get("canary_sec"), new.get("canary_sec")
    if co and cn:
        speed = cn / co  # >1: new host slower per the canary
        print(f"canary: old {co} s, new {cn} s -> host speed ratio {speed:.3f} "
              f"(normalizing by it)")
    else:
        speed = 1.0
        print("canary: missing in one or both artifacts -> norm == raw "
              "(canary_sec ships since round 10)", file=sys.stderr)

    oq, nq = old["queries"], new["queries"]
    # A failed query's entry carries "err" and no timings — its sample is
    # time-to-exception. Rounds with failures have NON-COMPARABLE totals
    # (the headline sums succeeded queries only, so a failing round reads
    # as a speedup to any consumer that skips the failed flag — r11
    # ADVICE). Enforce that here rather than hoping readers check.
    ofail = sorted(q for q, v in oq.items() if "err" in v)
    nfail = sorted(q for q, v in nq.items() if "err" in v)
    if ofail or nfail:
        print("!! FAILED QUERIES PRESENT -- totals below are NOT comparable "
              "round-over-round (each side sums only its succeeded queries):",
              file=sys.stderr)
        if ofail:
            print(f"!!   old: {', '.join(ofail)}", file=sys.stderr)
        if nfail:
            print(f"!!   new: {', '.join(nfail)}", file=sys.stderr)
    shared = sorted((set(oq) - set(ofail)) & (set(nq) - set(nfail)))
    only_old, only_new = sorted(set(oq) - set(nq)), sorted(set(nq) - set(oq))
    b = args.basis
    rows, flagged = [], []
    for q in shared:
        ov, nv = oq[q][b], nq[q][b]
        raw = nv / ov if ov else float("inf")
        norm = raw / speed
        mark = ""
        if norm > args.threshold:
            if ov >= args.floor:
                mark = "CHECK"
                flagged.append(q)
            else:
                mark = "(sub-floor)"
        rows.append((q, ov, nv, raw, norm, mark))

    w = max(len(q) for q in shared) if shared else 8
    print(f"{'query':<{w}}  {b + '_old':>8}  {b + '_new':>8}  {'raw':>6}  "
          f"{'norm':>6}")
    for q, ov, nv, raw, norm, mark in sorted(rows, key=lambda r: -r[4]):
        print(f"{q:<{w}}  {ov:8.3f}  {nv:8.3f}  {raw:6.2f}  {norm:6.2f}  {mark}")

    to, tn = (sum(oq[q][b] for q in shared), sum(nq[q][b] for q in shared))
    raw_t = tn / to if to else float("inf")
    comparable = "" if not (ofail or nfail) else "  [NOT COMPARABLE: failures]"
    print(f"\nshared-{len(shared)}-query total ({b}): old {to:.1f} s, "
          f"new {tn:.1f} s, raw {raw_t:.2f}x, norm {raw_t / speed:.2f}x"
          f"{comparable}")
    if only_old:
        print(f"dropped queries (old only): {', '.join(only_old)}")
    if only_new:
        print(f"new queries (not in old): {', '.join(only_new)}")
    if flagged:
        print(f"\n{len(flagged)} over threshold {args.threshold} normalized -> "
              f"isolate before judging:\n  SPARK_GRAFT_BENCH_ONLY="
              f"{','.join(flagged)} SPARK_GRAFT_BENCH_REPS=7 "
              f"sbt 'runMain graft.Bench'")


if __name__ == "__main__":
    main()
