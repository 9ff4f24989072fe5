#!/usr/bin/env python3
"""Compare a BENCH_LOCAL.json against a prior round's committed record.

Usage:
    python3 tools/bench_compare.py [current.json] [baseline.json]
    python3 tools/bench_compare.py BENCH_LOCAL.json <(git show <sha>:BENCH_LOCAL.json)

Defaults: current = ./BENCH_LOCAL.json, baseline = the last committed
BENCH_LOCAL.json (git show HEAD:BENCH_LOCAL.json). Prints shared-set
totals, the >2x regression list (the judge's exact check), and new/removed
queries. Exit code 1 if any regression is found so it can gate a commit.
"""
import json, subprocess, sys


def load(path):
    if path == "-":
        return json.load(sys.stdin)
    return json.load(open(path))


def main(argv):
    cur_path = argv[1] if len(argv) > 1 else "BENCH_LOCAL.json"
    if len(argv) > 2:
        base = load(argv[2])
    else:
        raw = subprocess.check_output(["git", "show", "HEAD:BENCH_LOCAL.json"])
        base = json.loads(raw)
    cur = load(cur_path)
    qc, qb = cur["queries"], base["queries"]
    shared = sorted(set(qc) & set(qb))
    sc, sb = sum(qc[k] for k in shared), sum(qb[k] for k in shared)
    print(f"current total {cur['value']:.1f}s / {len(qc)} queries; "
          f"baseline {base['value']:.1f}s / {len(qb)}")
    ratio = f"{sc/sb:.2f}x" if sb > 0 else "n/a (empty/zero baseline)"
    print(f"shared set ({len(shared)}): {sc:.1f}s vs {sb:.1f}s = {ratio}")
    regs = [(k, qb[k], qc[k]) for k in shared
            if qc[k] > 2 * qb[k] and qc[k] > 0.5]
    # a 0.0 baseline (sub-ms query) sorts as an infinite-ratio regression
    for k, b, c in sorted(regs, key=lambda t: -(t[2] / t[1]) if t[1] > 0
                          else float("-inf")):
        noise = cur.get("noise_ratio", {}).get(k)
        samples = cur.get("samples", {}).get(k)
        rx = f"{c/b:.1f}x" if b > 0 else "infx"
        print(f"  REGRESSION {k}: {b:.2f} -> {c:.2f} ({rx}) "
              f"noise={noise} samples={samples}")
    if not regs:
        print("no >2x regressions")
    new = sorted(set(qc) - set(qb))
    if new:
        print("new:", ", ".join(f"{k}={qc[k]:.2f}s" for k in new))
    gone = sorted(set(qb) - set(qc))
    if gone:
        print("removed:", ", ".join(gone))
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
