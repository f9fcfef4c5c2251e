#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares the current BENCH_DETAIL.json against a prior round's bench
artifact and fails loudly if any query slowed down materially — the gate
round 4's q34 pathology (24.8 s in-suite vs 2.5 s isolated) would have
tripped before handoff.

usage: bench_gate.py CURRENT PRIOR [factor]

  CURRENT  BENCH_DETAIL.json ({"queries": {q: {"sec": s, ...}}, ...})
  PRIOR    either a BENCH_DETAIL.json or a driver BENCH_r{N}.json
           ({"queries": {q: sec}, ...}); both shapes are accepted
  factor   slowdown multiple that fails the gate (default 2.0)

A query fails only if BOTH cur > factor * prior AND cur - prior > 0.5 s:
sub-second queries jitter by multiples under co-located load without
meaning anything (SCALING.md's load-sensitivity experiment), while a real
pathology is always whole seconds. Queries present on one side only are
reported informationally, never fatal (new operators appear, variants
move between maps). Exit 0 = green, 1 = regression, 2 = usage/IO error.
"""
import json
import sys


class GateInputError(Exception):
    """Unusable input artifact — exit 2, never confused with a regression."""


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    if "tail" in doc and "queries" not in doc:
        # driver BENCH_r{N}.json: the bench's one-line JSON is embedded in
        # the captured log tail — extract the last {"metric":...} line
        lines = [ln for ln in doc["tail"].splitlines() if '"metric"' in ln]
        if not lines:
            raise GateInputError(f"[bench-gate] no metric line in {path}'s tail")
        doc = json.loads(lines[-1][lines[-1].index('{"metric"'):])
    qs = doc.get("queries", {})
    if isinstance(qs, str):  # compact fallback line: "see BENCH_DETAIL.json"
        raise GateInputError(f"[bench-gate] {path} has no per-query map: {qs!r}")
    out = {}
    for name, v in qs.items():
        out[name] = v["sec"] if isinstance(v, dict) else float(v)
    # variants (__prod/__prefix twins) gate too when both sides have them
    for name, v in doc.get("variants", {}).items():
        out[name] = v["sec"] if isinstance(v, dict) else float(v)
    return out


def main(argv):
    if len(argv) not in (3, 4):
        print(__doc__, file=sys.stderr)
        return 2
    factor = float(argv[3]) if len(argv) == 4 else 2.0
    try:
        cur, prior = load_queries(argv[1]), load_queries(argv[2])
    except (OSError, json.JSONDecodeError, GateInputError) as e:
        print(f"[bench-gate] cannot load inputs: {e}", file=sys.stderr)
        return 2
    bad = []
    for name in sorted(set(cur) & set(prior)):
        c, p = cur[name], prior[name]
        if c > factor * p and c - p > 0.5:
            bad.append((name, p, c))
    for name in sorted(set(cur) - set(prior)):
        print(f"[bench-gate] note: {name} new this round ({cur[name]:.2f}s)")
    for name in sorted(set(prior) - set(cur)):
        print(f"[bench-gate] note: {name} absent this round")
    tc, tp = sum(cur[q] for q in cur if q in prior), \
        sum(prior[q] for q in prior if q in cur)
    print(f"[bench-gate] shared-query totals: prior {tp:.2f}s -> current {tc:.2f}s")
    if bad:
        for name, p, c in bad:
            ratio = f"{c / p:.1f}x" if p > 0 else "inf"
            print(f"[bench-gate] REGRESSION {name}: {p:.2f}s -> {c:.2f}s "
                  f"({ratio}, +{c - p:.2f}s)", file=sys.stderr)
        return 1
    print(f"[bench-gate] OK: no query slowed >{factor}x (+0.5s floor) "
          f"across {len(set(cur) & set(prior))} shared queries")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
