#!/usr/bin/env python3
"""Per-query bench regression gate, robust to run-level environment noise.

Compares the current BENCH_DETAIL.json against a prior round's bench
artifact and fails loudly if any query slowed down materially RELATIVE TO
THE RUN — the gate round 4's q34 pathology (24.8 s in-suite vs 2.5 s
isolated) would have tripped before handoff, while round 7's uniformly
1.46x-slower machine (byte-identical code, whole sbt run 200 s vs 137 s)
would not.

usage: bench_gate.py CURRENT PRIOR [factor]

  CURRENT  BENCH_DETAIL.json ({"queries": {q: {"sec": s, ...}}, ...})
  PRIOR    either a BENCH_DETAIL.json or a driver BENCH_r{N}.json
           ({"queries": {q: sec}, ...}); both shapes are accepted
  factor   normalized slowdown multiple that fails the gate (default 2.0)

Run-level normalization: the per-query ratio cur/prior is computed for
every shared query, and the MEDIAN ratio is taken as the run's scale
(machine contention slows everything; a plan regression slows one query).
Each query's time is divided by that scale before the rule applies. A
query fails only if ALL of: prior >= 1 s, normalized cur > factor *
prior, and normalized cur - prior > 0.5 s.

The prior >= 1 s clause is load-bearing and empirical: on the r6-vs-r7
artifact pair (byte-identical code, whole sbt run 1.46x slower) four
sub-second queries regressed 2.2-5.3x RAW while the run median was only
1.14x — in-suite sub-second times have heavy-tailed noise (q29 has been
measured at 1.4 s clean vs 12.4 s under cache pressure, round 3) and are
not gate-able signal. Seconds-scale queries on the same pair stayed
within 1.4x. A real plan pathology on a substantial query (round 4's
q34: 2.5 s -> 24.8 s) clears all three clauses.

Absolute backstop (catastrophic escape hatch, applies to EVERY query
regardless of prior magnitude or run scale): raw cur > 10x prior AND
raw delta > 10 s fails outright — if normalization or the sub-second
exclusion hides a regression that large, a human must look. A run scale
outside [1/3, 3] is reported loudly as suspicious (whole-run slowdowns
of that size are usually environment, but the gate cannot distinguish
them from a global code regression — inspect by hand).

Queries present on one side only are reported informationally, never
fatal (new operators appear, variants move between maps). Exit 0 =
green, 1 = regression, 2 = usage/IO error.

Self-adjudication via the artifact's "confirmed" section (round 16):
Bench reruns any gate-tripping query min-of-2 in a FRESH session and
records that isolated number in BENCH_DETAIL.json's "confirmed" map —
whether or not it was kept as the headline number. When a query trips
the gate rule on its in-suite number, the gate re-applies the SAME rule
(normalized and catastrophic clauses alike) to the recorded isolated
number: if the isolated number passes, the trip is demoted to a loud
informational note (in-suite contention, adjudicated by the artifact
itself — no human rerun needed); if the isolated number ALSO trips, the
regression is real and the gate fails. An artifact without a
"confirmed" entry for the tripping query fails as before.

Self-test: tools/test_bench_gate.py (run with python3) — asserts exit 0
on synthetic uniform-noise pairs, exit 1 on an injected single-query
regression, exit 0 on a contended artifact whose confirmed section
clears the trip, and exit 1 on a planted TRUE regression that stays
slow in its confirmed entry.
"""
import json
import sys

CATASTROPHIC_FACTOR = 10.0
CATASTROPHIC_FLOOR_S = 10.0
MIN_PRIOR_S = 1.0  # below this, in-suite times are jitter, not signal


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
    if "bench" in doc and "queries" not in doc:
        # annotated artifact (BENCH_r{N}_notes.json / _rerun_quiet.json):
        # the full detail doc nests under "bench". Without this unwrap the
        # gate would "pass" on ZERO shared queries — a silent no-op.
        doc = doc["bench"]
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


def load_confirmed(path):
    """Isolated-confirmation numbers recorded by Bench in the CURRENT
    artifact ({"confirmed": {q: {"sec": s}}}). Absent/malformed sections
    degrade to {} — the gate then behaves exactly as before."""
    try:
        with open(path) as f:
            doc = json.load(f)
        return {name: (v["sec"] if isinstance(v, dict) else float(v))
                for name, v in doc.get("confirmed", {}).items()}
    except (OSError, json.JSONDecodeError, TypeError, KeyError, ValueError):
        return {}


def run_scale(cur, prior, shared):
    """Median per-query ratio — the run-level contention estimate.

    Queries faster than 50 ms on the prior side are excluded from the
    estimate (their ratios are pure jitter); if nothing survives, scale
    is 1.0 (no normalization).
    """
    ratios = sorted(cur[q] / prior[q] for q in shared
                    if prior[q] > 0.05 and cur[q] > 0)
    if not ratios:
        return 1.0
    n = len(ratios)
    mid = n // 2
    return ratios[mid] if n % 2 else (ratios[mid - 1] + ratios[mid]) / 2


def trips_rule(c, p, scale, factor):
    """The per-query regression rule, shared between the in-suite number
    and the confirmed (isolated) number so adjudication applies EXACTLY
    the same bar."""
    cn = c / scale
    return (p >= MIN_PRIOR_S and cn > factor * p and cn - p > 0.5) or \
           (c > CATASTROPHIC_FACTOR * p and c - p > CATASTROPHIC_FLOOR_S)


def gate(cur, prior, factor=2.0, out=sys.stdout, err=sys.stderr,
         confirmed=None):
    """Core rule, separated from IO so the self-test can drive it.

    `confirmed` is the CURRENT artifact's isolated-confirmation map
    (query -> isolated min-of-2 seconds, recorded by Bench). A query
    whose in-suite number trips the rule but whose confirmed number
    passes it is demoted to an informational note — the artifact
    adjudicates its own contention. A confirmed number that ALSO trips
    is a real regression and fails.

    The confirmed number is judged at scale 1.0: the isolated rerun is
    a fresh-session measurement NOT subject to the suite's contention,
    so dividing it by the in-suite run scale (steal swings reach 1.5x)
    would let a genuine regression of up to factor*scale slip through
    the normalized clause. The catastrophic clause was always raw."""
    confirmed = confirmed or {}
    shared = set(cur) & set(prior)
    scale = run_scale(cur, prior, shared)
    print(f"[bench-gate] run scale (median per-query ratio): {scale:.2f}x",
          file=out)
    if not (1 / 3 <= scale <= 3):
        print(f"[bench-gate] WARNING: run scale {scale:.2f}x is outside "
              f"[0.33, 3] — either extreme machine contention or a global "
              f"regression; per-query verdicts below are normalized by it, "
              f"inspect the runs by hand", file=err)
    bad = []
    for name in sorted(shared):
        c, p = cur[name], prior[name]
        cn = c / scale
        if trips_rule(c, p, scale, factor):
            # scale 1.0 for the confirmation: isolated reruns carry no
            # suite contention, so in-suite normalization doesn't apply
            if name in confirmed and not trips_rule(confirmed[name], p,
                                                    1.0, factor):
                print(f"[bench-gate] ADJUDICATED {name}: in-suite {c:.2f}s "
                      f"trips vs prior {p:.2f}s, but the artifact's "
                      f"isolated confirmation measured {confirmed[name]:.2f}s "
                      f"— in-suite contention, not a plan regression",
                      file=out)
                continue
            if name in confirmed:
                # real: slow in-suite AND slow isolated — report the
                # isolated number, it is the steady-state measurement
                # (no contention to normalize away, so cn == c)
                c = confirmed[name]
                cn = c
            bad.append((name, p, c, cn))
    for name in sorted(set(cur) - set(prior)):
        print(f"[bench-gate] note: {name} new this round ({cur[name]:.2f}s)",
              file=out)
    for name in sorted(set(prior) - set(cur)):
        print(f"[bench-gate] note: {name} absent this round", file=out)
    tc = sum(cur[q] for q in shared)
    tp = sum(prior[q] for q in shared)
    print(f"[bench-gate] shared-query totals: prior {tp:.2f}s -> "
          f"current {tc:.2f}s", file=out)
    if bad:
        for name, p, c, cn in bad:
            ratio = f"{cn / p:.1f}x" if p > 0 else "inf"
            print(f"[bench-gate] REGRESSION {name}: {p:.2f}s -> {c:.2f}s raw "
                  f"({cn:.2f}s normalized, {ratio}, +{cn - p:.2f}s)",
                  file=err)
        return 1
    print(f"[bench-gate] OK: no query slowed >{factor}x normalized "
          f"(+0.5s floor) across {len(shared)} shared queries", file=out)
    return 0


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
    return gate(cur, prior, factor, confirmed=load_confirmed(argv[1]))


if __name__ == "__main__":
    sys.exit(main(sys.argv))
