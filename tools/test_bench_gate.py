#!/usr/bin/env python3
"""Self-test of the bench gate's noise-robustness rule.

Run: python3 tools/test_bench_gate.py   (exit 0 = all cases pass)

Covers the round-7 failure mode directly: a run that is uniformly slower
on byte-identical code must pass, while a single injected plan
regression must still fail — with and without ambient run-level noise.
"""
import io
import random
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from bench_gate import gate  # noqa: E402


def run(cur, prior, factor=2.0, confirmed=None):
    return gate(cur, prior, factor, out=io.StringIO(), err=io.StringIO(),
                confirmed=confirmed)


def main():
    rnd = random.Random(42)
    # a realistic 69-query prior: mostly sub-second, a few seconds-scale
    prior = {f"q{i:02d}": rnd.uniform(0.3, 1.2) for i in range(60)}
    prior.update({f"q{i:02d}": rnd.uniform(1.5, 4.0) for i in range(60, 69)})
    prior["q_tiny"] = 0.2  # the sub-second-jitter case needs a known-small query

    cases = []

    # 1. identical runs -> green
    cases.append(("identical", dict(prior), 0))

    # 2. the round-7 shape: uniform ~1.5x machine contention with +-20%
    #    per-query jitter, same code -> must be green
    noisy = {q: t * 1.5 * rnd.uniform(0.8, 1.2) for q, t in prior.items()}
    cases.append(("uniform 1.5x contention", noisy, 0))

    # 3. uniform speedup (faster machine) -> green
    cases.append(("uniform 0.6x speedup",
                  {q: t * 0.6 for q, t in prior.items()}, 0))

    # 4. single 3x regression on a seconds-scale query, quiet machine ->
    #    must fail ("q62" is in the 1.5-4.0s band)
    reg = dict(prior)
    reg["q62"] = prior["q62"] * 3.0
    cases.append(("single 3x regression", reg, 1))

    # 5. single 3x regression HIDDEN under 1.4x uniform contention ->
    #    normalization must still expose it (3x/1.4 ~ 2.1x > factor)
    reg_noisy = {q: t * 1.4 * rnd.uniform(0.95, 1.05)
                 for q, t in prior.items()}
    reg_noisy["q62"] = prior["q62"] * 3.0 * 1.4
    cases.append(("3x regression under 1.4x contention", reg_noisy, 1))

    # 5b. the round-4 pathology shape (2.5s -> 24.8s in-suite) -> must fail
    #     through BOTH rules (normalized 9.9x, and catastrophic raw)
    r4 = dict(prior)
    r4["q62"] = prior["q62"] * 9.9 + 0.5
    cases.append(("round-4 q34 pathology shape", r4, 1))

    # 5c. the round-7 q29 shape: ONE sub-second query jumping to seconds
    #     (0.63s -> 3.37s, byte-identical code) -> green. This is the
    #     documented limit of in-suite sub-second signal; the catastrophic
    #     backstop (10x AND +10s) still covers a sub-second query going
    #     truly pathological.
    q29ish = dict(prior)
    q29ish["q_sub"] = 0.63 * 5.3
    prior_q29 = dict(prior); prior_q29["q_sub"] = 0.63
    cases.append(("sub-second 5.3x contention spike (r7 q29)",
                  (q29ish, prior_q29), 0))

    # 5d. sub-second query going catastrophic (0.6s -> 15s = 25x, +14s) ->
    #     the absolute backstop fires despite the sub-second exclusion
    cata_sub = dict(prior)
    cata_sub["q_sub"] = 15.0
    prior_sub = dict(prior); prior_sub["q_sub"] = 0.6
    cases.append(("sub-second catastrophic 25x", (cata_sub, prior_sub), 1))

    # 6. sub-second query jumping 3x (0.3s -> 0.9s) -> green (0.5s floor:
    #    sub-second jitter is meaningless under co-located load)
    small = dict(prior)
    small["q_tiny"] = prior["q_tiny"] * 3.0  # 0.2s -> 0.6s, delta < 0.5s
    cases.append(("sub-second 3x jitter", small, 0))

    # 7. catastrophic: one query 20x AND +>10s slower while the rest of the
    #    run is ALSO slow enough to drag the median -> absolute backstop
    #    fires even though normalization would excuse part of it
    cata = {q: t * 2.5 for q, t in prior.items()}
    qbig = max(prior, key=prior.get)
    cata[qbig] = prior[qbig] * 20.0
    cases.append(("catastrophic 20x under 2.5x contention", cata, 1))

    # 8. self-adjudication: a deliberately CONTENDED artifact — q62 trips
    #    at 2.5x in-suite, but Bench's recorded isolated confirmation
    #    measured it at its prior level -> the gate must exit 0 without
    #    any human adjudication (the round-15 q215/q265 shape)
    contended = dict(prior)
    contended["q62"] = prior["q62"] * 2.5
    cases.append(("contended in-suite, confirmed clean",
                  (contended, prior, {"q62": prior["q62"] * 1.05}), 0))

    # 9. planted TRUE regression: q62 is slow in-suite AND its isolated
    #    confirmation stays slow -> the confirmed section must NOT excuse
    #    it; the gate fails on the isolated number
    cases.append(("true regression, confirmed still slow",
                  (contended, prior, {"q62": prior["q62"] * 2.4}), 1))

    # 10. a catastrophic trip with a clean confirmation is also demoted:
    #     the adjudication applies the SAME rule, both clauses
    cata_conf = dict(prior)
    qbig2 = max(prior, key=prior.get)
    cata_conf[qbig2] = prior[qbig2] * 20.0 + 12.0
    cases.append(("catastrophic in-suite, confirmed clean",
                  (cata_conf, prior, {qbig2: prior[qbig2] * 1.1}), 0))

    # 11. a confirmed entry for a NON-tripping query changes nothing
    cases.append(("confirmed entry on a green query",
                  (dict(prior), prior, {"q62": prior["q62"] * 0.9}), 0))

    # 12. the round-16 ADVICE shape: the SUITE is contended (1.5x run
    #     scale) AND q62 carries a genuine 2.5x regression whose isolated
    #     confirmation is also 2.5x. The confirmation must be judged at
    #     scale 1.0 — dividing the isolated number by the in-suite scale
    #     (2.5/1.5 = 1.67x < factor) would demote a real regression.
    cont_reg = {q: t * 1.5 * rnd.uniform(0.95, 1.05)
                for q, t in prior.items()}
    cont_reg["q62"] = prior["q62"] * 2.5 * 1.5
    cases.append(("real regression under contention, confirmed slow",
                  (cont_reg, prior, {"q62": prior["q62"] * 2.5}), 1))

    # 12b. same contended suite, but the isolated confirmation is clean
    #      -> still demoted (scale-1.0 judging must not over-fail)
    cases.append(("contended suite, confirmed clean at scale 1.0",
                  (cont_reg, prior, {"q62": prior["q62"] * 1.1}), 0))

    failures = []
    for name, case, expect in cases:
        conf = None
        if isinstance(case, tuple) and len(case) == 3:
            cur, pri, conf = case
        elif isinstance(case, tuple):
            cur, pri = case
        else:
            cur, pri = case, prior
        got = run(cur, pri, confirmed=conf)
        status = "ok" if got == expect else f"FAIL (expected {expect}, got {got})"
        print(f"  {name}: exit {got} — {status}")
        if got != expect:
            failures.append(name)
    if failures:
        print(f"self-test FAILED: {failures}", file=sys.stderr)
        return 1
    print("self-test passed: all gate cases behave as specified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
