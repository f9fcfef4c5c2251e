#!/usr/bin/env python3
"""Correctness at REPLICA scale — the DuckDB-oracle compare over a 10x
replica of sf0.1 (~6M lineitem rows), for the queries whose plans carry
scale-sensitive gates or partition-count-sensitive machinery (size gates,
prefix gates, IVF nlist floors, range-join bucket sizing, PrefixSum
boundary buckets, ItemCF caps). The sf0.001-0.1 grid cannot see a gate
that flips plan shape above it; this run can.

Usage:
  SPARK_GRAFT_OPS=none sbt "runMain graft.Scaling /root/testdata/sf0.1 10 /tmp/graft_10x"
  for t in region nation customer supplier part; do
    cp -r /root/testdata/sf0.1/$t.parquet /tmp/graft_10x/; done
  SPARK_GRAFT_ONLY=$(python3 tools/verify_10x.py --queries) \
    sbt "runMain graft.Verify /tmp/graft_10x /tmp/verify_10x"
  python3 tools/verify_10x.py /tmp/graft_10x /tmp/verify_10x VERIFY_10X.md

Same comparator shape as the driver's CORRECTNESS gate (sorted columns,
normalized stringified rows): None/NaN unify, DATE == midnight-datetime,
integral floats render .1f. Tables may be single files (fixtures) or
directories of part files (replicas) — both register.
"""
import datetime
import glob
import json
import os
import sys

# The committed 20-query set: every scale-gate family named in the
# round-15 brief plus the heaviest threshold-sensitive pipelines.
QUERIES = [
    "q17_minhash_lsh",        # LSH banding: band-bucket sizes at 10x
    "q24_ann_topk",           # hyperplane LSH: bucket densification
    "q34_dedup_groups",       # prefix-gate: all-pairs-vs-prefix flip
    "q39_ivf_topk",           # IVF nlist floor + persisted cell pruning
    "q46_rolling_dedup",      # rolling-hash fingerprint buckets
    "q73_decontaminate",      # inverted-index contamination join
    "q89_cluster_sample",     # per-cell rates over 10x occupancy
    "q133_range_band",        # range-join bucket sizing
    "q134_interval_overlap",  # bucketized interval join + salting
    "q193_skyline",           # running-max decomposition buckets
    "q207_abc_pareto",        # PrefixSum boundary buckets (per-part)
    "q228_balance_deciles",   # NTILE remainder arithmetic at 10x rows
    "q231_rfm",               # chained PrefixSum stages + caches
    "q232_key_skew",          # running totals under planted skew
    "q240_ivfpq_topk",        # PQ ADC over 10x encoded corpus
    "q99_decontam_scrub",     # shingle-index decontamination + splice
    "q268_item_cf",           # basket cap + pair self-join
    "q274_rec_eval",          # full ItemCF replay + metric tails
    "q289_negative_sampling", # hash-mod sampling + collision marking
    "q294_ivf_append_ledger", # append path + occupancy verdicts
    # -- streaming family (round 17): the sentinel/watermark mechanics
    #    (+32d far-future sentinels, flush contracts, %1000 sentinel
    #    sources) are absolute-offset arithmetic of exactly the kind a
    #    re-synthesized replica breaks (the q294 lesson) — the replica
    #    keeps `ts` but multiplies rows 10x and offsets ids
    "q77_stream_asof",        # two chained stateful ops + flush contract
    "q103_stream_session",    # session windows + bounded-replay flush
    "q293_stream_interval_join",   # stream-stream inner band join
    "q295_unclicked_impressions",  # left-outer negatives, post-band flush
    "q296_ctr_labels",        # unified labeler: both verdicts, one pass
    "q297_ivf_budgeted_probe",  # budget truncation + ledger at 10x mass
]

# q253 (pinned prefix dedup cascade) gets a PARTIAL check by design: its
# stage-2 oracle is the quarantined all-pairs form (a.toks x b.toks cross
# join) — the very shape the allPairsMax=0 pin exists to avoid — and is
# infeasible in DuckDB at 50k replica docs (measured: >25 min, killed;
# ~25 s at 5k). Stage 1 (the exact-dedup census) is linear and oracle-
# checked here; stage 2 is audited arithmetically (its docs_in must equal
# stage 1's docs_out, removed >= 0, out = in - removed). The stage-2
# PLAN's correctness is pinned at fixture scale (CORRECTNESS rows at
# sf0.001-0.1 + the q34 prefix twin's row-identity spec, same pair
# machinery).
Q253_STAGE1_SQL = """
WITH d AS (SELECT doc_id, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL),
fp AS (SELECT md5(COALESCE(array_to_string(list_sort(
    list_filter(string_split(lower(text), ' '),
      t -> len(t) > 0)), ' '), '')) AS k FROM d)
SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS docs_in,
  CAST((SELECT COUNT(*) FROM d) - COUNT(DISTINCT k) AS BIGINT)
    AS docs_removed,
  CAST(COUNT(DISTINCT k) AS BIGINT) AS docs_out
FROM fp
"""


def check_q253(con, out, pd):
    spark_dir = os.path.join(out, "q253_dedup_cascade")
    if not os.path.isdir(spark_dir):
        return ("MISSING SPARK OUTPUT", 0)
    parts = glob.glob(os.path.join(spark_dir, "*.parquet"))
    sdf = pd.concat([pd.read_parquet(p) for p in parts])
    s1 = sdf[sdf["stage"] == "1_exact"].iloc[0]
    s2 = sdf[sdf["stage"] == "2_near"].iloc[0]
    o1 = con.execute(Q253_STAGE1_SQL).fetchdf().iloc[0]
    if not (s1["docs_in"] == o1["docs_in"]
            and s1["docs_removed"] == o1["docs_removed"]
            and s1["docs_out"] == o1["docs_out"]):
        return ("STAGE-1 MISMATCH", len(sdf))
    if not (s2["docs_in"] == s1["docs_out"] and s2["docs_removed"] >= 0
            and s2["docs_out"] == s2["docs_in"] - s2["docs_removed"]):
        return ("STAGE-2 ARITHMETIC MISMATCH", len(sdf))
    return ("OK (stage-1 oracle; stage-2 arithmetic — all-pairs oracle "
            "size-quarantined by design)", len(sdf))


def norm(v):
    if v is None or (isinstance(v, float) and v != v):
        return "<null>"
    if isinstance(v, datetime.datetime) and v.time() == datetime.time(0, 0):
        return str(v.date())
    if isinstance(v, float) and v == v and abs(v) < 1e15 and v == int(v):
        return f"{v:.1f}"
    return str(v)


def frame_key(df):
    cols = sorted(df.columns)
    return sorted(tuple(norm(r[c]) for c in cols)
                  for _, r in df[cols].iterrows())


def main(argv):
    if len(argv) == 2 and argv[1] == "--queries":
        # q253 rides the Verify run for its partial check (see above)
        print(",".join(QUERIES + ["q253_dedup_cascade"]))
        return 0
    if len(argv) not in (3, 4):
        print(__doc__, file=sys.stderr)
        return 2
    import duckdb
    import pandas as pd
    sf, out = argv[1], argv[2]
    report = argv[3] if len(argv) == 4 else None

    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM parquet_scan('{src}')")

    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    rows = []
    fails = 0
    for q in QUERIES:
        spark_dir = os.path.join(out, q)
        if q not in oracle:
            rows.append((q, "NO ORACLE", 0, 0))
            fails += 1
            continue
        if not os.path.isdir(spark_dir):
            rows.append((q, "MISSING SPARK OUTPUT", 0, 0))
            fails += 1
            continue
        try:
            odf = con.execute(oracle[q]).fetchdf()
        except Exception as e:
            rows.append((q, f"ORACLE ERROR {e}", 0, 0))
            fails += 1
            continue
        parts = glob.glob(os.path.join(spark_dir, "*.parquet"))
        sdf = (pd.concat([pd.read_parquet(p) for p in parts])
               if parts else pd.DataFrame())
        if sorted(sdf.columns) != sorted(odf.columns):
            rows.append((q, "SCHEMA MISMATCH", len(sdf), len(odf)))
        elif len(sdf) != len(odf):
            rows.append((q, "ROWS MISMATCH", len(sdf), len(odf)))
        elif frame_key(sdf) != frame_key(odf):
            rows.append((q, "HASH MISMATCH", len(sdf), len(odf)))
        else:
            rows.append((q, "OK", len(sdf), len(odf)))
        if rows[-1][1] != "OK":
            fails += 1
        print(f"{q}: {rows[-1][1]} ({rows[-1][2]} rows)")
    st253, n253 = check_q253(con, out, pd)
    rows.append(("q253_dedup_cascade", st253, n253, n253))
    if not st253.startswith("OK"):
        fails += 1
    print(f"q253_dedup_cascade: {st253} ({n253} rows)")
    print(f"=== {len(rows)} checked, {fails} failed ===")

    if report:
        with open(report, "w") as f:
            f.write("# VERIFY_10X — oracle compare at a 10x replica of "
                    "sf0.1\n\n")
            f.write(f"Replica: `{sf}` (graft.Scaling synthesis, fresh ids, "
                    "salted text/permuted embeddings — see Scaling.scala).\n"
                    "Comparator: driver-shape (sorted columns, normalized "
                    "rows; rows+schema+hash per query).\n\n")
            f.write("| query | status | rows |\n|---|---|---|\n")
            for q, st, ns, _ in rows:
                f.write(f"| {q} | {st} | {ns} |\n")
            f.write(f"\n**{len(rows)} checked, {fails} failed.**\n")
            f.write(
                "\n## Plan-shape gates at this scale\n\n"
                "- q34's `jaccardPairsAuto` gate (all-pairs below 10^4 "
                "docs): its %10 subset is 5k docs at this replica — same "
                "branch as the fixture grid; the flip itself is covered "
                "by `VariantEquivalenceSpec`'s q34__prefix row-identity "
                "gate (forced prefix plan == gated plan, row for row).\n"
                "- q240's nlist floor (`max(64, n/512)`): 20k vectors "
                "stay on the floor; the discipline above it is the "
                "measured cell-size story (SCALING.md IVFPQ rows).\n"
                "- q253's prefix plan is PINNED (`allPairsMax = 0`) — "
                "no gate to flip; its stage-2 all-pairs ORACLE is "
                "size-quarantined by design (see above).\n"
                "- Categorify's broadcast gate, RangeJoin bucket "
                "sizing, and PrefixSum boundary buckets are "
                "data-derived, not thresholded — their 10x rows above "
                "hash-match, which is the gate evidence.\n"
                "- Streaming family (round 17): the bounded-replay "
                "sentinel mechanics survive the replica — the +32d "
                "far-future offset still clears the span because the "
                "synthesis keeps `ts` verbatim (only ids shift, by "
                "multiples of 100M/10M, which preserves the %1000 "
                "sentinel-source classes at 10x density); the q77/q103 "
                "flush contracts and q295/q296's post-band NULL "
                "emission hash-match the batch oracles over ~10x the "
                "pair mass.\n"
                "\nFound-and-fixed by this artifact: q294's read-back "
                "new-id split used a fixed 10M offset that collides "
                "with the replica synthesis' own id offsets — base "
                "rows misread as appended (HASH MISMATCH at 10x, "
                "green at every fixture SF). Now derived from the "
                "data's id range.\n")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
