#!/usr/bin/env python3
"""Oracle output-type lint: fail on HUGEINT/DECIMAL result columns.

Usage: python3 tools/oracle_lint.py <oracle_sql.json> <sfDir>

The engine emits int64/double for every aggregate output (Spark has no
int128, and no query surfaces DecimalType), while DuckDB types a bare
SUM(BIGINT) as HUGEINT and arithmetic over numeric literals as DECIMAL.
The driver's correctness hasher is type-sensitive, so any oracle whose
SELECT list leaves such a column un-cast hash-mismatches even when every
value is identical (q200/q202/q212 regression, round 12). This gate
DESCRIBEs every oracle against the fixture schemas and exits non-zero
listing offending (query, column, type) triples.
"""
import sys, os, json
import duckdb

def lint(oracle_path, sf):
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        p = f'{sf}/{t}.parquet'
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    flagged, errors = [], []
    for name, sql in sorted(oracle.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            # DESCRIBE must succeed for every committed oracle: a bind
            # error here would also zero the driver's correctness row.
            errors.append((name, str(e).split('\n')[0][:200]))
            continue
        for col, typ, *_ in desc:
            if 'HUGEINT' in typ or 'DECIMAL' in typ:
                flagged.append((name, col, typ))
    for name, col, typ in flagged:
        print(f'FLAG {name}: column {col} is {typ} '
              f'(cast to BIGINT/DOUBLE in the oracle SQL)')
    for name, err in errors:
        print(f'ERROR {name}: DESCRIBE failed: {err}')
    print(f'{len(oracle)} oracles checked, {len(flagged)} flagged, '
          f'{len(errors)} describe errors')
    return 1 if (flagged or errors) else 0

if __name__ == '__main__':
    sys.exit(lint(sys.argv[1], sys.argv[2]))
