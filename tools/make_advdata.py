#!/usr/bin/env python3
"""Adversarial fixture generator: copies an sf dir and appends the edge
rows the synthetic fixtures never contain — empty/whitespace documents,
NULL keys and event types, fractional quantities, NULL group values, a
NULL anti-join key. Every oracle-checked query must STILL hash-match on
this data (cross-engine parity may not depend on fixture cleanliness):

    python3 tools/make_advdata.py /root/testdata/sf0.001 /tmp/advdata
    sbt -batch "runMain graft.Verify /tmp/advdata /tmp/verify_adv"
    python3 /tmp/compare.py /tmp/advdata /tmp/verify_adv
"""
import sys, shutil, os
import pyarrow as pa, pyarrow.parquet as pq

src = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
dst = sys.argv[2] if len(sys.argv) > 2 else '/tmp/advdata'
shutil.rmtree(dst, ignore_errors=True); os.makedirs(dst)
for t in ['region','nation','customer','supplier','part','orders',
          'lineitem','events','documents','embeddings']:
    shutil.copy(f'{src}/{t}.parquet', f'{dst}/{t}.parquet')

def append(name, rows):
    t = pq.read_table(f'{dst}/{name}.parquet')
    extra = pa.table({c: pa.array([r[c] for r in rows],
                                  type=t.schema.field(c).type)
                      for c in t.schema.names}, schema=t.schema)
    pq.write_table(pa.concat_tables([t, extra]), f'{dst}/{name}.parquet')

append('documents', [
  dict(doc_id=900000, text='', lang='en', source='adv', n_chars=0),
  dict(doc_id=900010, text='   ', lang='en', source='adv', n_chars=3),
  dict(doc_id=900020, text='one  two   one', lang='en', source='adv', n_chars=14),
  # NULL text: engines must agree on dropping vs defaulting in every
  # text-consuming oracle (q17/q18 regressed latently on this once —
  # the engine drops NULL-sig docs, a COALESCE'd oracle kept them)
  dict(doc_id=900030, text=None, lang='en', source='adv', n_chars=None)])

ts0 = pq.read_table(f'{dst}/events.parquet').column('ts')[0].as_py()
append('events', [
  dict(event_id=900001, ts=ts0, user_id=None, event_type='click', value=1.25, props=None),
  dict(event_id=900002, ts=ts0, user_id=7, event_type=None, value=0.123456789, props='{}'),
  dict(event_id=None,  ts=ts0, user_id=8, event_type='view', value=2.0, props=None)])

sd0 = pq.read_table(f'{dst}/lineitem.parquet').column('l_shipdate')[0].as_py()
append('lineitem', [
  dict(l_orderkey=900001, l_partkey=1, l_suppkey=1, l_linenumber=1,
       l_quantity=25.5, l_extendedprice=100.125, l_discount=0.05, l_tax=0.01,
       l_returnflag=None, l_linestatus=None, l_shipdate=sd0)])

od0 = pq.read_table(f'{dst}/orders.parquet').column('o_orderdate')[0].as_py()
append('orders', [
  dict(o_orderkey=900001, o_custkey=None, o_orderstatus='O',
       o_totalprice=10.5, o_orderdate=od0, o_orderpriority='1-URGENT',
       o_clerk='adv', o_shippriority=0)])

append('customer', [
  dict(c_custkey=900001, c_name='adv-null-seg', c_address='x', c_nationkey=0,
       c_phone='0', c_acctbal=0.0, c_mktsegment=None, c_comment='adv'),
  dict(c_custkey=None, c_name='adv-null-key', c_address='x', c_nationkey=0,
       c_phone='0', c_acctbal=0.0, c_mktsegment='BUILDING', c_comment='adv')])
print(f'adversarial fixture written to {dst}')
