package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native (whole-stage-codegen'd) codec for the AliCCP sparse KV feature
  * encoding: triples `field\x02feat\x03weight` joined by `\x01`.
  *
  * The reference parses this with row-at-a-time Python UDFs
  * (`process_csv_line` at /root/reference/data_processing/batch_processing/
  * batch_process_Bronze_to_Silver.py:69-73 and `process_csv_line_2` at
  * :76-84): split on the regex `[\x01\x02\x03]`, keep token positions
  * 0,3,6,… as keys and 1,4,7,… as values — the per-feature weight at
  * positions 2,5,… is discarded. Duplicate field ids are last-wins
  * (Python `dict.update`, :81).
  *
  * Here the same semantics are pure `org.apache.spark.sql.functions`
  * compositions, so the parse stays inside WholeStageCodegen and the
  * columnar scan pipeline — no serialization barrier. At 100 TB this is the
  * difference between a scan-bound job and a Python-worker-bound one
  * (SURVEY.md §4.2 pathology #1).
  *
  * Requires `spark.sql.mapKeyDedupPolicy=LAST_WIN` (GraftSession sets it)
  * so `map_from_entries`/`map_concat` replicate dict.update last-wins.
  */
object AliccpCodec {
  /** Joins triples. */
  val RecSep = "\u0001"
  /** field -> feat. */
  val KvSep = "\u0002"
  /** feat -> weight. */
  val WeightSep = "\u0003"

  /** `"f1\x02v1\x031.0\x01f2\x02v2\x031.0"` -> map(f1->v1, f2->v2).
    * Null/empty blobs -> empty map; weight dropped; last-wins duplicates. */
  def parseKv(blob: Column): Column = {
    val triples = filter(split(coalesce(blob, lit("")), RecSep), t => length(t) > 0)
    map_from_entries(
      transform(triples, t =>
        struct(
          substring_index(t, KvSep, 1).as("key"),
          substring_index(substring_index(t, WeightSep, 1), KvSep, -1).as("value"))))
  }

  /** [[parseKv]] semantics via the custom single-pass codegen'd expression
    * [[ParseKvExpr]] (registered as SQL `parse_kv` by GraftExtensions) —
    * the hot-path variant used by the Bronze->Silver spine. Property-tested
    * equal to [[parseKv]] in ParseKvExprSpec. */
  def parseKvFast(blob: Column): Column =
    call_function("parse_kv", coalesce(blob, lit("")))

  /** Inverse of [[parseKv]] (weight fixed to `1.0`) — for round-trip tests
    * and fixture synthesis. Preserves map entry order. */
  def formatKv(m: Column): Column =
    array_join(
      transform(map_entries(m), e =>
        concat(e("key"), lit(KvSep), e("value"), lit(WeightSep), lit("1.0"))),
      RecSep)

  /** Merge maps with last-wins precedence (later args win), mirroring the
    * reference's `feat_dict.update(value_dict)` at
    * batch_process_Bronze_to_Silver.py:79-81 — the skeleton dict is built
    * first and the common map overwrites it, so pass (skeleton, common). */
  def mergeKv(maps: Column*): Column = map_concat(maps: _*)

  /** Extract a field id from a parsed map as a nullable int column named
    * `name` — the 25-column Silver projection primitive
    * (batch_process_Bronze_to_Silver.py:206-300). `try_element_at` mirrors
    * the reference's dict `.get` None-on-missing under ANSI mode, and
    * `try_cast` mirrors PySpark 3.3's non-ANSI null-on-garbage cast (Spark
    * 4 ANSI `cast` would throw); the reference's `when(isNotNull)` guard is
    * redundant (cast of null is null). */
  def field(m: Column, fieldId: String, name: String): Column =
    try_element_at(m, lit(fieldId)).try_cast("int").as(name)
}
