package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy-match join — entity resolution's workhorse: match
  * dirty mentions against a canonical dictionary within a bounded edit
  * distance WITHOUT the all-pairs cross join. Candidate generation is
  * equi-join blocking: an edit changes a string's length by at most 1
  * per edit, so a mention within distance d of a canonical has length
  * within ±d — the mention side explodes its 2d+1 plausible lengths
  * and equi-joins the canonical side's exact length, with the first
  * character as a second key (sound when corruptions spare position 0;
  * callers whose noise hits the head should add a key generator).
  * Exact `levenshtein` then filters candidates — the verify step never
  * sees more than one block's worth per mention.
  *
  * Scale shape: ONE equi-join on (length, head) keys; candidates per
  * mention are bounded by the canonical block sizes, never the
  * dictionary size. All-integer blocking and the codegen'd
  * `levenshtein` keep the whole path deterministic and
  * oracle-replayable (DuckDB ships the same function).
  *
  * Reference scope: the reference's Categorify maps EXACT string keys
  * to ids (nvtabular ops); real crawl/member data carries typos, and
  * fuzzy resolution against the same dictionaries is the first cleanup
  * step a production feature pipeline adds. */
object Fuzzy {

  /** Join `mentions(mentionCol)` to `canon(canonCol)` at edit distance
    * ≤ `maxDist`. Returns mention rows joined with matching canonical
    * rows plus a `lev` column; unmatched mentions drop (inner
    * semantics — wrap with a left join against the result to audit
    * misses). NULL/empty strings on either side drop. */
  def blockedJoin(mentions: DataFrame, canon: DataFrame,
                  mentionCol: String, canonCol: String,
                  maxDist: Int): DataFrame = {
    require(maxDist >= 0 && maxDist <= 4,
      "maxDist out of the blocking design range (0..4)")
    val m = mentions
      .filter(col(mentionCol).isNotNull && length(col(mentionCol)) > 0)
      .withColumn("__mlen", length(col(mentionCol)))
      .withColumn("__blk",
        explode(sequence(col("__mlen") - maxDist, col("__mlen") + maxDist)))
      .withColumn("__mh", substring(col(mentionCol), 1, 1))
    val c = canon
      .filter(col(canonCol).isNotNull && length(col(canonCol)) > 0)
      .withColumn("__blk", length(col(canonCol)))
      .withColumn("__mh", substring(col(canonCol), 1, 1))
    m.join(c, Seq("__blk", "__mh"))
      .withColumn("lev", levenshtein(col(mentionCol), col(canonCol)))
      .filter(col("lev") <= maxDist)
      .drop("__blk", "__mh", "__mlen")
  }
}
