package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 20-token docs: a one-token edit keeps shingle Jaccard ~0.85, far above
  // the 0.6 gate even through the 32-hash estimator's noise
  private val tA = "the quick brown fox jumps over the lazy dog while " +
    "seven wizards brew strong coffee beneath the old stone bridge"
  private val tB = "pack my box with five dozen liquor jugs before the " +
    "long train departs from the northern station at dawn today"
  private val tC = "sphinx of black quartz judge my vow as the ancient " +
    "library keeps its ten thousand scrolls in perfect order"
  private val tFresh = "completely unrelated content about orbital " +
    "mechanics and the delta v budget required for a hohmann transfer " +
    "between two circular coplanar orbits"
  private def nearOf(t: String): String =
    t.split(" ").init.mkString(" ") + " tonight"

  private def indexPath(): String =
    java.nio.file.Files.createTempDirectory("dedup_idx").toString + "/idx"

  private def reasons(path: String,
                      batch: Seq[(Long, String)]): Map[Long, String] =
    DedupIndex.admissions(batch.toDF("doc_id", "text"), "doc_id", "text",
        path, DedupIndex.Config())
      .as[(Long, String)].collect().toMap

  test("admission reasons: exact/near, index/batch, priority and id order") {
    val path = indexPath()
    DedupIndex.build(Seq((100L, tA), (101L, tB), (102L, tC))
      .toDF("doc_id", "text"), "doc_id", "text", path)
    val out = reasons(path, Seq(
      (1L, tA),           // verbatim indexed text
      (2L, nearOf(tB)),   // one-token edit of indexed text
      (3L, tFresh),       // genuinely new
      (4L, tFresh + " extended with a few additional trailing tokens " +
        "making it a distinct document"),
      (5L, tFresh + " extended with a few additional trailing tokens " +
        "making it a distinct document"), // exact copy of 4 (4 < 5 wins)
      (6L, nearOf(tFresh))))             // near copy of batch doc 3
    assert(out(1L) === "exact_index")
    assert(out(2L) === "near_index")
    assert(out(3L) === "admitted")
    assert(out(4L) === "admitted")
    assert(out(5L) === "exact_batch")
    assert(out(6L) === "near_batch")
  }

  test("append makes admitted docs visible to the next batch") {
    val path = indexPath()
    DedupIndex.build(Seq((100L, tA)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    val b1 = Seq((1L, tFresh), (2L, tA))
    val r1 = reasons(path, b1)
    assert(r1 === Map(1L -> "admitted", 2L -> "exact_index"))
    // commit ONLY the admitted slice, as the contract prescribes
    DedupIndex.append(Seq((1L, tFresh)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    val r2 = reasons(path, Seq(
      (10L, nearOf(tFresh)), // near the batch-1 ADMITTED doc -> via index
      (11L, tA),             // still caught by the original build
      (12L, tB)))            // new to everything
    assert(r2 === Map(10L -> "near_index", 11L -> "exact_index",
      12L -> "admitted"))
  }

  test("estJaccard: identical sigs 1.0, disjoint 0.0, exact power-of-two division") {
    val df = Seq((Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 9L, 4L))).toDF("a", "b")
    assert(df.select(DedupIndex.estJaccard(col("a"), col("a"), 4))
      .as[Double].head() === 1.0)
    assert(df.select(DedupIndex.estJaccard(col("a"), col("b"), 4))
      .as[Double].head() === 0.75)
  }

  test("compact: prunes retired identity, admissions otherwise identical") {
    val path = indexPath()
    val v1 = Seq((100L, tA), (101L, tB), (102L, tC))
    DedupIndex.build(v1.toDF("doc_id", "text"), "doc_id", "text", path)
    // several appends accumulate small files per table
    DedupIndex.append(Seq((103L, tFresh)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    DedupIndex.append(Seq((104L, tFresh + " with one extra clause about " +
      "plane change maneuvers at apoapsis")).toDF("doc_id", "text"),
      "doc_id", "text", path)
    val probe = Seq(
      (1L, tA),            // dup of a doc that will be RETIRED
      (2L, tB),            // dup of a KEPT doc
      (3L, nearOf(tC)),    // near-dup of a doc that will be CHANGED
      (4L, tFresh),        // dup of an appended KEPT doc
      (5L, "entirely new material concerning the thermodynamics of " +
        "closed cycle heat engines operating between two reservoirs"))
    val before = reasons(path, probe)
    assert(before === Map(1L -> "exact_index", 2L -> "exact_index",
      3L -> "near_index", 4L -> "exact_index", 5L -> "admitted"))

    // corpus v2: 100 removed, 102 changed, 101/103/104 unchanged
    val v2 = Seq((101L, tB), (102L, tC + " amended"), (103L, tFresh),
      (104L, tFresh + " with one extra clause about plane change " +
        "maneuvers at apoapsis"))
    val retired = DedupIndex.retiredDocs(
      Dedup.snapshotDiff((v1 ++ Seq((103L, tFresh))).toDF("doc_id", "text")
        .unionByName(Seq((104L, tFresh + " with one extra clause about " +
          "plane change maneuvers at apoapsis")).toDF("doc_id", "text")),
        v2.toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
    assert(retired.as[Long].collect().toSet === Set(100L, 102L))

    val stats = DedupIndex.compact(spark, path, retired)
    // every table pruned by exactly the retired docs' rows, never grown
    stats.foreach { s =>
      assert(s.rowsAfter < s.rowsBefore, s.toString)
      assert(s.filesAfter > 0, s.toString)
    }
    val exact = spark.read.parquet(s"$path/exact")
    assert(exact.select("doc").as[Long].collect().toSet ===
      Set(101L, 103L, 104L))

    // the contract: same verdicts, except retired docs' dups now admit
    val after = reasons(path, probe)
    assert(after === Map(1L -> "admitted", 2L -> "exact_index",
      3L -> "admitted", 4L -> "exact_index", 5L -> "admitted"))
  }

  test("compact: merges append-accumulated small files") {
    val path = indexPath()
    DedupIndex.build(Seq((1L, tA)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    val fills = Seq(tB, tC, tFresh, nearOf(tA) + " more", nearOf(tB) + " x")
    fills.zipWithIndex.foreach { case (t, i) =>
      DedupIndex.append(Seq((10L + i, t)).toDF("doc_id", "text"),
        "doc_id", "text", path)
    }
    val stats = DedupIndex.compact(spark, path,
      Seq.empty[Long].toDF("doc"))
    stats.foreach { s =>
      assert(s.rowsAfter === s.rowsBefore, s.toString) // nothing retired
      assert(s.filesAfter < s.filesBefore,
        s"files not merged: $s") // 6 writes' worth of parts -> few
    }
  }

  test("pessimistic one-hop: a chain rejects every later sibling") {
    // a ~ b and b ~ c with a !~ c is impossible to build from single-token
    // edits at J>=0.6 without a~c also holding, so use exact copies: the
    // rule's observable contract is that EVERY later sibling of a dup
    // group rejects against the smallest id, admitted or not
    val path = indexPath()
    DedupIndex.build(Seq((100L, tA)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    val out = reasons(path, Seq((1L, tB), (2L, tB), (3L, tB)))
    assert(out === Map(1L -> "admitted", 2L -> "exact_batch",
      3L -> "exact_batch"))
  }
}
