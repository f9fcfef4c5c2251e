package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hot-basket proof for the ItemCF cap (q268/q274's pair stage).
  *
  * The self-join on the basket key does |b|² work on ONE join key per
  * basket; a planted power-user basket (10k items — the bot-history
  * shape real data produces) must be excluded by [[ItemCf.cappedBaskets]]
  * so that no single join key emits more than cap² rows, and the drop
  * must be VISIBLE through [[ItemCf.droppedLedger]] (no silent caps).
  */
class ItemCfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 60 organic baskets of 1..30 items, plus basket 999 with 10_000 items
  private val cap = 100
  private def fixture = {
    val organic = (1 to 60).flatMap { bk =>
      (0 until (bk % 30) + 1).map(i => (bk.toLong, (bk * 31 + i).toLong))
    }
    val hot = (0 until 10000).map(i => (999L, 100000L + i))
    (organic ++ hot).toDF("bk", "item")
  }

  test("cappedBaskets drops exactly the hot basket, keeps organics intact") {
    val li = fixture
    val capped = ItemCf.cappedBaskets(li, cap = cap)
    assert(capped.filter($"bk" === 999L).count() === 0L)
    assert(capped.count() === li.count() - 10000L)
    // organic rows survive bit-for-bit (not just by count)
    assert(capped.exceptAll(li.filter($"bk" =!= 999L)).count() === 0L)
  }

  test("no single join key emits more than cap² rows through the pair join") {
    val capped = ItemCf.cappedBaskets(fixture, cap = cap)
    // the exact q268 pair stage: self-join on bk, per-key output = |b|²
    val perKey = capped.as("a").join(capped.as("b"), col("a.bk") === col("b.bk"))
      .groupBy(col("a.bk")).agg(count(lit(1)).as("n"))
    val worst = perKey.agg(max($"n")).as[Long].head()
    assert(worst <= cap.toLong * cap,
      s"a join key emitted $worst rows — the cap did not bound the pair stage")
    // and the uncapped fixture genuinely WOULD have blown past the bound:
    // the hot basket alone is 10k² = 10⁸ rows on one key (asserted on the
    // size arithmetic, not by executing the explosion)
    val hotSize = fixture.filter($"bk" === 999L).count()
    assert(hotSize * hotSize > cap.toLong * cap * 1000)
  }

  test("droppedLedger accounts for the drop — census, rows, pair work") {
    val row = ItemCf.droppedLedger(fixture, cap = cap).collect().head
    assert(row.getAs[Long]("n_baskets") === 61L)
    assert(row.getAs[Long]("n_dropped") === 1L)
    assert(row.getAs[Long]("dropped_rows") === 10000L)
    assert(row.getAs[Long]("max_basket") === 10000L)
    assert(row.getAs[Long]("max_kept") === 30L)
    // Σ|b|² over kept baskets, computed independently
    val expect = (1 to 60).map { bk => val b = (bk % 30) + 1; b.toLong * b }.sum
    assert(row.getAs[Double]("pair_work_kept") === expect.toDouble)
  }

  test("ledger on an all-kept universe reports zero drops and NULL-free caps") {
    val li = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("bk", "item")
    val row = ItemCf.droppedLedger(li, cap = cap).collect().head
    assert(row.getAs[Long]("n_dropped") === 0L)
    assert(row.getAs[Long]("max_kept") === 2L)
    assert(row.getAs[Double]("pair_work_kept") === 5.0)
  }
}
