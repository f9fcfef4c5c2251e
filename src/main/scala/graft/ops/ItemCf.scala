package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Basket-size discipline for item-item co-occurrence (ItemCF).
  *
  * Pair generation in an ItemCF self-join does Σ|basket|² work, and —
  * worse — ALL of one basket's |b|² pair rows land on that basket's
  * single join key. Nothing in the data model bounds |b|: one bot
  * account's 10k-item history is a 10⁸-row single-key task, the classic
  * skewed-shuffle killer (salting does not help a SELF-join on the
  * basket key — the work itself is quadratic in the hot basket, not
  * merely misplaced). The production cure is a cap: baskets larger than
  * [[MaxBasketSize]] carry no co-occurrence signal worth their cost
  * (their pairs are weak-association noise at support ~1/|b|²), so they
  * are EXCLUDED from the pair stage — visibly, not silently: the cap is
  * part of the query's declared semantics (the DuckDB oracle applies
  * the identical filter) and [[droppedLedger]] is the q253-style
  * accounting row that reports exactly what was dropped.
  *
  * The cap filter is a bounded per-key window (COUNT OVER PARTITION BY
  * basket), which leaves the surviving rows hash-partitioned by the
  * basket key — exactly the partitioning the self-join needs next, so
  * the guard costs one reusable exchange, not an extra shuffle.
  */
object ItemCf {

  /** Default basket cap: 1000 items bounds any single join key's pair
    * output at 10⁶ rows (~one healthy task) while sitting ~100× above
    * any organic order size in the AliCCP/TPC-H-shaped data. */
  val MaxBasketSize = 1000

  /** `baskets` rows (one per basket-key × item) restricted to baskets
    * with at most `cap` items. Deterministic, order-insensitive; the
    * oracle twin is `COUNT(*) OVER (PARTITION BY bk) <= cap`. */
  def cappedBaskets(baskets: DataFrame, bkCol: String = "bk",
                    cap: Int = MaxBasketSize): DataFrame = {
    val w = Window.partitionBy(col(bkCol))
    baskets.withColumn("__bsz", count(lit(1)).over(w))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
  }

  /** Cosine-scored symmetric co-occurrence pair table over an
    * ALREADY-CAPPED basket frame (`bk`, `item`): per-basket self-join →
    * unordered pair counts (each pair grouped once, ia < ib, then
    * mirrored) → cosine c_ab/√(c_a·c_b) with each marginal cast to
    * double BEFORE the product (BIGINT c_a·c_b overflows past ~3e9-count
    * hub items) and quantized to the 1e-6 grid BEFORE any ranking
    * (cross-engine-exact tie order). Columns: ia, ib, cab, ca, cb, cos.
    * The q268 pipeline; Scaling's hot-basket row drives it directly. */
  def pairScores(cappedLi: DataFrame): DataFrame = {
    val cnt = cappedLi.groupBy(col("item")).agg(count(lit(1)).as("c"))
    val half = cappedLi.as("a")
      .join(cappedLi.as("b"), col("a.bk") === col("b.bk"))
      .filter(col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("cab"))
    val sym = half.unionByName(half.select(col("ib").as("ia"),
      col("ia").as("ib"), col("cab")))
    sym
      .join(cnt.select(col("item").as("ia"), col("c").as("ca")), "ia")
      .join(cnt.select(col("item").as("ib"), col("c").as("cb")), "ib")
      .withColumn("cos", floor(col("cab").cast("double") /
        sqrt(col("ca").cast("double") * col("cb").cast("double"))
        * 1e6 + 0.5) / 1e6)
  }

  /** One-row accounting frame for the cap — the no-silent-caps ledger:
    * how many baskets exist, how many the cap dropped (with their item
    * rows), the largest basket seen vs the largest kept, and the pair
    * work Σ|b|² the KEPT universe admits (the self-join's exact output
    * bound, on DECIMAL(38,0) so a trillion-basket corpus can't overflow
    * the ledger itself; reported as double magnitude). */
  def droppedLedger(baskets: DataFrame, bkCol: String = "bk",
                    cap: Int = MaxBasketSize): DataFrame = {
    val d38 = "decimal(38,0)"
    baskets.groupBy(col(bkCol)).agg(count(lit(1)).as("bsz"))
      .agg(
        count(lit(1)).as("n_baskets"),
        sum(when(col("bsz") > cap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("bsz") > cap, col("bsz")).otherwise(0L))
          .as("dropped_rows"),
        max(col("bsz")).as("max_basket"),
        max(when(col("bsz") <= cap, col("bsz"))).as("max_kept"),
        sum(when(col("bsz") <= cap,
          col("bsz").cast(d38) * col("bsz").cast(d38))
          .otherwise(lit(0).cast(d38))).as("pair_work_kept"))
      .select(col("n_baskets"), col("n_dropped"), col("dropped_rows"),
        col("max_basket"), col("max_kept"),
        col("pair_work_kept").cast("double").as("pair_work_kept"))
  }
}
