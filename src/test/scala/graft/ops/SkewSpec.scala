package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedJoin produces exactly the plain-join result") {
    // hot key: 900 of 1000 rows share key 1
    val left = spark.range(1000)
      .select(when(col("id") < 900, 1L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = Seq((1L, "hot"), (950L, "cold"), (999L, "tail"))
      .toDF("k", "attr")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 8)
      .select("k", "payload", "attr").as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size === 902)
  }

  test("saltedJoin left-outer keeps unmatched left rows once") {
    val left = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val right = Seq((1L, "only")).toDF("k", "attr")
    val out = Skew.saltedJoin(left, right, Seq("k"), 4, "left")
      .select("k", "attr").as[(Long, Option[String])].collect().toSeq.sorted
    assert(out === Seq((1L, Some("only")), (2L, None)))
  }

  test("hotKeys surfaces every truly-hot key, never misses one") {
    // 40% of rows on one key, 15% on another, tail uniform over 500 —
    // the measured replacement for a-priori salting decisions
    val rows = (0 until 10000).map { i =>
      if (i % 10 < 4) "hot" else if (i % 20 >= 17) "warm" else s"c${i % 500}"
    }
    val df = rows.toDF("k").repartition(8)
    val (hits, n) = Skew.hotKeys(df, "k", minShare = 0.10, k = 128)
    assert(n === 10000L)
    val keys = hits.map(_.key)
    assert(keys.contains("hot") && keys.contains("warm"),
      s"missed a truly-hot key in $keys")
    // over-approximation is allowed but bounded: nothing in the cold
    // tail can have upper bound >= 10% with k=128 (off <= N/129 < 1%)
    assert(keys.forall(Set("hot", "warm")), s"cold keys flagged: $keys")
    // guarantee precondition enforced loudly
    val e = intercept[IllegalArgumentException](
      Skew.hotKeys(df, "k", minShare = 0.001, k = 16))
    assert(e.getMessage.contains("raise k"))
  }

  test("autoSaltedJoin: salts only when a measured hot key warrants it") {
    val hotLeft = spark.range(2000)
      .select(when(col("id") < 1200, lit("hot")).otherwise(
        concat(lit("c"), col("id"))).as("k"), col("id").as("payload"))
    val right = (Seq("hot") ++ (0 until 50).map(i => s"c${1200 + i}"))
      .map(k => (k, s"attr_$k")).toDF("k", "attr")
    val plain = hotLeft.join(right, Seq("k"))
      .select("k", "payload", "attr").as[(String, Long, String)]
      .collect().toSet
    val (salted, fired) = Skew.autoSaltedJoin(hotLeft, right, "k",
      buckets = 8, minShare = 0.10)
    assert(fired, "a 60% key must trigger salting")
    assert(salted.select("k", "payload", "attr")
      .as[(String, Long, String)].collect().toSet === plain)
    // uniform keys: the measurement says no — plain join, no replication
    val uniform = spark.range(2000)
      .select(concat(lit("u"), col("id") % 500).as("k"),
        col("id").as("payload"))
    val (out, fired2) = Skew.autoSaltedJoin(uniform, right, "k",
      buckets = 8, minShare = 0.10)
    assert(!fired2, "no key near 10% share — salting must not fire")
    assert(out.queryExecution.executedPlan.toString.contains("Join"))
  }

  test("saltedAgg count equals plain groupBy count") {
    val df = spark.range(10000)
      .select((col("id") % 3).as("k"), col("id").as("v"))
    val plain = df.groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    val salted = Skew.saltedAgg(df, Seq("k"), buckets = 16,
      partial = count, merge = sum, valueCol = "v", as = "count")
      .as[(Long, Long)].collect().toMap
    assert(salted === plain)
  }
}
