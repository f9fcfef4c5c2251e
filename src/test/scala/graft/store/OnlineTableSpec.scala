package graft.store

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class OnlineTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def versions(root: String): Set[String] =
    new java.io.File(root).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v-"))
      .map(_.getName).toSet

  test("publish/read roundtrip; pointer flips; old snapshots GC'd after one cycle") {
    val root = java.nio.file.Files.createTempDirectory("ot").toString + "/t"
    assert(OnlineTable.read(spark, root).isEmpty)
    OnlineTable.publish(Seq((1L, "a")).toDF("k", "v"), root)
    val v1 = OnlineTable.currentVersion(spark, root).get
    assert(OnlineTable.read(spark, root).get.as[(Long, String)].head() === ((1L, "a")))

    OnlineTable.publish(Seq((1L, "b")).toDF("k", "v"), root)
    val v2 = OnlineTable.currentVersion(spark, root).get
    assert(v2 !== v1)
    assert(OnlineTable.read(spark, root).get.as[(Long, String)].head() === ((1L, "b")))
    // previous retained for in-flight readers
    assert(versions(root) === Set(v1, v2))

    OnlineTable.publish(Seq((1L, "c")).toDF("k", "v"), root)
    val v3 = OnlineTable.currentVersion(spark, root).get
    // v1 collected, v2 retained
    assert(versions(root) === Set(v2, v3))
  }

  test("a crashed publish (orphan version dir, pointer untouched) is invisible and collected") {
    val root = java.nio.file.Files.createTempDirectory("ot2").toString + "/t"
    OnlineTable.publish(Seq((1L, "live")).toDF("k", "v"), root)
    val live = OnlineTable.currentVersion(spark, root).get
    // simulate a writer that died after writing data but before the flip
    Seq((1L, "orphan")).toDF("k", "v")
      .write.parquet(s"$root/v-9999999999999-deadbeef")
    assert(OnlineTable.read(spark, root).get
      .select("v").as[String].head() === "live", "orphan must be invisible")
    OnlineTable.publish(Seq((1L, "next")).toDF("k", "v"), root)
    assert(!versions(root).contains("v-9999999999999-deadbeef"),
      "orphan must be garbage-collected by the next publish")
    assert(versions(root).contains(live))
  }

  test("time travel: deeper retention keeps history readable by version") {
    val root = java.nio.file.Files.createTempDirectory("ot4").toString + "/t"
    OnlineTable.publish(Seq((1L, "gen1")).toDF("k", "v"), root, keepVersions = 3)
    OnlineTable.publish(Seq((1L, "gen2")).toDF("k", "v"), root, keepVersions = 3)
    OnlineTable.publish(Seq((1L, "gen3")).toDF("k", "v"), root, keepVersions = 3)
    val vs = OnlineTable.listVersions(spark, root)
    assert(vs.size === 3)
    assert(OnlineTable.readVersion(spark, root, vs.head)
      .select("v").as[String].head() === "gen1")
    assert(OnlineTable.readVersion(spark, root, vs.last)
      .select("v").as[String].head() === "gen3")
    // a fourth publish evicts gen1
    OnlineTable.publish(Seq((1L, "gen4")).toDF("k", "v"), root, keepVersions = 3)
    val vs2 = OnlineTable.listVersions(spark, root)
    assert(vs2.size === 3 && !vs2.contains(vs.head))
    assert(OnlineTable.read(spark, root).get
      .select("v").as[String].head() === "gen4")
  }

  test("legacy plain-parquet table is readable and migrated by publishes") {
    val root = java.nio.file.Files.createTempDirectory("ot5").toString + "/t"
    // a pre-versioning writer left plain part-files at the root
    Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
      .write.parquet(root)
    assert(OnlineTable.read(spark, root).get.count() === 2,
      "legacy layout must be served as the live snapshot")
    // first versioned publish merges over it (as upsertOnline would)
    val merged = OnlineTable.read(spark, root).get
      .filter(col("k") =!= 1L)
      .unionByName(Seq((1L, "new")).toDF("k", "v"))
    OnlineTable.publish(merged, root)
    val out = OnlineTable.read(spark, root).get
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "new", 2L -> "keep"))
    // legacy files are retained one cycle (in-flight readers), then GC'd
    def legacyCount = new java.io.File(root).listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(legacyCount > 0, "legacy retained for one publish cycle")
    OnlineTable.publish(out.toSeq.toDF("k", "v"), root)
    assert(legacyCount === 0, "legacy collected on the next publish")
  }

  test("getOnlineFeatures broadcasts keys against the live snapshot") {
    val root = java.nio.file.Files.createTempDirectory("ot3").toString + "/t"
    val view = FeatureStore.FeatureView("v", Seq("k"), "ts", 1000000L, Seq("f"))
    FeatureStore.materializeOnline(view,
      Seq((1L, 10L, "x"), (1L, 20L, "y"), (2L, 5L, "z"))
        .toDF("k", "ts", "f"), root)
    val out = FeatureStore.getOnlineFeatures(spark, root, view,
        Seq(Tuple1(1L)).toDF("k"))
      .select("k", "f").as[(Long, String)].collect().toSet
    assert(out === Set((1L, "y")))
  }
}
