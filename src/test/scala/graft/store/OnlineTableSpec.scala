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

  test("a crashed publish (orphan version dir, log untouched) is invisible and collected") {
    val root = java.nio.file.Files.createTempDirectory("ot2").toString + "/t"
    OnlineTable.publish(Seq((1L, "live")).toDF("k", "v"), root)
    val live = OnlineTable.currentVersion(spark, root).get
    // simulate a writer that died after writing data but before the commit
    Seq((1L, "orphan")).toDF("k", "v")
      .write.parquet(s"$root/v-9999999999999-deadbeef")
    assert(OnlineTable.read(spark, root).get
      .select("v").as[String].head() === "live", "orphan must be invisible")
    // fresh (within the in-flight grace window): a concurrent publisher
    // mid-commit looks exactly like this, so GC must NOT touch it yet
    OnlineTable.publish(Seq((1L, "next")).toDF("k", "v"), root)
    assert(versions(root).contains("v-9999999999999-deadbeef"),
      "an in-grace uncommitted dir must survive GC (it may be mid-commit)")
    // age it past the grace window -> the writer is provably dead
    age(s"$root/v-9999999999999-deadbeef")
    OnlineTable.publish(Seq((1L, "after")).toDF("k", "v"), root)
    assert(!versions(root).contains("v-9999999999999-deadbeef"),
      "aged orphan must be garbage-collected by the next publish")
    assert(!versions(root).contains(live), "superseded snapshots still GC")
  }

  private def age(dir: String): Unit = {
    val f = new java.io.File(dir)
    val old = System.currentTimeMillis() - OnlineTable.OrphanGraceMs - 60000
    assert(f.setLastModified(old))
  }

  test("publishIf: stale expectation loses cleanly; nothing torn") {
    val root = java.nio.file.Files.createTempDirectory("ot6").toString + "/t"
    // CAS from empty: expected None wins
    OnlineTable.publishIf(Seq((1L, "base")).toDF("k", "v"), root, None)
    val v1 = OnlineTable.currentVersion(spark, root).get
    // two read-modify-write publishers both read v1; A commits first
    OnlineTable.publishIf(Seq((1L, "A")).toDF("k", "v"), root, Some(v1))
    val vA = OnlineTable.currentVersion(spark, root).get
    // B's expectation is now stale: it must LOSE, loudly, changing nothing
    val e = intercept[OnlineTable.ConcurrentPublishException](
      OnlineTable.publishIf(Seq((1L, "B")).toDF("k", "v"), root, Some(v1)))
    assert(e.expected === Some(v1) && e.actual === Some(vA))
    assert(OnlineTable.read(spark, root).get
      .select("v").as[String].head() === "A", "loser must not alter the table")
    assert(OnlineTable.currentVersion(spark, root) === Some(vA))
    // a second None-expectation publish on a non-empty table also loses
    intercept[OnlineTable.ConcurrentPublishException](
      OnlineTable.publishIf(Seq((1L, "C")).toDF("k", "v"), root, None))
    // retry with the fresh head succeeds
    OnlineTable.publishIf(Seq((1L, "B2")).toDF("k", "v"), root, Some(vA))
    assert(OnlineTable.read(spark, root).get
      .select("v").as[String].head() === "B2")
  }

  test("interleaved publishers: exclusive create admits exactly one per seq") {
    val root = java.nio.file.Files.createTempDirectory("ot7").toString + "/t"
    OnlineTable.publish(Seq((1L, "v0")).toDF("k", "v"), root)
    // force the low-level race: both writers observed head seq, both
    // target seq+1 — the filesystem admits ONE c-file; the loser's
    // publishIf surfaces the conflict even though its data is written
    val v0 = OnlineTable.currentVersion(spark, root).get
    val t = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        try {
          OnlineTable.publishIf(Seq((1L, s"w$i")).toDF("k", "v"),
            root, Some(v0))
          t.incrementAndGet()
        } catch {
          case _: OnlineTable.ConcurrentPublishException => ()
          case other: Throwable => errs.add(other)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"unexpected failures: $errs")
    assert(t.get() === 1, "exactly one CAS publisher must win")
    val live = OnlineTable.read(spark, root).get.select("v").as[String].head()
    assert(live === "w0" || live === "w1")
    // no torn snapshot: every retained version reads completely
    OnlineTable.listVersions(spark, root).foreach { v =>
      assert(OnlineTable.readVersion(spark, root, v).count() === 1L)
    }
    // retrying unconditional publishers both land (in some order)
    val threads2 = (0 until 2).map { i =>
      new Thread(() =>
        try OnlineTable.publish(Seq((1L, s"r$i")).toDF("k", "v"), root,
          keepVersions = 5)
        catch { case e: Throwable => errs.add(e) })
    }
    threads2.foreach(_.start()); threads2.foreach(_.join(120000))
    assert(errs.isEmpty, s"retrying publish must absorb collisions: $errs")
    val vs = OnlineTable.listVersions(spark, root)
    val tail = vs.takeRight(2).map(v =>
      OnlineTable.readVersion(spark, root, v).select("v").as[String].head())
    assert(tail.toSet === Set("r0", "r1"),
      s"both retrying publishers must be in the log, got $tail")
  }

  test("publishMerge: no publisher's contribution is lost under contention") {
    val root = java.nio.file.Files.createTempDirectory("ot9").toString + "/t"
    OnlineTable.publish(Seq((0L, 0L)).toDF("k", "n"), root, keepVersions = 3)
    // two read-modify-write publishers each add their own row; the loser
    // re-derives from the winner's snapshot, so BOTH rows must land
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() =>
        try OnlineTable.publishMerge(spark, root, snap =>
          snap.get.unionByName(Seq((i.toLong, i.toLong)).toDF("k", "n")),
          keepVersions = 3)
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"publishMerge must absorb the race: $errs")
    val live = OnlineTable.read(spark, root).get
      .as[(Long, Long)].collect().toSet
    assert(live === Set((0L, 0L), (1L, 1L), (2L, 2L)),
      s"a lost update dropped a contribution: $live")
    // single-writer derive-from-empty works too
    val root2 = java.nio.file.Files.createTempDirectory("ot9b").toString + "/t"
    OnlineTable.publishMerge(spark, root2, snap => {
      assert(snap.isEmpty); Seq((9L, 9L)).toDF("k", "n")
    })
    assert(OnlineTable.read(spark, root2).get.count() === 1L)
  }

  test("commit log is authoritative over a stale _CURRENT cache") {
    val root = java.nio.file.Files.createTempDirectory("ot8").toString + "/t"
    OnlineTable.publish(Seq((1L, "one")).toDF("k", "v"), root)
    OnlineTable.publish(Seq((1L, "two")).toDF("k", "v"), root)
    val headV = OnlineTable.currentVersion(spark, root).get
    // simulate a crash between commit and cache flip: point the cache
    // at the PREVIOUS version; resolution must heal from the log
    val stale = OnlineTable.listVersions(spark, root).head
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_CURRENT"), stale.getBytes)
    assert(OnlineTable.currentVersion(spark, root) === Some(headV),
      "the log, not the pointer cache, must resolve the live version")
    assert(OnlineTable.read(spark, root).get
      .select("v").as[String].head() === "two")
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

  // ---- bucketed incremental publish ---------------------------------

  private def latestMerge(key: Seq[String], ts: String, tie: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)
        => org.apache.spark.sql.DataFrame =
    (prev, b) => graft.ops.PointInTime.latestPerKey(
      prev.unionByName(b), key, ts, tie)

  private def genSubdirs(root: String): Set[String] =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("g-"))
      .flatMap(g => g.listFiles().filter(_.isDirectory)
        .map(b => s"${g.getName}/${b.getName}"))
      .toSet

  test("bucketed publish rewrites O(touched buckets), not the table") {
    val root = java.nio.file.Files.createTempDirectory("otb1").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    // seed: 200 keys spread over 16 buckets
    val seed = (1L to 200L).map(k => (k, 1L, s"v$k")).toDF("k", "ts", "v")
    OnlineTable.publishBucketedBatch(seed, root, Seq("k"), m, nBuckets = 16)
    val gensBefore = genSubdirs(root)
    assert(gensBefore.size === 16, s"seed must fill all buckets: $gensBefore")
    // a one-key batch must add gen dirs for exactly ONE bucket
    OnlineTable.publishBucketedBatch(
      Seq((7L, 2L, "updated")).toDF("k", "ts", "v"), root, Seq("k"), m)
    val gensAfter = genSubdirs(root)
    assert((gensAfter -- gensBefore).size === 1,
      s"one-key batch must write exactly one bucket: ${gensAfter -- gensBefore}")
    // the merged table is the latest-per-key union
    val live = OnlineTable.read(spark, root).get
      .as[(Long, Long, String)].collect()
      .map { case (k, ts, v) => k -> ((ts, v)) }.toMap
    assert(live.size === 200 && live(7L) === ((2L, "updated")) &&
      live(8L) === ((1L, "v8")))
    // superseded bucket gens are GC'd once their manifest leaves the log
    OnlineTable.publishBucketedBatch(
      Seq((7L, 3L, "again")).toDF("k", "ts", "v"), root, Seq("k"), m)
    val gensFinal = genSubdirs(root)
    assert((gensBefore -- gensFinal).size === 1,
      "bucket 7's seed gen must be collected once no retained manifest " +
        s"references it; before=${gensBefore.size} final=${gensFinal.size}")
  }

  test("bucketed time travel and torn-snapshot impossibility") {
    val root = java.nio.file.Files.createTempDirectory("otb2").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    OnlineTable.publishBucketedBatch(
      (1L to 50L).map(k => (k, 1L, "a")).toDF("k", "ts", "v"),
      root, Seq("k"), m, nBuckets = 8, keepVersions = 3)
    OnlineTable.publishBucketedBatch(
      Seq((1L, 2L, "b")).toDF("k", "ts", "v"), root, Seq("k"), m,
      keepVersions = 3)
    val vs = OnlineTable.listVersions(spark, root)
    assert(vs.size === 2 && vs.forall(_.startsWith("m-")))
    // the OLD manifest still reads completely (its gens are retained)
    val old = OnlineTable.readVersion(spark, root, vs.head)
      .as[(Long, Long, String)].collect()
      .map { case (k, ts, v) => k -> ((ts, v)) }.toMap
    assert(old.size === 50 && old(1L) === ((1L, "a")))
    val now = OnlineTable.readVersion(spark, root, vs.last)
      .as[(Long, Long, String)].collect()
      .map { case (k, ts, v) => k -> ((ts, v)) }.toMap
    assert(now(1L) === ((2L, "b")) && now.size === 50)
  }

  test("bucketed CAS: concurrent batches both land, no lost update") {
    val root = java.nio.file.Files.createTempDirectory("otb3").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    OnlineTable.publishBucketedBatch(
      Seq((0L, 1L, "base")).toDF("k", "ts", "v"), root, Seq("k"), m,
      nBuckets = 4)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { i =>
      new Thread(() =>
        try OnlineTable.publishBucketedBatch(
          Seq((i.toLong, 1L, s"w$i")).toDF("k", "ts", "v"),
          root, Seq("k"), m)
        catch { case e: Throwable => errs.add(e) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errs.isEmpty, s"bucketed CAS loop must absorb the race: $errs")
    val live = OnlineTable.read(spark, root).get
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(live === Set((0L, "base"), (1L, "w1"), (2L, "w2")),
      s"a lost update dropped a contribution: $live")
  }

  test("bucketed publish migrates a full snapshot and interleaves with publish()") {
    val root = java.nio.file.Files.createTempDirectory("otb4").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    // starts life as a FULL versioned table
    OnlineTable.publish(
      Seq((1L, 1L, "full1"), (2L, 1L, "full2")).toDF("k", "ts", "v"), root)
    // first bucketed batch migrates everything into buckets
    OnlineTable.publishBucketedBatch(
      Seq((2L, 2L, "upd")).toDF("k", "ts", "v"), root, Seq("k"), m,
      nBuckets = 4)
    assert(OnlineTable.currentVersion(spark, root).get.startsWith("m-"))
    val live = OnlineTable.read(spark, root).get
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(live === Set((1L, "full1"), (2L, "upd")))
    // a later FULL publish supersedes the manifest cleanly
    OnlineTable.publish(Seq((9L, 9L, "flat")).toDF("k", "ts", "v"), root)
    assert(OnlineTable.read(spark, root).get.count() === 1L)
    // and its GC (next cycle) collects the manifest's bucket gens
    OnlineTable.publish(Seq((9L, 10L, "flat2")).toDF("k", "ts", "v"), root)
    assert(genSubdirs(root).isEmpty,
      "bucket gens must be collected once no retained manifest remains")
  }

  test("bucket-pruned lookup scans only the keys' buckets, same answer") {
    val root = java.nio.file.Files.createTempDirectory("otb5").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    OnlineTable.publishBucketedBatch(
      (1L to 300L).map(kk => (kk, 1L, s"v$kk")).toDF("k", "ts", "v"),
      root, Seq("k"), m, nBuckets = 16)
    val keys = Seq(7L, 8L).toDF("k")
    val out = OnlineTable.lookup(spark, root, Seq("k"), keys).get
    val got = out.select("k", "v").as[(Long, String)].collect().toSet
    assert(got === Set((7L, "v7"), (8L, "v8")))
    // the scan must reference at most 2 of the 16 bucket dirs
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    import org.apache.spark.sql.execution.datasources.HadoopFsRelation
    val scanned = out.queryExecution.optimizedPlan.collect {
      case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
        r.location.rootPaths.map(_.toString)
    }.flatten.filter(_.contains("__graft_bucket=")).toSet
    assert(scanned.nonEmpty && scanned.size <= 2,
      s"lookup scanned ${scanned.size} buckets: $scanned")
    // a key set hashing to no published bucket returns empty, not error
    assert(OnlineTable.lookup(spark, root, Seq("k"),
      Seq(987654321L).toDF("k")).get.count() >= 0L)
    // non-bucketed snapshot: same API, full-scan fallback
    val root2 = java.nio.file.Files.createTempDirectory("otb6").toString + "/t"
    OnlineTable.publish(Seq((1L, 1L, "x")).toDF("k", "ts", "v"), root2)
    assert(OnlineTable.lookup(spark, root2, Seq("k"), Seq(1L).toDF("k"))
      .get.count() === 1L)
    assert(OnlineTable.lookup(spark, root2 + "_never", Seq("k"),
      Seq(1L).toDF("k")).isEmpty)
  }

  test("lookup serves a legacy plain-parquet table (no log, no pointer)") {
    val root = java.nio.file.Files.createTempDirectory("otb7").toString + "/t"
    // a pre-versioning writer left plain part-files at the root; read()
    // deliberately serves them and lookup must not regress that
    Seq((1L, "old"), (2L, "keep")).toDF("k", "v").write.parquet(root)
    val out = OnlineTable.lookup(spark, root, Seq("k"), Seq(2L).toDF("k"))
    assert(out.isDefined, "legacy table must be served, not 'never published'")
    assert(out.get.select("k", "v").as[(Long, String)].collect().toSet ===
      Set((2L, "keep")))
    // a genuinely never-written root still returns None
    assert(OnlineTable.lookup(spark, root + "_never", Seq("k"),
      Seq(1L).toDF("k")).isEmpty)
  }

  test("an empty FIRST micro-batch is a no-op, not a crash") {
    val root = java.nio.file.Files.createTempDirectory("otb8").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "ts", "v")
    // the stream's first trigger is often empty: publish must no-op,
    // leaving the table unpublished (the old path crashed on
    // require(entries.nonEmpty))
    OnlineTable.publishBucketedBatch(empty, root, Seq("k"), m, nBuckets = 4)
    assert(OnlineTable.currentVersion(spark, root).isEmpty)
    // the next real batch publishes normally
    OnlineTable.publishBucketedBatch(
      Seq((1L, 1L, "a")).toDF("k", "ts", "v"), root, Seq("k"), m,
      nBuckets = 4)
    assert(OnlineTable.read(spark, root).get.count() === 1L)
    // an empty batch against a LIVE bucketed table is also a no-op
    val v = OnlineTable.currentVersion(spark, root)
    OnlineTable.publishBucketedBatch(empty, root, Seq("k"), m)
    assert(OnlineTable.currentVersion(spark, root) === v)
  }

  test("rebucket migrates bucket count under concurrent upserts, no lost update") {
    val root = java.nio.file.Files.createTempDirectory("otb9").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    OnlineTable.publishBucketedBatch(
      (1L to 100L).map(k => (k, 1L, s"v$k")).toDF("k", "ts", "v"),
      root, Seq("k"), m, nBuckets = 4)
    // rebucket 4 -> 16 while upserts race it through the same CAS log
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val rb = new Thread(() =>
      try OnlineTable.rebucket(spark, root, Seq("k"), 16, maxRetries = 20)
      catch { case e: Throwable => errs.add(e) })
    val up = new Thread(() =>
      try (1 to 3).foreach { i =>
        OnlineTable.publishBucketedBatch(
          Seq((i.toLong, 2L, s"upd$i")).toDF("k", "ts", "v"),
          root, Seq("k"), m, maxRetries = 20)
      } catch { case e: Throwable => errs.add(e) })
    rb.start(); up.start(); rb.join(180000); up.join(180000)
    assert(errs.isEmpty, s"rebucket/upsert race must be absorbed: $errs")
    // nothing lost: all 100 keys live, the 3 updates present
    val live = OnlineTable.read(spark, root).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(live.size === 100)
    (1 to 3).foreach(i => assert(live(i.toLong) === s"upd$i",
      s"update $i lost across the rebucket flip"))
    // the live manifest carries the NEW bucket count: a fresh one-key
    // upsert rewrites exactly one of 16 buckets
    val before = genSubdirs(root)
    OnlineTable.publishBucketedBatch(
      Seq((50L, 3L, "post")).toDF("k", "ts", "v"), root, Seq("k"), m)
    val added = genSubdirs(root) -- before
    assert(added.size === 1, s"post-rebucket upsert wrote $added")
    // point lookups stay correct across the flip
    val got = OnlineTable.lookup(spark, root, Seq("k"), Seq(50L).toDF("k"))
      .get.select("v").as[String].collect().toSet
    assert(got === Set("post"))
    // rebucketing a never-published table is a no-op
    OnlineTable.rebucket(spark, root + "_never", Seq("k"), 8)
  }

  test("compact collapses accumulated micro-batch gens into one generation") {
    val root = java.nio.file.Files.createTempDirectory("otb10").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    OnlineTable.publishBucketedBatch(
      (1L to 60L).map(k => (k, 1L, s"v$k")).toDF("k", "ts", "v"),
      root, Seq("k"), m, nBuckets = 16)
    (2L to 11L).foreach { i =>
      OnlineTable.publishBucketedBatch(
        Seq((i, 10L + i, s"u$i")).toDF("k", "ts", "v"), root, Seq("k"), m)
    }
    // retention keeps 2 manifests; their gens span several generations
    assert(genSubdirs(root).map(_.split('/').head).size > 4,
      "micro-batches must have scattered buckets across gens")
    OnlineTable.compact(spark, root, Seq("k"))
    val live = OnlineTable.read(spark, root).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(live.size === 60 && live(3L) === "u3" && live(50L) === "v50")
    // bucket count preserved: a fresh one-key upsert rewrites 1 of 16
    val before = genSubdirs(root)
    OnlineTable.publishBucketedBatch(
      Seq((30L, 99L, "post")).toDF("k", "ts", "v"), root, Seq("k"), m)
    assert((genSubdirs(root) -- before).size === 1)
    // one more publish evicts the last pre-compact manifest: the only
    // retained gens are the compact generation + the two post upserts
    OnlineTable.publishBucketedBatch(
      Seq((31L, 99L, "post2")).toDF("k", "ts", "v"), root, Seq("k"), m)
    val prefixes = genSubdirs(root).map(_.split('/').head)
    assert(prefixes.size <= 3,
      s"pre-compact gens must be collected, still have $prefixes")
    assert(OnlineTable.read(spark, root).get.count() === 60L)
    // compacting a never-published table is a no-op
    OnlineTable.compact(spark, root + "_never", Seq("k"))
  }

  test("three-way race: compact x rebucket x upserts — no lost update, " +
      "no torn reader, monotone log") {
    val root = java.nio.file.Files.createTempDirectory("otb11").toString + "/t"
    val m = latestMerge(Seq("k"), "ts", "ts")
    // seed 100 keys in 4 buckets, then scatter micro-batch gens so the
    // compact thread has real generations to collapse
    OnlineTable.publishBucketedBatch(
      (1L to 100L).map(k => (k, 1L, s"v$k")).toDF("k", "ts", "v"),
      root, Seq("k"), m, nBuckets = 4)
    (2L to 6L).foreach { i =>
      OnlineTable.publishBucketedBatch(
        Seq((i, 2L, s"u$i")).toDF("k", "ts", "v"), root, Seq("k"), m)
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // continuous reader: every observed snapshot must be complete (100
    // keys — upserts touch existing keys only). A missing-files error is
    // NOT torn state: it is the documented retention race (a reader that
    // held a snapshot across >keepVersions commits re-derives, exactly
    // like the writers' isMissingFiles path) — the reader retries; only
    // a WRONG ROW COUNT (a half-visible generation) is a torn snapshot.
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          OnlineTable.read(spark, root).foreach { df =>
            val n = df.count()
            if (n != 100L)
              errs.add(new AssertionError(s"torn snapshot: $n rows"))
          }
        } catch {
          case _: Throwable => () // retention race: re-derive next loop
        }
      }
    })
    val rb = new Thread(() =>
      try OnlineTable.rebucket(spark, root, Seq("k"), 16, maxRetries = 40)
      catch { case e: Throwable => errs.add(e) })
    val cp = new Thread(() =>
      try OnlineTable.compact(spark, root, Seq("k"), maxRetries = 40)
      catch { case e: Throwable => errs.add(e) })
    val up = new Thread(() =>
      try (1 to 5).foreach { i =>
        OnlineTable.publishBucketedBatch(
          Seq((i.toLong, 3L, s"upd$i")).toDF("k", "ts", "v"),
          root, Seq("k"), m, maxRetries = 40)
      } catch { case e: Throwable => errs.add(e) })
    reader.start(); rb.start(); cp.start(); up.start()
    rb.join(180000); cp.join(180000); up.join(180000)
    stop.set(true); reader.join(60000)
    assert(errs.isEmpty, s"three-way race must be absorbed cleanly: $errs")
    // no lost update: every key lives, and latest-ts wins everywhere —
    // ts=3 upserts over ts=2 scatter over the ts=1 seed, regardless of
    // which side of the rebucket/compact flips each one landed on
    val live = OnlineTable.read(spark, root).get
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(live.size === 100)
    (1 to 5).foreach(i => assert(live(i.toLong) === s"upd$i",
      s"update $i lost across the compact/rebucket flips"))
    assert(live(6L) === "u6")
    assert(live(50L) === "v50")
    // monotone, gapless log: 1 seed + 5 scatter + 5 upserts + rebucket +
    // compact = 13 successful commits, each consuming exactly one seq
    // (CAS losers retry WITHOUT committing); retention GC trims only a
    // prefix, so the retained window is contiguous up to head = 13
    val seqs = Option(new java.io.File(root, "_commits").listFiles())
      .toSeq.flatten.map(_.getName).filter(_.startsWith("c-"))
      .map(_.stripPrefix("c-").toLong).sorted
    assert(seqs.nonEmpty && seqs.last === 13L,
      s"head seq must be 13 (one per successful commit), got $seqs")
    assert(seqs === (seqs.head to seqs.last),
      s"retained commit window must be gapless, got $seqs")
    // the surviving manifest is coherent: a one-key upsert rewrites
    // exactly ONE bucket of whichever count won the count race (4 if
    // compact's re-derive landed last, 16 if the rebucket did)
    val before = genSubdirs(root)
    OnlineTable.publishBucketedBatch(
      Seq((42L, 9L, "post")).toDF("k", "ts", "v"), root, Seq("k"), m)
    assert((genSubdirs(root) -- before).size === 1)
    val got = OnlineTable.lookup(spark, root, Seq("k"), Seq(42L).toDF("k"))
      .get.select("v").as[String].collect().toSet
    assert(got === Set("post"))
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
