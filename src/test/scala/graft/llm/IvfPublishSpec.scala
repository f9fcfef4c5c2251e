package graft.llm

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of the index publish step: exactly one publisher
  * wins, the published tree is always complete, losers drop their tmp
  * builds, and nothing throws. Pure file ops — no Spark session needed. */
class IvfPublishSpec extends AnyFunSuite {

  private def mkIndexDir(base: Path, tag: String, content: String): Path = {
    val d = Files.createDirectories(base.resolve(s"index.tmp.$tag"))
    Files.writeString(d.resolve("part-0000.parquet"), content)
    Files.writeString(d.resolve("_SUCCESS"), "")
    d
  }

  private def treeComplete(fin: Path): Boolean =
    Files.exists(fin.resolve("part-0000.parquet")) &&
      Files.exists(fin.resolve("_SUCCESS"))

  test("concurrent atomic publishers: one wins, tree complete, tmps gone") {
    for (round <- 0 until 5) {
      val base = Files.createTempDirectory(s"ivf_pub_$round")
      val fin = base.resolve("index")
      val tmps = (0 until 4).map(i => mkIndexDir(base, s"t$i", s"builder-$i"))
      val threads = tmps.map { t =>
        new Thread(() => IvfIndex.publish(t, fin))
      }
      threads.foreach(_.start())
      threads.foreach(_.join(30000))
      assert(treeComplete(fin), s"round $round: published tree incomplete")
      tmps.foreach(t => assert(!Files.exists(t),
        s"round $round: losing tmp $t not cleaned up"))
    }
  }

  test("locked fallback path: racing non-atomic publishers never interleave") {
    for (round <- 0 until 5) {
      val base = Files.createTempDirectory(s"ivf_lock_$round")
      val fin = base.resolve("index")
      val cause = new java.nio.file.FileSystemException("forced-fallback")
      val tmps = (0 until 4).map(i => mkIndexDir(base, s"t$i", s"builder-$i"))
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = tmps.map { t =>
        new Thread(() =>
          try IvfIndex.publishLocked(t, fin, cause)
          catch { case e: Throwable => errs.add(e) })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(30000))
      assert(errs.isEmpty, s"round $round: fallback publisher threw: $errs")
      assert(treeComplete(fin), s"round $round: fallback tree incomplete")
      tmps.foreach(t => assert(!Files.exists(t),
        s"round $round: losing tmp $t not cleaned up"))
    }
  }

  test("publish onto an already-published index drops the duplicate build") {
    val base = Files.createTempDirectory("ivf_dup")
    val fin = base.resolve("index")
    IvfIndex.publish(mkIndexDir(base, "first", "winner"), fin)
    val loser = mkIndexDir(base, "second", "loser")
    IvfIndex.publish(loser, fin) // must not throw, must not replace
    assert(Files.readString(fin.resolve("part-0000.parquet")) === "winner")
    assert(!Files.exists(loser))
  }

  test("fallback with nothing published and a failing move surfaces the cause") {
    val base = Files.createTempDirectory("ivf_cause")
    val fin = base.resolve("index")
    val cause = new java.nio.file.FileSystemException("original-failure")
    // tmp does not exist -> plain move fails -> the ORIGINAL cause surfaces
    val ghost = base.resolve("index.tmp.ghost")
    val thrown = intercept[java.nio.file.FileSystemException](
      IvfIndex.publishLocked(ghost, fin, cause))
    assert(thrown.getMessage.contains("original-failure"))
  }
}
