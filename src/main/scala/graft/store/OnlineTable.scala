package graft.store

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned online-table layout with an optimistic-concurrency commit
  * log — the object-store-safe replacement for directory-rename swaps
  * (which are neither atomic nor portable off a local filesystem:
  * `java.io.File` cannot address HDFS/S3, and S3 has no atomic
  * directory rename at all).
  *
  * Layout under `root`:
  * {{{
  *   root/_commits/c-<seq>   <- the POINTER LOG: one file per commit,
  *                              created EXCLUSIVELY, naming the version
  *   root/_CURRENT           <- cache of the log head (legacy readers)
  *   root/v-<version>/       <- immutable, fully-written parquet snapshots
  * }}}
  *
  * A publish writes a NEW version directory to completion, then commits
  * by creating `_commits/c-<head+1>` with `overwrite=false` — an
  * EXCLUSIVE create (atomic on posix and HDFS; on an object store the
  * equivalent is a conditional PUT, e.g. S3 If-None-Match). Two
  * concurrent publishers that both read head N both target `c-<N+1>`;
  * the filesystem admits exactly ONE — the loser observes the collision
  * and either retries against the new head ([[publish]]) or surfaces
  * [[ConcurrentPublishException]] ([[publishIf]], the compare-and-set
  * form: commit only if the live version still equals what the caller
  * read). This is the multi-writer optimistic-concurrency core of the
  * transactional table formats (Delta's `_delta_log/<n>.json` exclusive
  * create is the same protocol).
  *
  * Readers resolve the log head then scan an immutable directory, so
  * they can never observe a half-written table; a reader holding the
  * previous version keeps working because the previous snapshot is
  * retained for one publish cycle (older ones are garbage-collected).
  * A writer crash before the commit leaves only an unreferenced version
  * dir, collected by the first successful publish after it ages past
  * [[OrphanGraceMs]]; a crash AFTER the
  * commit but before the `_CURRENT` cache flip is healed because the
  * log, not the cache, is authoritative.
  */
object OnlineTable {

  private val CurrentFile = "_CURRENT"
  private val CommitDir = "_commits"
  private val PublishRetries = 100

  /** Grace window before an UNCOMMITTED version dir is collected: a
    * concurrent publisher that has fully written its snapshot but not
    * yet won its commit must not have the dir swept from under its
    * commit (the torn-snapshot race). Committed-but-superseded
    * snapshots need no grace — the log proves no commit can ever
    * reference them again. Crashed/lost-race orphans are collected by
    * the first successful publish after they age past this window. */
  val OrphanGraceMs: Long = 3600L * 1000

  /** The optimistic check failed: another publisher committed between
    * the caller's read of the live version and its commit attempt. */
  final case class ConcurrentPublishException(
      expected: Option[String], actual: Option[String])
    extends RuntimeException(
      s"concurrent publish: expected live version $expected, log head is $actual")

  private def fsOf(spark: SparkSession, root: String): (FileSystem, Path) = {
    val rootPath = new Path(root)
    (rootPath.getFileSystem(spark.sessionState.newHadoopConf()), rootPath)
  }

  private def readSmall(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.commons.io.IOUtils.copy(in, buf)
      buf.toString("UTF-8").trim
    } finally in.close()
  }

  /** Read a commit file's version, tolerating the create→write window
    * of a NON-local winner mid-commit (local commits are hard-linked
    * into place content-complete, see [[tryCommit]]): brief bounded
    * retries while empty, then fail loudly — an empty commit file past
    * the window means a writer died inside the two-step create, which
    * the single-step local path exists to prevent. */
  private def readCommit(fs: FileSystem, p: Path): String = {
    var waited = 0L
    var v = readSmall(fs, p)
    while (v.isEmpty && waited < 2000L) {
      Thread.sleep(20L); waited += 20L
      v = readSmall(fs, p)
    }
    require(v.nonEmpty, s"commit file $p is empty — writer died mid-commit")
    v
  }

  /** Retained commit-log entries, seq-ascending. */
  private def logEntries(fs: FileSystem, rootPath: Path): Seq[(Long, String)] = {
    val dir = new Path(rootPath, CommitDir)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("c-"))
      .flatMap { st =>
        // a concurrent publisher's GC may collect a stale commit file
        // between our listing and the read — a vanished entry is simply
        // no longer part of the retained log
        try Some((st.getPath.getName.stripPrefix("c-").toLong,
          readCommit(fs, st.getPath)))
        catch { case _: java.io.FileNotFoundException => None }
      }
      .sortBy(_._1)
  }

  /** Log head (seq, version): the commit log if present, else the
    * legacy pointer file at synthetic seq 0. */
  private def head(fs: FileSystem, rootPath: Path): Option[(Long, String)] =
    logEntries(fs, rootPath).lastOption.orElse {
      val ptr = new Path(rootPath, CurrentFile)
      if (fs.exists(ptr)) Some((0L, readSmall(fs, ptr))) else None
    }

  /** One exclusive commit attempt at `seq`; false on collision.
    *
    * Local filesystems get the strongest form: the content is written
    * to a temp file, then HARD-LINKED to the commit name — link(2) is
    * atomic AND exclusive (EEXIST), and the destination appears with
    * its content COMPLETE, so no reader can ever observe an empty
    * commit file. Non-local filesystems fall back to Hadoop's
    * exclusive create + write (HDFS's atomic-create lease protocol;
    * on an object store substitute the conditional PUT), whose brief
    * create→write window [[readCommit]] tolerates. */
  private def tryCommit(fs: FileSystem, rootPath: Path, seq: Long,
                        version: String): Boolean = {
    val dir = new Path(rootPath, CommitDir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val p = new Path(dir, f"c-$seq%012d")
    if ("file" == fs.getScheme) {
      import java.nio.file.{Files, Paths}
      val target = Paths.get(p.toUri.getPath)
      val tmp = Files.createTempFile(Paths.get(dir.toUri.getPath),
        s".c-$seq-", ".tmp")
      try {
        Files.write(tmp, version.getBytes("UTF-8"))
        try { Files.createLink(target, tmp); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally Files.deleteIfExists(tmp)
    } else try {
      val out = fs.create(p, false) // overwrite=false: EXCLUSIVE
      try out.write(version.getBytes("UTF-8")) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.io.FileNotFoundException => false
      case e: java.io.IOException
        if e.getMessage != null && e.getMessage.contains("exist") => false
    }
  }

  /** Write `df` as a fresh immutable version dir; returns its name. */
  private def writeVersion(df: DataFrame, rootPath: Path,
                           fs: FileSystem): String = {
    // strictly-increasing timestamps so version names always sort in
    // creation order even for sub-millisecond back-to-back publishes
    // (ORDER is defined by the log; the names are for debuggability)
    val prevTs =
      (if (fs.exists(rootPath)) fs.listStatus(rootPath).toSeq else Nil)
        .map(_.getPath.getName).filter(_.startsWith("v-"))
        .sorted.lastOption
        .flatMap(n => scala.util.Try(n.stripPrefix("v-").take(13).toLong).toOption)
        .getOrElse(0L)
    val ts = math.max(System.currentTimeMillis(), prevTs + 1)
    val version = f"v-$ts%013d-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists")
      .parquet(new Path(rootPath, version).toString)
    version
  }

  /** Post-commit bookkeeping: flip the `_CURRENT` cache, retain the
    * newest `keepVersions` committed snapshots, drop orphans and stale
    * commit files, collect superseded legacy part-files. */
  private def finalizeCommit(spark: SparkSession, fs: FileSystem,
                             rootPath: Path, version: String,
                             keepVersions: Int,
                             hadLogBefore: Boolean): Unit = {
    // _CURRENT cache flip — BEST-EFFORT by design: the commit log is
    // authoritative (currentVersion consults it first), so a lost flip
    // race can never misdirect a reader. Concurrent flips on a local
    // filesystem can collide inside rename-OVERWRITE's delete+rename
    // window (FileAlreadyExists) — retry a few times, then give up and
    // leave the cache stale; the next publish heals it.
    val fc = FileContext.getFileContext(rootPath.toUri,
      spark.sessionState.newHadoopConf())
    val tmp = new Path(rootPath, s".$CurrentFile.$version.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    var flips = 0
    var flipped = false
    while (!flipped && flips < 3) {
      flips += 1
      try {
        fc.rename(tmp, new Path(rootPath, CurrentFile), Options.Rename.OVERWRITE)
        flipped = true
      } catch {
        case _: java.io.IOException if flips < 3 => Thread.sleep(10L * flips)
        case _: java.io.IOException => fs.delete(tmp, false) // stay stale
      }
    }
    // GC: the log defines commit order; keep the newest keepVersions
    // committed snapshots (a crashed publish's orphan was never
    // committed, so it is dropped regardless of age)
    val entries = logEntries(fs, rootPath)
    val keepEntries = entries.takeRight(keepVersions)
    val keep = keepEntries.map(_._2).toSet
    val committed = entries.map(_._2).toSet
    val now = System.currentTimeMillis()
    // bucket-generation references: a gen subdir lives exactly as long
    // as some RETAINED manifest points at it. Parse evicted manifests
    // BEFORE deleting them so their now-unreferenced gens go promptly;
    // gens referenced by NO logged manifest may belong to an in-flight
    // publisher and wait out the grace window like any orphan.
    def refsOf(names: Iterable[String]): Set[String] = names.flatMap { m =>
      try readManifest(fs, rootPath, m).entries.values
      catch { case _: java.io.IOException => Nil }
    }.toSet
    val keptRefs = refsOf(keep.filter(isManifest))
    val evictedRefs = refsOf(
      entries.dropRight(keepVersions).map(_._2).filter(isManifest))
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("v-") && !keep.contains(name)) {
        // superseded committed snapshots go immediately (the log proves
        // no future commit can reference them); an UNCOMMITTED dir may
        // be a concurrent publisher mid-commit — only collect it once
        // it ages past the in-flight grace window
        if (committed.contains(name) ||
            now - st.getModificationTime > OrphanGraceMs)
          fs.delete(st.getPath, true)
      }
      if (st.isFile && name.startsWith(ManifestPrefix) &&
          !keep.contains(name)) {
        if (committed.contains(name) ||
            now - st.getModificationTime > OrphanGraceMs)
          fs.delete(st.getPath, false)
      }
      if (st.isDirectory && name.startsWith(GenPrefix)) {
        var liveSubdirs = 0
        fs.listStatus(st.getPath).foreach { sub =>
          val rel = s"$name/${sub.getPath.getName}"
          if (keptRefs.contains(rel)) liveSubdirs += 1
          else if (evictedRefs.contains(rel) ||
              now - sub.getModificationTime > OrphanGraceMs)
            fs.delete(sub.getPath, true)
          else liveSubdirs += 1 // young unreferenced: possibly in-flight
        }
        if (liveSubdirs == 0 &&
            now - st.getModificationTime > OrphanGraceMs)
          fs.delete(st.getPath, true)
      }
    }
    entries.dropRight(keepVersions).foreach { case (seq, _) =>
      fs.delete(new Path(new Path(rootPath, CommitDir), f"c-$seq%012d"), false)
    }
    // legacy migration tail: plain part-files written by a pre-versioning
    // writer served as the live snapshot until the FIRST commit (whose
    // merge read them via read()); like any superseded snapshot they are
    // retained one publish cycle for in-flight readers, then collected
    if (hadLogBefore)
      legacyFiles(fs, rootPath).foreach(p => fs.delete(p, false))
  }

  /** If the table predates the commit log (pointer file only), backfill
    * its pointer as seq 0 so the log is complete before CAS commits
    * race above it. Collision-safe: concurrent backfills write identical
    * content, and the exclusive create admits one. */
  private def backfillLegacyPointer(fs: FileSystem, rootPath: Path): Unit = {
    val ptr = new Path(rootPath, CurrentFile)
    if (logEntries(fs, rootPath).isEmpty && fs.exists(ptr))
      tryCommit(fs, rootPath, 0L, readSmall(fs, ptr))
  }

  /** Publish `df` as the new live snapshot of the table at `root`,
    * retaining the newest `keepVersions` committed snapshots (>= 2: the
    * new one plus at least the previous for in-flight readers). Larger
    * values give time-travel depth — [[readVersion]] can read any
    * retained snapshot. Concurrent publishers are safe: commit
    * collisions retry against the new head, so every publisher lands in
    * the log exactly once, in commit order. */
  def publish(df: DataFrame, root: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 2, "keepVersions must be >= 2")
    val spark = df.sparkSession
    val (fs, rootPath) = fsOf(spark, root)
    backfillLegacyPointer(fs, rootPath)
    val hadLog = head(fs, rootPath).isDefined
    val version = writeVersion(df, rootPath, fs)
    var attempt = 0
    var committed = false
    while (!committed) {
      attempt += 1
      require(attempt <= PublishRetries,
        s"publish: $PublishRetries commit collisions at $root — " +
          "pathological contention or a filesystem without exclusive create")
      val seq = head(fs, rootPath).map(_._1).getOrElse(0L) + 1L
      committed = tryCommit(fs, rootPath, seq, version)
    }
    finalizeCommit(spark, fs, rootPath, version, keepVersions, hadLog)
  }

  /** Compare-and-set publish: commit ONLY if the live version is still
    * `expected` (None = the table has never been published) at commit
    * time — the optimistic-concurrency form for read-modify-write
    * publishers (read snapshot + expected version, derive, publishIf).
    * On a lost race the fully-written version dir is left UNCOMMITTED
    * (invisible to every reader, collected by the next successful
    * publish) and [[ConcurrentPublishException]] carries the new head
    * so the caller can re-derive and retry. */
  def publishIf(df: DataFrame, root: String, expected: Option[String],
                keepVersions: Int = 2): Unit = {
    require(keepVersions >= 2, "keepVersions must be >= 2")
    val spark = df.sparkSession
    val (fs, rootPath) = fsOf(spark, root)
    backfillLegacyPointer(fs, rootPath)
    val h0 = head(fs, rootPath)
    if (h0.map(_._2) != expected)
      throw ConcurrentPublishException(expected, h0.map(_._2))
    val version = writeVersion(df, rootPath, fs)
    val seq = h0.map(_._1).getOrElse(0L) + 1L
    if (!tryCommit(fs, rootPath, seq, version)) {
      // someone took our seq: the expectation is stale by definition
      throw ConcurrentPublishException(expected,
        head(fs, rootPath).map(_._2))
    }
    finalizeCommit(spark, fs, rootPath, version, keepVersions,
      hadLogBefore = h0.isDefined)
  }

  /** Read-modify-write publish loop — the production shape over
    * [[publishIf]]: read the live snapshot (None if never published),
    * derive the next one with `derive`, CAS-commit; on a lost race
    * RE-DERIVE from the winner's snapshot and try again, so no
    * publisher's contribution is silently dropped (the lost-update
    * anomaly the unconditional [[publish]] permits by design). Bounded
    * by `maxRetries` — each retry means another writer committed, so
    * the loop starves only under pathological contention, and then it
    * fails loudly with the final conflict. */
  def publishMerge(spark: SparkSession, root: String,
                   derive: Option[DataFrame] => DataFrame,
                   keepVersions: Int = 2, maxRetries: Int = 10): Unit = {
    var attempt = 0
    var last: ConcurrentPublishException = null
    while (attempt < maxRetries) {
      attempt += 1
      val expected = currentVersion(spark, root)
      // pin the snapshot to the EXPECTED version (read() could see a
      // newer commit landing between the two calls — harmless, but the
      // derive would then be working ahead of its own expectation);
      // an expected=None table may still carry a legacy plain-parquet
      // snapshot, which read() serves
      val snapshot = expected match {
        case Some(v) => Some(readVersion(spark, root, v))
        case None => read(spark, root)
      }
      try {
        publishIf(derive(snapshot), root, expected, keepVersions)
        return
      } catch {
        case e: ConcurrentPublishException => last = e // re-derive, retry
      }
    }
    throw last
  }

  // ---- Bucketed incremental snapshots --------------------------------
  //
  // A committed version whose name starts with `m-` is a BUCKETED
  // snapshot: a small manifest FILE mapping each hash bucket of the key
  // to the immutable bucket-generation dir holding its rows. A batch
  // publish rewrites ONLY the buckets the batch touches and re-points
  // the rest at their existing generation dirs — O(touched buckets)
  // write amplification instead of O(table), the difference between a
  // micro-batch upsert into a billion-entity table and rewriting it
  // every trigger. Commits ride the SAME exclusive-create log (CAS at
  // head+1), so readers resolve one pointer and scan immutable dirs —
  // a torn snapshot is impossible, and full (`v-`) and bucketed (`m-`)
  // versions interleave freely in one table's history.

  private val ManifestPrefix = "m-"
  private val GenPrefix = "g-"
  private val BucketCol = "__graft_bucket"

  private def isManifest(v: String): Boolean = v.startsWith(ManifestPrefix)

  /** Bucket count + bucket -> generation-dir (root-relative). */
  private[store] final case class Manifest(nBuckets: Int,
                                           entries: Map[Int, String])

  private def readManifest(fs: FileSystem, rootPath: Path,
                           name: String): Manifest = {
    val lines = readSmall(fs, new Path(rootPath, name)).split('\n')
    val n = lines.head.stripPrefix("nbuckets=").toInt
    val entries = lines.tail.filter(_.nonEmpty).map { l =>
      val Array(b, rel) = l.split('\t')
      b.toInt -> rel
    }.toMap
    Manifest(n, entries)
  }

  private def writeManifest(fs: FileSystem, rootPath: Path,
                            m: Manifest): String = {
    val name = f"$ManifestPrefix${System.currentTimeMillis()}%013d-" +
      java.util.UUID.randomUUID().toString.take(8)
    val body = (s"nbuckets=${m.nBuckets}" +:
      m.entries.toSeq.sortBy(_._1).map { case (b, rel) => s"$b\t$rel" })
      .mkString("\n")
    val out = fs.create(new Path(rootPath, name), false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    name
  }

  private def bucketExpr(key: Seq[String], n: Int) =
    org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.xxhash64(
        key.map(org.apache.spark.sql.functions.col): _*),
      org.apache.spark.sql.functions.lit(n.toLong)).cast("int")

  /** Incremental bucketed publish of one upsert batch.
    *
    * Reads the live snapshot's manifest, merges `batch` with ONLY the
    * buckets it touches (`merge(prevTouchedRows, batchRows)` — the
    * caller owns the upsert semantics, e.g. latest-per-key of the
    * union), writes those buckets as one `partitionBy` generation dir,
    * and CAS-commits a manifest that re-points touched buckets and
    * keeps every other bucket's existing dir. A lost race re-derives
    * from the winner's manifest (publishMerge's loop, per-bucket); a
    * crash leaves only an unreferenced gen dir + manifest file,
    * collected by the next publish after the grace window.
    *
    * First publish (or a legacy/full `v-` head) bucketizes everything
    * once; afterwards `nBuckets` is pinned by the live manifest and the
    * parameter is ignored. The merged result for a touched bucket may
    * be empty (a delete-style merge) — that bucket simply leaves the
    * manifest; a table cannot become entirely empty this way. */
  def publishBucketedBatch(batch: DataFrame, root: String,
                           key: Seq[String],
                           merge: (DataFrame, DataFrame) => DataFrame,
                           nBuckets: Int = 64, keepVersions: Int = 2,
                           maxRetries: Int = 10): Unit = {
    require(keepVersions >= 2, "keepVersions must be >= 2")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val spark = batch.sparkSession
    val (fs, rootPath) = fsOf(spark, root)
    backfillLegacyPointer(fs, rootPath)
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      attempt += 1
      val h0 = head(fs, rootPath)
      val seq = h0.map(_._1).getOrElse(0L) + 1L
      // the derive+write stage reads the previous gen dirs LAZILY: a
      // concurrent publisher's GC may evict the manifest we resolved
      // and collect its gens mid-scan — that surfaces as a missing-file
      // failure, not a commit collision, and deserves the same
      // re-derive-from-the-new-head retry
      try {
        val prevMan = h0.map(_._2).filter(isManifest)
          .map(readManifest(fs, rootPath, _))
        val n = prevMan.map(_.nBuckets).getOrElse(nBuckets)
        val (merged, replacedBuckets, kept) = prevMan match {
          case Some(man) =>
            val touched = batch.select(bucketExpr(key, n).as(BucketCol))
              .distinct().collect().map(_.getInt(0)).toSeq.sorted
            if (touched.isEmpty) return // empty batch: nothing to change
            val prevPaths = touched.flatMap(man.entries.get)
              .map(rel => new Path(rootPath, rel).toString)
            val prevRows =
              if (prevPaths.isEmpty) batch.limit(0)
              else spark.read.parquet(prevPaths: _*)
            (merge(prevRows, batch), touched.toSet,
              man.entries -- touched)
          case None =>
            // first publish, or migration of a full/legacy snapshot:
            // every bucket is touched exactly once
            val prevAll = h0.map(_._2) match {
              case Some(v) => readVersion(spark, root, v)
              case None => read(spark, root).getOrElse(batch.limit(0))
            }
            (merge(prevAll, batch), (0 until n).toSet,
              Map.empty[Int, String])
        }
        val genRel = f"$GenPrefix${System.currentTimeMillis()}%013d-" +
          java.util.UUID.randomUUID().toString.take(8)
        merged.withColumn(BucketCol, bucketExpr(key, n))
          .write.partitionBy(BucketCol)
          .parquet(new Path(rootPath, genRel).toString)
        val written = fs.listStatus(new Path(rootPath, genRel)).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(s"$BucketCol="))
          .map { st =>
            st.getPath.getName.stripPrefix(s"$BucketCol=").toInt ->
              s"$genRel/${st.getPath.getName}"
          }.toMap
        require(written.keySet.subsetOf(replacedBuckets),
          "merge produced rows outside the touched buckets — the merge " +
            "callback must not invent keys the batch does not carry")
        val entries = kept ++ written
        if (entries.isEmpty) {
          // nothing merged out: on a FIRST publish this is just an
          // empty micro-batch against a never-published table (a
          // stream's first trigger is often empty) — a no-op, not an
          // error; on a LIVE table it would tear the whole table down
          fs.delete(new Path(rootPath, genRel), true)
          if (h0.isEmpty) return
          throw new IllegalArgumentException(
            "bucketed publish would leave an empty table — use publish()")
        }
        val mName = writeManifest(fs, rootPath, Manifest(n, entries))
        if (tryCommit(fs, rootPath, seq, mName)) {
          finalizeCommit(spark, fs, rootPath, mName, keepVersions,
            hadLogBefore = h0.isDefined)
          return
        }
        // lost the race: leave the orphan gen/manifest to GC, re-derive
        last = ConcurrentPublishException(h0.map(_._2),
          head(fs, rootPath).map(_._2))
      } catch {
        case e if isMissingFiles(e) => last = e // head moved: re-derive
      }
    }
    throw last
  }

  /** A scan/derive failure rooted in files vanishing mid-read — the
    * signature of racing an evicted manifest's gen-dir GC (the reader
    * resolved a head, the head moved, GC collected what it referenced).
    * Spark wraps the task-side FileNotFoundException in layered
    * SparkExceptions; the path-missing form is an AnalysisException
    * whose message carries the path. Bounded walk — cause chains can
    * be long. */
  private def isMissingFiles(e: Throwable): Boolean = {
    var c: Throwable = e
    var depth = 0
    while (c != null && depth < 20) {
      if (c.isInstanceOf[java.io.FileNotFoundException]) return true
      val m = c.getMessage
      if (m != null && (m.contains("FileNotFound") ||
          m.contains("does not exist") || m.contains("PATH_NOT_FOUND")))
        return true
      c = c.getCause; depth += 1
    }
    false
  }

  /** CAS-committed re-bucketing migration: rewrite the live snapshot as
    * a fresh bucketed generation at `newBuckets` hash buckets, committed
    * through the same exclusive-create log. The manifest pins its bucket
    * count at first publish; an entity table that grows 100× needs more
    * buckets, and this is the ONLINE path — readers are never torn (one
    * commit pointer resolving to immutable dirs), and a concurrent
    * [[publishBucketedBatch]] upsert is never lost: the rebucket commits
    * only at head+1 over the head it derived from, so a racing upsert
    * that wins the seq forces the rebucket to re-derive from the
    * winner's snapshot (and vice versa — the upsert loop re-derives over
    * the new bucket count it finds at ITS retry). No-op if the table was
    * never published or is empty. */
  /** CAS-committed compaction of a bucketed table: every micro-batch
    * publish adds one generation dir for its touched buckets, so a
    * long-running upsert stream leaves each bucket's rows scattered
    * across many small files under many gens; compaction rewrites the
    * live snapshot into ONE fresh generation (same bucket count) and
    * commits it through the log. Readers and concurrent upserts follow
    * the [[rebucket]] safety argument verbatim — this IS a rebucket at
    * the current count (or `nBuckets` for a full/legacy head that was
    * never bucketed). Run it on the maintenance cadence small-file
    * pressure dictates, not per batch. */
  def compact(spark: SparkSession, root: String, key: Seq[String],
              nBuckets: Int = 64, keepVersions: Int = 2,
              maxRetries: Int = 10): Unit = {
    val (fs, rootPath) = fsOf(spark, root)
    val n = head(fs, rootPath).map(_._2).filter(isManifest)
      .map(readManifest(fs, rootPath, _).nBuckets)
      .getOrElse(nBuckets)
    rebucket(spark, root, key, n, keepVersions, maxRetries)
  }

  def rebucket(spark: SparkSession, root: String, key: Seq[String],
               newBuckets: Int, keepVersions: Int = 2,
               maxRetries: Int = 10): Unit = {
    require(newBuckets >= 1, "newBuckets must be >= 1")
    require(keepVersions >= 2, "keepVersions must be >= 2")
    val (fs, rootPath) = fsOf(spark, root)
    backfillLegacyPointer(fs, rootPath)
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxRetries) {
      attempt += 1
      val h0 = head(fs, rootPath)
      if (h0.isEmpty) return // never published: nothing to migrate
      val seq = h0.get._1 + 1L
      try {
        val snapshot = readVersion(spark, root, h0.get._2)
        val genRel = f"$GenPrefix${System.currentTimeMillis()}%013d-" +
          java.util.UUID.randomUUID().toString.take(8)
        snapshot.withColumn(BucketCol, bucketExpr(key, newBuckets))
          .write.partitionBy(BucketCol)
          .parquet(new Path(rootPath, genRel).toString)
        val written = fs.listStatus(new Path(rootPath, genRel)).toSeq
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(s"$BucketCol="))
          .map { st =>
            st.getPath.getName.stripPrefix(s"$BucketCol=").toInt ->
              s"$genRel/${st.getPath.getName}"
          }.toMap
        if (written.isEmpty) { // empty snapshot: nothing to rebucket
          fs.delete(new Path(rootPath, genRel), true)
          return
        }
        val mName = writeManifest(fs, rootPath,
          Manifest(newBuckets, written))
        if (tryCommit(fs, rootPath, seq, mName)) {
          finalizeCommit(spark, fs, rootPath, mName, keepVersions,
            hadLogBefore = true)
          return
        }
        last = ConcurrentPublishException(Some(h0.get._2),
          head(fs, rootPath).map(_._2))
      } catch {
        case e if isMissingFiles(e) => last = e // head moved: re-derive
      }
    }
    throw last
  }

  /** Bucket-pruned point lookup against the live snapshot: for a
    * serving-sized key set (small by construction — it broadcasts), a
    * bucketed table needs to scan ONLY the gen dirs of the buckets the
    * keys hash into — O(|keys|) files instead of the whole entity
    * table, the read-side half of the bucketed-publish bargain. Falls
    * back to a full-snapshot scan for non-bucketed versions, and to
    * the legacy plain-parquet snapshot [[read]] serves for tables that
    * predate versioning (an upgrade never silently drops previously
    * materialized entities). Returns None only if nothing was ever
    * written. */
  def lookup(spark: SparkSession, root: String, key: Seq[String],
             keys: DataFrame): Option[DataFrame] =
    currentVersion(spark, root) match {
      case None =>
        // legacy pre-versioning table: no log, no pointer — read()
        // still serves its plain part-files as the live snapshot
        read(spark, root).map(_.join(
          org.apache.spark.sql.functions.broadcast(keys), key))
      case Some(v) =>
        val snapshot =
          if (!isManifest(v)) readVersion(spark, root, v)
          else {
            val (fs, rootPath) = fsOf(spark, root)
            val man = readManifest(fs, rootPath, v)
            val touched = keys
              .select(bucketExpr(key, man.nBuckets).as(BucketCol))
              .distinct().collect().map(_.getInt(0)).toSet
            val paths = man.entries.toSeq.sortBy(_._1)
              .collect { case (b, rel) if touched(b) =>
                new Path(rootPath, rel).toString }
            if (paths.isEmpty)
              readVersion(spark, root, v).limit(0) // no key hits any bucket
            else spark.read.parquet(paths: _*)
          }
        Some(snapshot.join(
          org.apache.spark.sql.functions.broadcast(keys), key))
    }

  /** Data files of a pre-versioning (plain parquet dir) online table. */
  private def legacyFiles(fs: FileSystem, rootPath: Path): Seq[Path] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)

  /** Retained snapshot versions in COMMIT order, oldest first (current
    * is last) — read straight off the log, so orphans from crashed or
    * lost-race publishes never appear. */
  def listVersions(spark: SparkSession, root: String): Seq[String] = {
    val (fs, rootPath) = fsOf(spark, root)
    val logged = logEntries(fs, rootPath).map(_._2)
    val all =
      if (logged.nonEmpty) logged
      else head(fs, rootPath).map(_._2).toSeq // legacy pointer table
    all.filter(v => fs.exists(new Path(rootPath, v)))
  }

  /** Time-travel read of a retained snapshot (see [[listVersions]]) —
    * a full `v-` dir directly, a bucketed `m-` manifest via its
    * referenced bucket-generation dirs. */
  def readVersion(spark: SparkSession, root: String, version: String): DataFrame =
    if (isManifest(version)) {
      val (fs, rootPath) = fsOf(spark, root)
      val man = readManifest(fs, rootPath, version)
      val paths = man.entries.toSeq.sortBy(_._1)
        .map { case (_, rel) => new Path(rootPath, rel).toString }
      spark.read.parquet(paths: _*)
    } else spark.read.parquet(new Path(new Path(root), version).toString)

  /** The live version name, if the table has ever been published. The
    * COMMIT LOG is authoritative; the `_CURRENT` pointer only serves
    * tables that predate the log (and debugging eyes). */
  def currentVersion(spark: SparkSession, root: String): Option[String] = {
    val (fs, rootPath) = fsOf(spark, root)
    head(fs, rootPath).map(_._2)
  }

  /** Read the live snapshot. A plain-parquet dir written by a
    * pre-versioning writer (no pointer, no log) is served as the live
    * snapshot so an upgrade never silently drops previously materialized
    * entities; the first publish merges and supersedes it. Empty option
    * only if nothing was ever written. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root) match {
      case Some(v) =>
        Some(readVersion(spark, root, v))
      case None =>
        val (fs, rootPath) = fsOf(spark, root)
        val legacy = legacyFiles(fs, rootPath)
        if (legacy.isEmpty) None
        // explicit file list: the root may also hold v- dirs from a
        // crashed first publish, which must not be swept into the scan
        else Some(spark.read.parquet(legacy.map(_.toString): _*))
    }

  def exists(spark: SparkSession, root: String): Boolean =
    read(spark, root).isDefined
}
