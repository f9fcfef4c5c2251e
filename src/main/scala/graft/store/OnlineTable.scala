package graft.store

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned online-table layout with an atomic current-version pointer —
  * the object-store-safe replacement for directory-rename swaps (which are
  * neither atomic nor portable off a local filesystem: `java.io.File`
  * cannot address HDFS/S3, and S3 has no atomic directory rename at all).
  *
  * Layout under `root`:
  * {{{
  *   root/_CURRENT          <- text file naming the live version dir
  *   root/v-<version>/      <- immutable, fully-written parquet snapshots
  * }}}
  *
  * A publish writes a NEW version directory to completion, then flips
  * `_CURRENT` via `FileContext.rename(..., Options.Rename.OVERWRITE)` — a
  * single-FILE rename, atomic on posix and HDFS; on S3 the equivalent
  * single-object PUT is atomic per object. Readers resolve `_CURRENT` then
  * scan an immutable directory, so they can never observe a half-written
  * table; a reader holding the previous version keeps working because the
  * previous snapshot is retained for one publish cycle (older ones are
  * garbage-collected). A writer crash before the flip leaves only an
  * unreferenced version dir, collected by the next successful publish.
  *
  * This is the manifest-pointer core of the transactional table formats
  * (Delta/Iceberg keep a log of such pointers); single-writer,
  * multi-reader — the online-store materialization topology.
  */
object OnlineTable {

  private val CurrentFile = "_CURRENT"

  /** Publish `df` as the new live snapshot of the table at `root`,
    * retaining the newest `keepVersions` referenced snapshots (>= 2: the
    * new one plus at least the previous for in-flight readers). Larger
    * values give time-travel depth — [[readVersion]] can read any retained
    * snapshot, the same pointer-log idea Delta/Iceberg build their history
    * on. */
  def publish(df: DataFrame, root: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 2, "keepVersions must be >= 2")
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fc = FileContext.getFileContext(rootPath.toUri, hconf)
    val fs = rootPath.getFileSystem(hconf)
    val referenced = listVersions(spark, root).toSet ++ currentVersion(spark, root)
    // strictly-increasing timestamps so version names always sort in
    // publish order even for sub-millisecond back-to-back publishes
    val prevTs = referenced.toSeq.sorted.lastOption
      .map(_.stripPrefix("v-").take(13).toLong).getOrElse(0L)
    val ts = math.max(System.currentTimeMillis(), prevTs + 1)
    val version = f"v-$ts%013d-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("errorifexists")
      .parquet(new Path(rootPath, version).toString)
    // flip the pointer: write-temp + atomic overwrite-rename of one file
    val tmp = new Path(rootPath, s".$CurrentFile.$version.tmp")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, new Path(rootPath, CurrentFile), Options.Rename.OVERWRITE)
    // GC: version names sort by publish time; keep the newest keepVersions
    // REFERENCED snapshots (a crashed publish's orphan was never
    // referenced, so it is dropped regardless of age)
    val keep = (referenced + version).toSeq.sorted.takeRight(keepVersions).toSet
    fs.listStatus(rootPath).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith("v-") && !keep.contains(name))
        fs.delete(st.getPath, true)
    }
    // legacy migration tail: plain part-files written by a pre-versioning
    // writer served as the live snapshot until the FIRST versioned publish
    // (whose merge read them via read()); like any superseded snapshot
    // they are retained one publish cycle for in-flight readers, then
    // collected here on the next publish
    if (referenced.nonEmpty)
      legacyFiles(fs, rootPath).foreach(p => fs.delete(p, false))
  }

  /** Data files of a pre-versioning (plain parquet dir) online table. */
  private def legacyFiles(fs: org.apache.hadoop.fs.FileSystem,
                          rootPath: Path): Seq[Path] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)

  /** Retained snapshot versions, oldest first (current is last). A version
    * dir counts only if the pointer references or once referenced it —
    * orphans from crashed publishes are excluded by GC at publish time, so
    * listing the retained dirs is authoritative between publishes. */
  def listVersions(spark: SparkSession, root: String): Seq[String] = {
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)
    currentVersion(spark, root) match {
      case None => Nil
      case Some(cur) =>
        fs.listStatus(rootPath).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("v-"))
          .map(_.getPath.getName)
          .filter(_ <= cur) // never expose a not-yet-referenced in-flight dir
          .sorted
    }
  }

  /** Time-travel read of a retained snapshot (see [[listVersions]]). */
  def readVersion(spark: SparkSession, root: String, version: String): DataFrame =
    spark.read.parquet(new Path(new Path(root), version).toString)

  /** The live version dir name, if the table has ever been published. */
  def currentVersion(spark: SparkSession, root: String): Option[String] = {
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)
    val ptr = new Path(rootPath, CurrentFile)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.commons.io.IOUtils.copy(in, buf)
        Some(buf.toString("UTF-8").trim)
      } finally in.close()
    }
  }

  /** Read the live snapshot. A plain-parquet dir written by a
    * pre-versioning writer (no `_CURRENT` pointer) is served as the live
    * snapshot so an upgrade never silently drops previously materialized
    * entities; the first publish merges and supersedes it. Empty option
    * only if nothing was ever written. */
  def read(spark: SparkSession, root: String): Option[DataFrame] =
    currentVersion(spark, root) match {
      case Some(v) =>
        Some(spark.read.parquet(new Path(new Path(root), v).toString))
      case None =>
        val rootPath = new Path(root)
        val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
        val legacy = legacyFiles(fs, rootPath)
        if (legacy.isEmpty) None
        // explicit file list: the root may also hold v- dirs from a
        // crashed first publish, which must not be swept into the scan
        else Some(spark.read.parquet(legacy.map(_.toString): _*))
    }

  def exists(spark: SparkSession, root: String): Boolean =
    read(spark, root).isDefined
}
