package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent IVF centroid index — fit ONCE, probe many times.
  *
  * An inverted-file ANN index is infrastructure, not a per-query artifact:
  * at corpus scale the KMeans fit is minutes while a probe is a single
  * cell-join, so the fit must amortize across every query batch that
  * follows (the reference's Categorify model store plays the same role for
  * vocabularies — mirrored here as parquet save/load,
  * [[graft.ops.Categorify.Model.save]]).
  *
  * The fitted state is tiny (nlist × dim floats): it rides the driver and
  * enters query plans as literals, never as a joined table, so probing
  * adds zero shuffles to the corpus side ([[Similarity.ivfTopK]]).
  */
object IvfIndex {

  /** (cell id, centroid as floats, ||centroid||²) — precomputed squared
    * norms let cell scoring use argmax(v·c − ||c||²/2), one vec_dot per
    * cell. */
  case class Model(centroids: Seq[(Int, Seq[Float], Double)]) {

    /** Persist as a tiny single-file parquet (cell: int,
      * centroid: array<float>); norms are recomputed on load. */
    def save(spark: SparkSession, path: String): Unit = {
      import spark.implicits._
      centroids.map { case (i, cv, _) => (i, cv) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(path)
    }
  }

  /** KMeans-fit the cell structure on a `fitFraction` sample — cell
    * quality needs the coarse cluster shape, not every point, and nprobe
    * probing absorbs slightly-off boundaries. Deterministic under the
    * fixed seed. `corpus` must expose the embedding as `nvec`. */
  def fit(corpus: DataFrame, nlist: Int = 16, seed: Long = 42L,
          fitFraction: Double = 0.25, maxIter: Int = 5): Model = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val fitSrc =
      if (fitFraction >= 1.0) corpus else corpus.sample(fitFraction, seed)
    val train = fitSrc.select(array_to_vector(
      col("nvec").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .fit(train)
    // n2 from the FLOAT-rounded centroid (what scoring literals carry and
    // what save persists) — fit-then-probe and save/load-then-probe give
    // bit-identical plans
    Model(model.clusterCenters.zipWithIndex.map { case (c, i) =>
      val cv = c.toArray.map(_.toFloat).toSeq
      (i, cv, cv.map(x => x.toDouble * x.toDouble).sum)
    }.toSeq)
  }

  /** Write the INVERTED FILE: the corpus tagged with its cell id, stored
    * as parquet partitioned BY cell. This is the half of IVF the centroid
    * table alone cannot give you: with cells materialized as partitions, a
    * probe READS only its probed cells' directories (partition pruning at
    * the scan) instead of re-scoring every corpus row against every
    * centroid per query batch — at 100 TB the corpus-side probe IO drops
    * to ~nprobe/nlist of the data. `repartition(cell)` gives one writer
    * task per cell (no small-file explosion); the build is the offline
    * half of fit-once/probe-many, exactly like the centroid fit.
    * `corpus` must expose `nid` and the embedding as `nvec`. */
  def buildInverted(corpus: DataFrame, index: Model, path: String): Unit =
    corpus
      .withColumn("cell", Similarity.ivfCell(
        org.apache.spark.sql.functions.col("nvec"), index))
      .repartition(org.apache.spark.sql.functions.col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Publish a fully-written index directory `tmp` to its final path
    * `fin` by atomic rename, safe under concurrent publishers: losing the
    * rename race is success (the winner's tree is complete — drop our
    * duplicate and load theirs). On filesystems without atomic directory
    * moves (AtomicMoveNotSupported on exotic tmpdirs) the fallback
    * serializes through an exclusive lock file in `fin`'s parent and
    * RE-CHECKS under the lock — two fallback publishers can therefore
    * never interleave a non-atomic move (one publishes, the other sees
    * `fin` and drops its tmp). IvfPublishSpec races publishers both ways. */
  def publish(tmp: java.nio.file.Path, fin: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, FileSystemException, StandardCopyOption}
    try Files.move(tmp, fin, StandardCopyOption.ATOMIC_MOVE)
    catch { case e: FileSystemException =>
      if (Files.exists(fin)) rmTree(tmp) // lost the atomic publish race
      else publishLocked(tmp, fin, e)
    }
  }

  /** Non-atomic fallback, factored out so IvfPublishSpec can race it
    * directly (the atomic path is untestably fast to lose on tmpfs).
    * Two locks, both required: the JVM monitor serializes publisher
    * THREADS (java.nio file locks are per-process — a second thread
    * locking the same file throws OverlappingFileLockException rather
    * than blocking), and the file lock serializes publisher PROCESSES. */
  private val publishMonitor = new Object
  private[llm] def publishLocked(tmp: java.nio.file.Path,
                                 fin: java.nio.file.Path,
                                 cause: Throwable): Unit = publishMonitor.synchronized {
    import java.nio.file.{Files, FileSystemException, StandardOpenOption}
    val lockPath = fin.getParent.resolve(fin.getFileName.toString + ".lock")
    val ch = java.nio.channels.FileChannel.open(lockPath,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      val lk = ch.lock()
      try {
        if (Files.exists(fin)) rmTree(tmp) // published while we waited
        else {
          try Files.move(tmp, fin)
          catch { case _: FileSystemException =>
            // neither atomic nor plain move worked and nobody else
            // published: surface the ORIGINAL failure, not a confusing
            // missing-path error from a later load
            if (Files.exists(fin)) rmTree(tmp) else throw cause
          }
        }
      } finally lk.release()
    } finally ch.close()
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    try {
      val st = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      } finally st.close()
    } catch { case _: java.nio.file.NoSuchFileException => () }
  }

  def load(spark: SparkSession, path: String): Model = {
    val rows = spark.read.parquet(path)
      .select("cell", "centroid")
      .collect() // nlist rows — the index is driver-sized by design
      .map { r =>
        val cv = r.getSeq[Float](1)
        // same float-derived n2 as fit — loaded and fresh models are
        // bit-identical
        (r.getInt(0), cv, cv.map(x => x.toDouble * x.toDouble).sum)
      }.sortBy(_._1).toSeq
    Model(rows)
  }
}
