package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental corpus deduplication against a PERSISTED identity index —
  * the production shape of dedup at 100 TB. Corpus-wide near-dup joins
  * ([[Dedup.minhashLsh]]) re-shingle and re-shuffle the FULL corpus every
  * run; once a corpus is deduped, each ingest batch only needs to be
  * checked against what is already admitted. This module persists the
  * admitted corpus's identity (exact content fingerprints + MinHash
  * signatures + their LSH band keys) and admits/rejects each new batch
  * with equi-join probes whose corpus-side cost is an index lookup, never
  * a corpus recompute — then APPENDS the admitted docs' identity, so the
  * index grows with the corpus and the next batch sees it.
  *
  * Reference behavior: the ingest-side dedup gates of
  * /root/reference/data_processing (corpus hygiene before feature
  * extraction), re-expressed as an incremental index rather than a
  * batch-global recompute.
  *
  * Index layout under `path` (all parquet, append-grown):
  *   - `exact/` (doc, fp)     — bag-of-words content fingerprints
  *   - `sigs/`  (doc, sig)    — full MinHash signatures
  *   - `bands/` (doc, band, bandkey) — LSH band slices of sig
  *
  * ADMISSION SEMANTICS (deterministic; priority order = reported reason):
  *   1. `exact_index` — fp equals an indexed doc's fp
  *   2. `exact_batch` — fp equals a smaller-id batch doc's fp
  *   3. `near_index`  — some LSH band agrees with an indexed doc AND
  *      signature-estimated Jaccard >= threshold
  *   4. `near_batch`  — same, against a smaller-id batch doc
  *   5. `admitted`
  * The within-batch near rule is PESSIMISTIC and one-hop: a doc is
  * rejected when ANY smaller-id batch doc is near it, whether or not that
  * doc was itself admitted (chain a~b, b~c, a!~c rejects both b and c).
  * This is the same earlier-arrival-wins contract a streaming gate gives
  * ([[graft.streaming.Streams.dedupByFingerprint]]), it needs no
  * iteration, and it errs toward dropping near-dups — the right bias for
  * training data. Near verification uses SIGNATURE-estimated Jaccard
  * (fraction of agreeing MinHash components), not exact shingle Jaccard:
  * that is what keeps the index fixed-width per doc (numHashes longs
  * instead of the shingle set), and the estimator is unbiased with σ =
  * √(J(1−J)/numHashes).
  *
  * 100 TB posture: the batch is the small side everywhere. Exact probes
  * are equi-joins on fp; near probes ride (band, bandkey) — Σ bucket²
  * candidate mass like every LSH join here, with only (doc, band,
  * bandkey) shuffling. Nothing scans the index's text (it stores none)
  * and nothing recomputes index signatures. Like [[Dedup.minhashLsh]],
  * `hashMode="md5"` makes every stage externally recomputable (the q75
  * oracle recomputes fingerprints, signatures, banding AND the admission
  * rules in SQL); production keeps murmur3.
  */
object DedupIndex {

  /** Identity/LSH parameters — must match between [[build]] and every
    * later [[admissions]]/[[append]] against the same index (a mismatch
    * makes band keys incomparable; callers persist cfg alongside the
    * index in real deployments). */
  case class Config(shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
                    threshold: Double = 0.6, seed: Long = 42L,
                    hashMode: String = "murmur3") {
    def numHashes: Int = bands * rowsPerBand
  }

  /** Signature-estimated Jaccard: fraction of agreeing MinHash
    * components. numHashes is a power of two by default, so the division
    * is exact in IEEE — bit-identical across engines. */
  def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / numHashes

  /** Per-doc identity row: (doc, fp, sig). */
  private def features(df: DataFrame, id: String, text: String,
                       cfg: Config): DataFrame =
    df.select(col(id).as("doc"),
        TextStats.fingerprint(col(text)).as("fp"),
        Dedup.shingles(col(text), cfg.shingleK).as("sh"))
      .withColumn("sig",
        Dedup.minhashSignature(col("sh"), cfg.numHashes, cfg.seed,
          cfg.hashMode))
      .drop("sh")

  /** Band slices of the signature — raw slices, not hashes of them, so
    * candidacy is exactly "some band agrees" (the q17 convention: an
    * external oracle can recompute the same candidate set). */
  private def banded(feat: DataFrame, cfg: Config): DataFrame =
    feat.select(col("doc"),
      posexplode(transform(sequence(lit(0), lit(cfg.bands - 1)),
        b => slice(col("sig"), b * cfg.rowsPerBand + 1,
          lit(cfg.rowsPerBand))))
        .as(Seq("band", "bandkey")))

  private def writeIndex(feat: DataFrame, cfg: Config, path: String,
                         mode: String): Unit = {
    import org.apache.spark.storage.StorageLevel
    // three consumers, one terminal action each — cache here is leak-free
    // because this method owns the full lifecycle (unlike Pack, which
    // returns a lazy frame)
    val f = feat.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      f.select("doc", "fp").write.mode(mode).parquet(s"$path/exact")
      f.select("doc", "sig").write.mode(mode).parquet(s"$path/sigs")
      banded(f, cfg).write.mode(mode).parquet(s"$path/bands")
    } finally f.unpersist()
  }

  /** Build (or rebuild) the index from an already-deduped corpus. */
  def build(docs: DataFrame, id: String, text: String, path: String,
            cfg: Config = Config()): Unit =
    writeIndex(features(docs, id, text, cfg), cfg, path, "overwrite")

  /** Append docs' identity to an existing index — call with the ADMITTED
    * slice of a batch after [[admissions]]. Parquet-append per table; not
    * transactional across the three tables (a crashed append can leave
    * them inconsistent — acceptable for a dedup gate, where the failure
    * mode is admitting a dup the next rebuild catches; an ACID table
    * format would close even that at the same layout). */
  def append(docs: DataFrame, id: String, text: String, path: String,
             cfg: Config = Config()): Unit =
    writeIndex(features(docs, id, text, cfg), cfg, path, "append")

  /** Admission verdict per batch doc: (id, reason) with `reason` one of
    * admitted/exact_index/exact_batch/near_index/near_batch (priority
    * order above). Pure decision — call [[append]] with the admitted
    * slice to commit. The batch is read several times through its
    * feature lineage; cache the input upstream if its lineage is
    * expensive (the lifecycle belongs to the owner — see Pack). */
  def admissions(batch: DataFrame, id: String, text: String,
                 indexPath: String, cfg: Config = Config()): DataFrame = {
    val spark = batch.sparkSession
    val bf = features(batch, id, text, cfg)
    val bb = banded(bf, cfg)
    val idxExact = spark.read.parquet(s"$indexPath/exact")
    val idxSigs = spark.read.parquet(s"$indexPath/sigs")
    val idxBands = spark.read.parquet(s"$indexPath/bands")

    // 1. exact vs index: one equi-join on fp
    val exIdx = bf.join(idxExact.select("fp"), Seq("fp"), "left_semi")
      .select(col("doc")).withColumn("__ex_i", lit(1))
    // 2. exact within batch: smaller id with the same fp exists
    val exBat = bf.select(col("doc"), col("fp"))
      .join(bf.groupBy("fp").agg(min("doc").as("__m")), Seq("fp"))
      .filter(col("doc") > col("__m"))
      .select(col("doc")).withColumn("__ex_b", lit(1))
    // 3. near vs index: band equi-join -> distinct candidate pairs ->
    //    signature re-attach -> estimated-Jaccard gate. Only (doc, band,
    //    bandkey) rides the band shuffle.
    val nearIdx = bb
      .join(idxBands.select(col("band"), col("bandkey"),
        col("doc").as("__idoc")), Seq("band", "bandkey"))
      .select("doc", "__idoc").dropDuplicates("doc", "__idoc")
      .join(bf.select(col("doc"), col("sig")), Seq("doc"))
      .join(idxSigs.select(col("doc").as("__idoc"),
        col("sig").as("__isig")), Seq("__idoc"))
      .filter(estJaccard(col("sig"), col("__isig"), cfg.numHashes)
        >= cfg.threshold)
      .select(col("doc")).dropDuplicates("doc").withColumn("__nr_i", lit(1))
    // 4. near within batch: same shape, earlier-sibling (smaller id) side
    val nearBat = bb
      .join(bb.select(col("band"), col("bandkey"), col("doc").as("__adoc")),
        Seq("band", "bandkey"))
      .filter(col("__adoc") < col("doc"))
      .select("doc", "__adoc").dropDuplicates("doc", "__adoc")
      .join(bf.select(col("doc"), col("sig")), Seq("doc"))
      .join(bf.select(col("doc").as("__adoc"), col("sig").as("__asig")),
        Seq("__adoc"))
      .filter(estJaccard(col("sig"), col("__asig"), cfg.numHashes)
        >= cfg.threshold)
      .select(col("doc")).dropDuplicates("doc").withColumn("__nr_b", lit(1))

    bf.select(col("doc"))
      .join(exIdx, Seq("doc"), "left")
      .join(exBat, Seq("doc"), "left")
      .join(nearIdx, Seq("doc"), "left")
      .join(nearBat, Seq("doc"), "left")
      .select(col("doc").as(id),
        when(col("__ex_i") === 1, "exact_index")
          .when(col("__ex_b") === 1, "exact_batch")
          .when(col("__nr_i") === 1, "near_index")
          .when(col("__nr_b") === 1, "near_batch")
          .otherwise("admitted").as("reason"))
  }

  /** Per-table compaction outcome: rows pruned and files merged. */
  final case class CompactStats(table: String, rowsBefore: Long,
                                rowsAfter: Long, filesBefore: Int,
                                filesAfter: Int)

  /** The doc ids a corpus diff retires from the index: docs `removed`
    * from the corpus, plus `changed` docs — a changed doc's OLD identity
    * must leave the index (its new version re-enters through the normal
    * [[admissions]] → [[append]] path, like any batch doc). Input is
    * [[Dedup.snapshotDiff]]'s (id, status) output. */
  def retiredDocs(diff: DataFrame, id: String): DataFrame =
    diff.filter(col("status").isin("removed", "changed"))
      .select(col(id).as("doc"))

  /** Compact the index: drop retired docs' identity from all three
    * tables and merge the small files [[append]] accumulates (every
    * appended batch adds its own part files; after N batches each probe
    * join opens O(N·parts) files — the classic small-file decay of any
    * append-grown table). Each table is rewritten through one shuffle on
    * `doc` whose partition count AQE right-sizes to the advisory
    * partition size, so file sizes stay healthy at ANY index scale
    * without a driver-side row count.
    *
    * ADMISSION CONTRACT (spec-pinned): for any batch, [[admissions]]
    * verdicts after compaction equal the verdicts before, except that
    * duplicates of retired docs become admissible — exactly the point of
    * retiring them.
    *
    * Crash posture matches [[append]]: the per-table write-temp +
    * delete + rename swap is not transactional across the three tables
    * (a crash can leave mixed generations; the failure mode is a dup
    * admitted or a retired doc still rejected until the next compaction
    * or rebuild — acceptable for a dedup gate). An ACID table format, or
    * [[graft.store.OnlineTable]]'s versioned-pointer flip, closes even
    * that window at the same layout. */
  def compact(spark: SparkSession, path: String, retired: DataFrame):
      Seq[CompactStats] = {
    val r = retired.select(col(retired.columns.head).as("doc"))
    val hconf = spark.sparkContext.hadoopConfiguration
    def parquetFiles(p: Path): Int = {
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) 0
      else fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    Seq("exact", "sigs", "bands").map { t =>
      val tPath = new Path(s"$path/$t")
      val fs = tPath.getFileSystem(hconf)
      val filesBefore = parquetFiles(tPath)
      val rowsBefore = spark.read.parquet(tPath.toString).count()
      // tmp name must not start with '.' or '_': Spark's file index
      // treats those as hidden and ignores them when reading the rewrite
      // back for the stats count
      val tmp = new Path(s"$path/$t-compact-tmp")
      fs.delete(tmp, true)
      // no forced broadcast on the anti join: the retired set is usually
      // small (AQE will broadcast it), but a full corpus refresh can
      // retire a large fraction — the shuffled anti join survives both
      spark.read.parquet(tPath.toString)
        .join(r, Seq("doc"), "left_anti")
        .repartition(col("doc"))
        .write.parquet(tmp.toString)
      val rowsAfter = spark.read.parquet(tmp.toString).count()
      fs.delete(tPath, true)
      require(fs.rename(tmp, tPath), s"compaction swap failed for $t")
      CompactStats(t, rowsBefore, rowsAfter, filesBefore,
        parquetFiles(tPath))
    }
  }
}
