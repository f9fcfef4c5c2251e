package graft.llm

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, udaf, xxhash64}

/** Sketch aggregates as typed `Aggregator`s — the §2.9 UDAF surface.
  *
  * KMV (k-minimum-values / bottom-k) distinct-count sketch: keep the k
  * smallest hash values seen; if fewer than k values exist the count is
  * exact, otherwise estimate (k-1)/u_k where u_k is the k-th minimum mapped
  * to (0,1). The buffer is k longs regardless of input size, merge is a
  * bounded union — partial aggregation ships kilobytes per partition at
  * any data scale. Deterministic: input is pre-hashed with xxhash64, no
  * RNG. */
object Sketches {

  /** Shared bottom-k kernel: `buf` stays sorted-ascending distinct.
    * Common case after warmup: h >= max -> O(1) no-op; otherwise
    * O(log k) binary-search insert. Never a full sort per row (that made
    * the sketch 10x slower than exact countDistinct). */
  private def kmvInsert(buf: Seq[Long], h: Long, k: Int): Seq[Long] =
    if (buf.size >= k && h >= buf.last) buf
    else {
      val idx = {
        var lo = 0; var hi = buf.size
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (buf(mid) < h) lo = mid + 1 else hi = mid
        }
        lo
      }
      if (idx < buf.size && buf(idx) == h) buf // dedup
      else {
        val s = (buf.take(idx) :+ h) ++ buf.drop(idx)
        if (s.size <= k) s else s.take(k)
      }
    }

  private def kmvMergeBufs(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] = {
    val s = (a ++ b).distinct.sorted
    if (s.size <= k) s else s.take(k)
  }

  class KmvDistinct(k: Int) extends Aggregator[Long, Seq[Long], Long] {
    override def zero: Seq[Long] = Vector.empty

    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      kmvInsert(buf, h, k)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      kmvMergeBufs(a, b, k)

    override def finish(buf: Seq[Long]): Long =
      if (buf.size < k) buf.size.toLong
      else {
        // map the k-th minimum signed long to u in (0,1)
        val uK = (buf.last.toDouble / 1.8446744073709552e19) + 0.5
        math.round((k - 1) / uK)
      }

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[KmvDistinct]]'s sibling that returns the bottom-k hash SET itself
    * (sorted ascending) instead of the count estimate — the mergeable
    * form that makes KMV a SET-OPERATION sketch: bottom-k of the union
    * of two sketches is the union sketch, and the fraction of the union
    * sketch present in both inputs estimates Jaccard (Bar-Yossef et al.
    * 2002; Beyer et al. 2007) — so distinct-union / intersection /
    * similarity between corpora come from kilobyte sketches instead of
    * a shuffle of the full key sets (see q135). */
  class KmvMins(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      kmvInsert(buf, h, k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      kmvMergeBufs(a, b, k)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form of [[KmvMins]] (same hash modes as [[kmvDistinct]]). */
  def kmvMins(c: Column, k: Int = 256, hashMode: String = "xxh64"): Column = {
    val hashed =
      if (hashMode == "md5") call_function("md5_lower64", c.cast("string"))
      else xxhash64(c)
    udaf(new KmvMins(k)).apply(hashed)
  }

  /** Column form: approximate distinct count of `col` with a k-value
    * sketch. Usage: `df.agg(Sketches.kmvDistinct(col("x"), 256))`.
    *
    * `hashMode` "xxh64" (production default) or "md5": hash the value's
    * canonical string form with the cross-engine `md5_lower64` kernel
    * (= DuckDB `md5_number_lower`), which makes the whole sketch — bottom-k
    * set, k-th minimum, estimate — recomputable by an external oracle
    * (the estimate is a pure function of the hash values; see q40's
    * oracle SQL).
    *
    * NULL contract: xxh64 mode counts NULL as one distinct value
    * (`xxhash64(NULL)` = the seed); md5 mode requires a non-null column —
    * `cast(NULL as string)` stays NULL, which the typed Long aggregator
    * rejects — matching the oracle, which is defined over values. */
  def kmvDistinct(c: Column, k: Int = 256, hashMode: String = "xxh64"): Column = {
    val hashed =
      if (hashMode == "md5") call_function("md5_lower64", c.cast("string"))
      else xxhash64(c)
    udaf(new KmvDistinct(k)).apply(hashed)
  }

  /** Count-Min sketch (Cormode & Muthukrishnan 2005): d hash rows × w
    * counters; every value increments one counter per row, a point query
    * reads the MINIMUM of its d counters — an overestimate by at most
    * εN with probability 1−δ for w = e/ε, d = ln(1/δ). The buffer is
    * d·w longs REGARDLESS of input size and merge is elementwise
    * addition — commutative and associative, so the result is
    * bit-identical under any partitioning or merge order (unlike
    * float sums, integer adds have no order sensitivity at all).
    *
    * Input is the value's PRE-HASHED 31-bit form (the `md5_lower64 >>>
    * 33` convention every md5-mode sketch here uses); the d row buckets
    * derive from it by the q17 affine family ((h·a+b) mod 2³¹−1) mod w —
    * all non-negative integer arithmetic an external oracle replays
    * exactly. Row i's counters live at buffer[i·w .. i·w+w). */
  class CountMin(params: Seq[(Long, Long)], w: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    private val d = params.size
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < d) {
        val (a, b) = params(i)
        buf(i * w + (((h * a + b) % 2147483647L) % w).toInt) += 1L
        i += 1
      }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: Count-Min counter array over a pre-hashed 31-bit
    * column. Point estimates read `least` over `element_at(sketch,
    * i*w + bucket_i + 1)` — see q122. */
  def cms(preHashed: Column, params: Seq[(Long, Long)], w: Int): Column =
    udaf(new CountMin(params, w)).apply(preHashed)

  /** HyperLogLog registers (Flajolet et al. 2007) over a pre-hashed
    * 31-bit column: the top `p` bits pick one of m = 2^p registers, the
    * register keeps the MAX leading-zero rank of the remaining
    * w = 31−p bits. Merge is elementwise max — order-insensitive, so
    * the registers are bit-identical under any partitioning, and the
    * whole register build is replayable by an external oracle (GROUP BY
    * idx, MAX(rank) over the same integer arithmetic).
    *
    * The ESTIMATE ([[hllEstimate]]) deliberately omits the standard
    * small-range linear-counting correction: it needs `ln`, which is
    * not bit-identical across engines (the q74 lesson). The raw
    * harmonic estimate is fully deterministic — every 2^-rank term is a
    * dyadic rational with denominator 2^(w+1), so the float sum is
    * EXACT in any order — and the active-register count rides along so
    * a consumer can apply corrections downstream. */
  class Hll(p: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(p >= 4 && p <= 16, s"hll precision $p out of range")
    private val m = 1 << p
    private val w = 31 - p
    override def zero: Array[Long] = new Array[Long](m)
    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val idx = (h >>> w).toInt
      val v = h & ((1L << w) - 1)
      val rho =
        if (v == 0) w + 1
        else w - (64 - java.lang.Long.numberOfLeadingZeros(v)) + 1
      if (rho > buf(idx)) buf(idx) = rho.toLong
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def hllRegisters(preHashed: Column, p: Int): Column =
    udaf(new Hll(p)).apply(preHashed)

  /** Raw harmonic HLL estimate from a register array (see [[Hll]] for
    * why no small-range correction): α_m·m²/Σ 2^−M[j], exact-dyadic
    * float sum in fixed array order. */
  def hllEstimate(registers: Column, p: Int): Column = {
    import org.apache.spark.sql.functions._
    val m = 1 << p
    val alphaM2 = 0.7213 / (1 + 1.079 / m) * m * m
    // dynamic shift: the Scala `shiftleft` helper takes a literal bit
    // count, the SQL function takes a column
    val s = aggregate(registers, lit(0.0),
      (acc, r) => acc + lit(1.0) /
        call_function("shiftleft", lit(1L), r.cast("int")))
    lit(alphaM2) / s
  }

  /** Fixed-grid histogram quantile sketch — the QUANTILE member of the
    * sketch family (KMV=distinct, CMS=frequency, HLL=cardinality): the
    * scale-safe sibling of exact `percentile`/`median` (q57/q48), whose
    * aggregation buffer holds every group value and whose window sorts a
    * whole group in one task. Here the buffer is `bins` longs REGARDLESS
    * of input size and merge is elementwise addition — commutative,
    * associative, bit-identical under any partitioning (the CMS
    * discipline), so partial aggregation ships kilobytes per partition
    * at 100 TB. Error is bounded by one bin width of the fixed
    * [lo, hi) grid, the knob a caller sizes from domain knowledge
    * (a KLL sketch would adapt the grid but its compaction path is
    * RNG-driven — this engine's sketches are deterministic and
    * oracle-replayable by contract, see [[Hll]]).
    *
    * Binning is ONE fixed IEEE sequence — floor((x − lo) / (hi − lo) ·
    * bins), clamped to [0, bins) so out-of-range values land in the edge
    * bins — that an external oracle replays exactly; counts and the
    * rank-based quantile selection ([[histQuantile]]) are all-integer.
    * Non-null, non-NaN numeric input required (the typed-Long aggregator
    * rule): NaN would otherwise bin at `floor(NaN).toInt == 0` — a
    * silent low-edge inflation that shifts every quantile, and one an
    * external oracle's FLOOR/LEAST/GREATEST replay can bin differently.
    * reduce fails fast instead; callers filter or impute NaN upstream
    * (`isnan`), the same explicit-contract posture as NULLs. */
  class FixedHistogram(lo: Double, hi: Double, bins: Int)
      extends Aggregator[Double, Array[Long], Array[Long]] {
    require(bins >= 1 && hi > lo, s"bad histogram grid [$lo,$hi)x$bins")
    override def zero: Array[Long] = new Array[Long](bins)
    override def reduce(buf: Array[Long], x: Double): Array[Long] = {
      require(!x.isNaN,
        s"histogram[$lo,$hi)x$bins: NaN input — filter or impute upstream")
      val b0 = math.floor((x - lo) / (hi - lo) * bins).toInt
      val b = if (b0 < 0) 0 else if (b0 >= bins) bins - 1 else b0
      buf(b) += 1L
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form: per-group bin-count array over a non-null numeric
    * column. Quantiles read via [[histQuantile]]. */
  def histogram(c: Column, lo: Double, hi: Double, bins: Int): Column =
    udaf(new FixedHistogram(lo, hi, bins)).apply(c.cast("double"))

  /** Merge ALREADY-BUILT histogram sketches (elementwise integer add) —
    * the property that makes the sketch family a materialized-view
    * primitive: compute per-group sketches ONCE, then answer any
    * coarser grouping's quantiles by merging arrays instead of
    * rescanning the data (q148's shape). Same grid required, enforced
    * per row. */
  class HistMergeAgg(bins: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    require(bins >= 1)
    override def zero: Array[Long] = new Array[Long](bins)
    override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] = {
      require(sk != null && sk.size == bins,
        s"histMerge: sketch has ${Option(sk).map(_.size)} bins, grid is $bins")
      var i = 0
      while (i < bins) { buf(i) += sk(i); i += 1 }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < bins) { x(i) += y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form of [[HistMergeAgg]] over a sketch (array) column. */
  def histMerge(sk: Column, bins: Int): Column =
    udaf(new HistMergeAgg(bins)).apply(sk)

  /** Two-sample Kolmogorov-Smirnov from two SAME-GRID histogram
    * sketches — the drift statistic for value domains too wide or
    * heavy-tailed for q224's exact distinct-value windows (whose state
    * is bounded by the quantized DOMAIN; a histogram bounds it by the
    * GRID, a constant). The sup runs over bin boundaries only, so the
    * estimate can miss in-bin CDF movement: |KS_exact - KS_hist| <=
    * max over bins of (pA(bin) + pB(bin)), which the returned
    * `max_mass` states in the same integer gap units (divide by
    * n_a*n_b) — callers emit the bound next to the estimate instead of
    * pretending the sketch is exact (SketchesSpec asserts it).
    *
    * All-integer scan, one HOF pass: cumulative side counts, gap =
    * |cumA*nB - cumB*nA| (cross-multiplied exactly like q224 — no float
    * CDF), first-strict-max bin index rides along (`at_bin`, -1 when
    * every gap is zero). Contract: n_a*n_b < 2^63 (q224's same bound).
    */
  def histKs(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    val na = aggregate(a, lit(0L), (s, x) => s + x)
    val nb = aggregate(b, lit(0L), (s, x) => s + x)
    val pairs = zip_with(a, b, (x, y) => struct(x.as("a"), y.as("b")))
    val zero = struct(lit(0L).as("ca"), lit(0L).as("cb"),
      lit(0L).as("gap"), lit(0L).as("mass"),
      lit(-1).as("i"), lit(-1).as("at"))
    val scanned = aggregate(pairs, zero, (acc, p) => {
      val ca = acc("ca") + p("a")
      val cb = acc("cb") + p("b")
      val g = abs(ca * nb - cb * na)
      val m = p("a") * nb + p("b") * na
      val i = acc("i") + 1
      struct(ca.as("ca"), cb.as("cb"),
        greatest(acc("gap"), g).as("gap"),
        greatest(acc("mass"), m).as("mass"),
        i.as("i"),
        when(g > acc("gap"), i).otherwise(acc("at")).as("at"))
    })
    struct(na.as("n_a"), nb.as("n_b"), scanned("gap").as("max_gap"),
      scanned("mass").as("max_mass"), scanned("at").as("at_bin"))
  }

  /** Merge ALREADY-BUILT bottom-k (KMV) sketches — bottom-k of the
    * union of bottom-k sets IS the union's bottom-k, so per-group
    * distinct-count sketches roll up to any coarser grouping without a
    * rescan ([[HistMergeAgg]]'s argument for the distinct-count family;
    * q149's shape). */
  class KmvMergeAgg(k: Int)
      extends Aggregator[Seq[Long], Seq[Long], Seq[Long]] {
    require(k >= 1)
    override def zero: Seq[Long] = Vector.empty
    override def reduce(buf: Seq[Long], sk: Seq[Long]): Seq[Long] =
      kmvMergeBufs(buf, sk, k)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      kmvMergeBufs(a, b, k)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form of [[KmvMergeAgg]] over a mins (array) column. */
  def kmvMerge(mins: Column, k: Int): Column =
    udaf(new KmvMergeAgg(k)).apply(mins)

  /** Merge ALREADY-BUILT HLL register arrays (elementwise MAX — exactly
    * [[Hll.merge]] lifted to a sketch column), completing the rollup
    * family for the CARDINALITY member: per-group register sketches
    * answer any coarser grouping's distinct estimate with no rescan
    * (q150's shape; [[HistMergeAgg]] is the add twin for histograms AND
    * Count-Min counters — CMS rollup is `histMerge(sk, d·w)`, no
    * separate operator needed). Same precision required, enforced per
    * row; max is idempotent/commutative/associative, so the merged
    * registers are bit-identical to registers built directly over the
    * union under ANY partitioning or merge order. */
  class HllMergeAgg(m: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    require(m >= 1)
    override def zero: Array[Long] = new Array[Long](m)
    override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] = {
      require(sk != null && sk.size == m,
        s"hllMerge: sketch has ${Option(sk).map(_.size)} registers, m is $m")
      var i = 0
      while (i < m) { if (sk(i) > buf(i)) buf(i) = sk(i); i += 1 }
      buf
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < m) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }
    override def finish(buf: Array[Long]): Array[Long] = buf
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Column form of [[HllMergeAgg]] over a register (array) column;
    * `p` is the precision the sketches were built with. */
  def hllMerge(sk: Column, p: Int): Column =
    udaf(new HllMergeAgg(1 << p)).apply(sk)

  /** Approximate quantile from a [[histogram]] sketch: the MIDPOINT of
    * the first bin whose cumulative count reaches rank ceil(q·N) — the
    * grid-resolution upper bound on the true quantile's bin. All-integer
    * scan (counts, cumulative sums, rank compare against an exact ceil),
    * then one fixed IEEE affine map to the bin midpoint — deterministic
    * and replayable (rank-vs-cum integer compares cannot straddle float
    * rounding). NULL on an empty sketch. */
  def histQuantile(sk: Column, lo: Double, hi: Double, bins: Int,
                   q: Double): Column = {
    import org.apache.spark.sql.functions._
    require(q > 0.0 && q <= 1.0, s"quantile $q out of (0,1]")
    val n = aggregate(sk, lit(0L), (a, x) => a + x)
    val target = ceil(lit(q) * n) // exact on doubles < 2^53
    val zero = struct(lit(0L).as("cum"), lit(0).as("i"), lit(-1).as("ans"))
    val scanned = aggregate(sk, zero, (acc, c) => {
      val cum = acc("cum") + c
      struct(cum.as("cum"), (acc("i") + 1).as("i"),
        when(acc("ans") >= 0, acc("ans"))
          .when(cum >= target, acc("i"))
          .otherwise(lit(-1)).as("ans"))
    })
    when(n > 0,
      lit(lo) + (scanned("ans").cast("double") + 0.5) *
        lit((hi - lo) / bins))
  }

  // ---------------------------------------------------------------------
  // Misra-Gries heavy hitters — the sketch family's "WHAT are the top-K
  // keys" member. KMV answers how-many-distinct, CMS how-often-is-THIS-
  // key (probe terms needed a priori), HLL cardinality, the histogram
  // quantiles; nothing answered corpus-wide top-K without a full groupBy
  // shuffle over every distinct key. An MG summary holds at most k
  // (key, count) entries plus one decrement offset: count is a LOWER
  // bound on the key's true frequency, true ≤ count + off, and
  // off ≤ N/(k+1) — so every key with frequency above N/(k+1) is
  // GUARANTEED present (Misra & Gries 1982; merge rule and bound
  // carryover from Agarwal et al., "Mergeable Summaries", PODS 2012).
  // ---------------------------------------------------------------------

  /** MG summary buffer: keys sorted ASCENDING (the canonical form that
    * makes equal summaries byte-equal), parallel counts, and `off` —
    * the cumulative decrement offset that bounds the undercount. */
  type MgBuf = (Seq[String], Seq[Long], Long)

  private def mgIndexOf(ks: Seq[String], key: String): Int = {
    var lo = 0; var hi = ks.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ks(mid) < key) lo = mid + 1 else hi = mid
    }
    if (lo < ks.size && ks(lo) == key) lo else -(lo + 1)
  }

  /** Deterministic two-summary merge: counter union (sum shared keys,
    * off adds), then if over k entries subtract the (k+1)-th largest
    * count from ALL and drop the non-positive — a uniform subtraction
    * with no tie CHOICE (ties at the pivot all drop together), so the
    * merged summary is a pure function of its two inputs. */
  private[llm] def mgMerge(a: MgBuf, b: MgBuf, k: Int): MgBuf = {
    val m = scala.collection.mutable.TreeMap.empty[String, Long]
    a._1.indices.foreach(i => m.update(a._1(i), a._2(i)))
    b._1.indices.foreach(i => m.update(b._1(i), m.getOrElse(b._1(i), 0L) + b._2(i)))
    var off = a._3 + b._3
    if (m.size > k) {
      val s = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      off += s
      m.filterInPlace((_, c) => c > s)
    }
    val ks = m.keys.toVector
    (ks, ks.map(m), off)
  }

  /** Typed MG aggregator over string keys (NULLs rejected — filter
    * upstream, the engine's typed-aggregator rule). reduce is the
    * classic streaming update (hit +1; miss inserts below k, else
    * decrement-all and drop zeros), O(log k) per hit and O(k) per
    * full-buffer miss; merge is [[mgMerge]]. The per-key bound
    * (count ≤ true ≤ count + off, off ≤ N/(k+1)) holds under ANY
    * reduce/merge interleaving; the exact counter VALUES depend on
    * arrival/merge order like every MG implementation — callers needing
    * run-replayable values pin the order with [[heavyHittersOrdered]]. */
  class MisraGries(k: Int) extends Aggregator[String, MgBuf, MgBuf] {
    require(k >= 1, s"heavy-hitters k $k must be >= 1")
    override def zero: MgBuf = (Vector.empty, Vector.empty, 0L)
    override def reduce(buf: MgBuf, key: String): MgBuf = {
      require(key != null, "heavyHitters: NULL key — filter upstream")
      val (ks, cs, off) = buf
      val i = mgIndexOf(ks, key)
      if (i >= 0) (ks, cs.updated(i, cs(i) + 1), off)
      else if (ks.size < k) {
        val ins = -(i + 1)
        ((ks.take(ins) :+ key) ++ ks.drop(ins),
          (cs.take(ins) :+ 1L) ++ cs.drop(ins), off)
      } else {
        val dec = cs.map(_ - 1L)
        val keep = dec.indices.filter(dec(_) > 0L)
        (keep.map(ks).toVector, keep.map(dec).toVector, off + 1L)
      }
    }
    override def merge(a: MgBuf, b: MgBuf): MgBuf = mgMerge(a, b, k)
    override def finish(buf: MgBuf): MgBuf = buf
    override def bufferEncoder: Encoder[MgBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgBuf]()
    override def outputEncoder: Encoder[MgBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[MgBuf]()
  }

  /** Column form: per-group MG summary of a string key column — struct
    * (_1 keys asc, _2 counts, _3 off). The unordered scale path (plain
    * partial aggregation; values vary within the MG bound under merge
    * reordering, the bound itself never does). */
  def heavyHitters(c: Column, k: Int): Column =
    udaf(new MisraGries(k)).apply(c.cast("string"))

  /** One heavy-hitters entry: `count ≤ true frequency ≤ count + off` of
    * the summary it came from. */
  final case class HeavyHitter(key: String, count: Long)

  /** Deterministic whole-input summary: entries sorted (count desc, key
    * asc), the decrement offset, and the exact row count N.
    *
    * Determinism: one MG partial per INPUT partition, each built in
    * scan order (deterministic for a parquet scan — one group per
    * partition, so the partial IS the group's final buffer), then folded
    * in partition-id order on the driver. The fold is P bounded buffers
    * of ≤ k entries — kilobytes collected, the same bounded-collect
    * discipline as the Categorify vocab; at extreme partition counts a
    * fixed-shape tree merge (pair pids, merge, repeat) bounds any one
    * fold step, and the error bound needs no order at all — this
    * ordered fold exists so repeated runs and an inlining oracle see
    * byte-identical counter values. */
  def heavyHittersOrdered(df: org.apache.spark.sql.DataFrame, keyCol: String,
                          k: Int): (Seq[HeavyHitter], Long, Long) = {
    import org.apache.spark.sql.functions._
    val parts = df
      .select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
      .select(col("__k"), spark_partition_id().as("__pid"))
      .groupBy("__pid")
      .agg(heavyHitters(col("__k"), k).as("sk"), count(lit(1)).as("n"))
      .collect()
      .sortBy(_.getInt(0))
    var acc: MgBuf = (Vector.empty, Vector.empty, 0L)
    var n = 0L
    parts.foreach { r =>
      val sk = r.getStruct(1)
      acc = mgMerge(acc,
        (sk.getSeq[String](0), sk.getSeq[Long](1), sk.getLong(2)), k)
      n += r.getLong(2)
    }
    val entries = acc._1.indices
      .map(i => HeavyHitter(acc._1(i), acc._2(i)))
      .sortBy(h => (-h.count, h.key))
    (entries, acc._3, n)
  }
}
