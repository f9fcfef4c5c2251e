package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed epsilon-neighbor self-join — the planar spatial join
  * shape (find all point pairs within Euclidean distance eps) without
  * an all-pairs cross product. A bare `a.join(b, dist <= eps)` has no
  * equi key and compiles to BroadcastNestedLoopJoin (O(n²), the plan
  * `PlanAuditSpec` outlaws). The standard cure — the same bucketize
  * discipline as [[RangeJoin]], in two dimensions: snap each point to
  * an eps-sized grid cell, replicate the LEFT side to its 3x3 neighbor
  * cells, keep the RIGHT side in its home cell, and ride a plain
  * shuffled EQUI-join on (cellY, cellX) with the exact d² <= eps²
  * predicate as a post-filter.
  *
  * Exactness: any pair within eps differs by < eps per axis, so the
  * right point's home cell is among the left point's nine neighbor
  * cells — no qualifying pair is missed. Each pair surfaces EXACTLY
  * once without a post-join distinct: the right side contributes one
  * home cell per point, and `idA < idB` halves the symmetric matches
  * (self-pairs drop with them).
  *
  * Scale: candidate mass is Σ per-cell (9·|left cell|·|right cell|) —
  * local density, never n². The join partitions like any other
  * shuffle; a hot cell (urban-core skew) bounds parallelism the same
  * way a hot RangeJoin bucket does, and the same salting cure applies
  * upstream if measured. Replication factor is a constant 9 on ONE
  * side only.
  *
  * Columns: input needs (idCol, latCol, lonCol); output is
  * (a_<id>, b_<id>, d2) with d² exact (callers round for display).
  * NULL coordinates or ids never join (cell keys go NULL) and are
  * filtered upfront.
  */
object Spatial {

  private def cells(df: DataFrame, idCol: String, latCol: String,
                    lonCol: String, eps: Double): DataFrame =
    df.filter(col(idCol).isNotNull && col(latCol).isNotNull &&
        col(lonCol).isNotNull)
      .select(col(idCol).as("__sp_id"),
        col(latCol).cast("double").as("__sp_lat"),
        col(lonCol).cast("double").as("__sp_lon"),
        floor(col(latCol).cast("double") / eps).cast("long").as("__sp_cy"),
        floor(col(lonCol).cast("double") / eps).cast("long").as("__sp_cx"))

  private def replicated(pts: DataFrame, idAs: String): DataFrame =
    pts.select(col("__sp_id").as(idAs),
        col("__sp_lat").as("__a_lat"), col("__sp_lon").as("__a_lon"),
        explode(array((for (dy <- -1 to 1; dx <- -1 to 1) yield
          struct((col("__sp_cy") + dy).as("cy"),
            (col("__sp_cx") + dx).as("cx"))): _*)).as("__c"))
      .select(col(idAs), col("__a_lat"), col("__a_lon"),
        col("__c.cy").as("__sp_cy"), col("__c.cx").as("__sp_cx"))

  private val d2Expr =
    (col("__a_lat") - col("__b_lat")) * (col("__a_lat") - col("__b_lat")) +
      (col("__a_lon") - col("__b_lon")) * (col("__a_lon") - col("__b_lon"))

  /** All distinct point pairs (idA < idB) within Euclidean distance
    * `eps` in the (lat, lon) plane. */
  def epsNeighborJoin(points: DataFrame, idCol: String, latCol: String,
                      lonCol: String, eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val pts = cells(points, idCol, latCol, lonCol, eps)
    val nbrs = replicated(pts, s"a_$idCol")
    val right = pts.select(col("__sp_id").as(s"b_$idCol"),
      col("__sp_lat").as("__b_lat"), col("__sp_lon").as("__b_lon"),
      col("__sp_cy"), col("__sp_cx"))
    nbrs.join(right, Seq("__sp_cy", "__sp_cx"))
      .filter(col(s"a_$idCol") < col(s"b_$idCol") && d2Expr <= lit(eps * eps))
      .select(col(s"a_$idCol"), col(s"b_$idCol"), d2Expr.as("d2"))
  }

  /** Two-dataset eps-join — the production enrichment form (events ×
    * POIs): every (left, right) pair within `eps`, each surfacing
    * exactly once (left replicates to its 3×3 neighbor cells, right
    * keeps its one home cell — same completeness argument as
    * [[epsNeighborJoin]], without the id< dedup because the sides are
    * distinct relations). Replicate the LEFT side; at scale put the
    * BIGGER side on the left so the 9× constant rides the scan-heavy
    * side of a broadcast/shuffled equi-join rather than inflating a
    * broadcast dimension. */
  def epsJoin(left: DataFrame, leftId: String, right: DataFrame,
              rightId: String, latCol: String, lonCol: String,
              eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    require(leftId != rightId,
      s"leftId and rightId must differ, both were '$leftId'")
    val l = replicated(cells(left, leftId, latCol, lonCol, eps), leftId)
    val r = cells(right, rightId, latCol, lonCol, eps)
      .select(col("__sp_id").as(rightId),
        col("__sp_lat").as("__b_lat"), col("__sp_lon").as("__b_lon"),
        col("__sp_cy"), col("__sp_cx"))
    l.join(r, Seq("__sp_cy", "__sp_cx"))
      .filter(d2Expr <= lit(eps * eps))
      .select(col(leftId), col(rightId), d2Expr.as("d2"))
  }
}
