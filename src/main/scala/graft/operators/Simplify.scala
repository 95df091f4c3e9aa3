package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Ramer–Douglas–Peucker polyline simplification — mirrors
  * /root/reference/private/rdp-simplify.rkt (rdp-simplify l.70,
  * including `#:keep-positions`).
  *
  * Like the spline, a polyline is sequential within a series, so the
  * scale unit is the group: each key's polyline simplifies locally in
  * `flatMapGroups` (iterative stack, no recursion-depth limit). Very
  * long single series should be chunked upstream (simplify chunks,
  * then simplify the concatenated survivors).
  */
object Simplify {

  /** Indices kept by RDP with tolerance epsilon. Endpoints always kept;
    * `keep` positions are forced survivors (reference #:keep-positions). */
  private[graft] def rdpKeepIndices(xs: Array[Double], ys: Array[Double],
                                    epsilon: Double, keep: Set[Int] = Set.empty): Array[Int] = {
    val n = xs.length
    if (n <= 2) return (0 until n).toArray
    val keepFlags = new Array[Boolean](n)
    keepFlags(0) = true; keepFlags(n - 1) = true
    keep.foreach(i => if (i >= 0 && i < n) keepFlags(i) = true)
    val stack = mutable.Stack[(Int, Int)]()
    // split at forced positions first so each segment is independent
    val forced = (Seq(0, n - 1) ++ keep.filter(i => i > 0 && i < n - 1)).distinct.sorted
    forced.sliding(2).foreach { case Seq(a, b) => if (b > a + 1) stack.push((a, b)); case _ => }
    while (stack.nonEmpty) {
      val (a, b) = stack.pop()
      var maxD = -1.0; var maxI = -1
      val dx = xs(b) - xs(a); val dy = ys(b) - ys(a)
      val len = math.sqrt(dx * dx + dy * dy)
      var i = a + 1
      while (i < b) {
        val d =
          if (len == 0) math.hypot(xs(i) - xs(a), ys(i) - ys(a))
          else math.abs(dy * xs(i) - dx * ys(i) + xs(b) * ys(a) - ys(b) * xs(a)) / len
        if (d > maxD) { maxD = d; maxI = i }
        i += 1
      }
      if (maxD > epsilon && maxI > a && maxI < b) {
        keepFlags(maxI) = true
        if (maxI > a + 1) stack.push((a, maxI))
        if (b > maxI + 1) stack.push((maxI, b))
      }
    }
    (0 until n).filter(keepFlags).toArray
  }

  /** Simplify each key's polyline (ordered by xCol). Returns the
    * surviving rows as (key, x, y). */
  def rdp(df: DataFrame, keyCol: String, xCol: String, yCol: String, epsilon: Double): DataFrame = {
    val rows = df.select(col(keyCol).cast("long"), col(xCol).cast("double"), col(yCol).cast("double"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble))
    rows.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroups { (key, it) =>
        // secondary sort on y: ties in x otherwise order by partition
        // iteration order, making the kept set run-dependent (and
        // oracle-incomparable) on corpora with duplicate x values
        val pts = it.map(t => (t._2, t._3)).toArray.sortBy(p => (p._1, p._2))
        val kept = rdpKeepIndices(pts.map(_._1), pts.map(_._2), epsilon)
        kept.iterator.map(i => (key, pts(i)._1, pts(i)._2))
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaDouble))
      .toDF(keyCol, xCol, yCol)
  }
}
