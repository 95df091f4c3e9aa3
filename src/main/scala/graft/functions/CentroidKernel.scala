package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Handle to a broadcast k×dim centroid matrix (flattened row-major).
  *
  * The IVF quantizer needs "nearest centroid id(s)" per vector. A
  * literal formulation (k `typedLit` arrays inside a `sort_array` of
  * structs) puts O(k·dim) expression nodes into the plan — fine at the
  * demo k, but a production coarse quantizer (k = 1024–65536 cells)
  * makes megabyte expression trees that break codegen and bloat every
  * task binary. Here the matrix travels ONCE per executor as a
  * `Broadcast[Array[Double]]` (the BroadcastBloom pattern) and the
  * argmin is one tight primitive loop in a native expression, so the
  * plan holds a single node regardless of k. */
case class BroadcastCentroids(flat: Broadcast[Array[Double]], k: Int, dim: Int) {

  /** array<int> of the `nprobe` nearest centroid ids, nearest first,
    * ties to the lower id. */
  def nearest(vec: Column, nprobe: Int): Column = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    org.apache.spark.sql.GraftColumnBridge.column(
      NearestCentroids(org.apache.spark.sql.GraftColumnBridge.expression(vec), this, nprobe))
  }

  /** The single nearest centroid id. */
  def nearestOne(vec: Column): Column =
    org.apache.spark.sql.functions.element_at(nearest(vec, 1), 1)

  /** `array<double>` residual vec − centroids[cid] — the quantity the
    * IVFADC codebooks encode (Jégou et al. TPAMI '11 §IV). One tight
    * primitive loop against the broadcast matrix; the matrix never
    * rides the plan. */
  def residual(vec: Column, cid: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      CentroidResidual(org.apache.spark.sql.GraftColumnBridge.expression(vec),
        org.apache.spark.sql.GraftColumnBridge.expression(cid), this))

  /** Release the executor-side copies (safe once no live plan needs
    * the kernel — e.g. between Lloyd iterations). */
  def destroy(): Unit = flat.destroy()
}

object BroadcastCentroids {
  def apply(spark: SparkSession, cents: Array[Array[Double]]): BroadcastCentroids = {
    require(cents.nonEmpty, "need at least one centroid")
    val dim = cents.head.length
    require(cents.forall(_.length == dim), "ragged centroid matrix")
    val flat = new Array[Double](cents.length * dim)
    var c = 0
    while (c < cents.length) {
      System.arraycopy(cents(c), 0, flat, c * dim, dim)
      c += 1
    }
    BroadcastCentroids(spark.sparkContext.broadcast(flat), cents.length, dim)
  }
}

/** Codegen'd nearest-centroid search over a broadcast matrix: for each
  * input vector, the `nprobe` centroid ids minimizing
  * ‖v−c‖² (up to the per-row constant ‖v‖²: score = ‖c‖² − 2·v·c).
  * The matrix never enters the plan — codegen references this
  * expression instance, which carries only the broadcast handle. */
case class NearestCentroids(child: Expression, cents: BroadcastCentroids, nprobe: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<double|float>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // per-(executor)deserialization squared norms — k doubles recomputed
  // from the broadcast matrix, never shipped
  @transient private lazy val norms: Array[Double] = {
    val flat = cents.flat.value
    val (k, dim) = (cents.k, cents.dim)
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      var s = 0.0
      var i = c * dim
      val end = i + dim
      while (i < end) { s += flat(i) * flat(i); i += 1 }
      out(c) = s
      c += 1
    }
    out
  }

  def nearestIds(input: ArrayData): ArrayData = {
    val flat = cents.flat.value
    val (k, dim) = (cents.k, cents.dim)
    // a silent prefix dot against mismatched dims would return wrong
    // nearest ids; fail with the actual shapes instead
    if (input.numElements() != dim)
      throw new IllegalArgumentException(
        s"nearest_centroids: vector has ${input.numElements()} dims, centroids have $dim")
    val n = dim
    val m = math.min(nprobe, k)
    // insertion into parallel (score, cid) arrays — m is tiny
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestC = Array.fill(m)(Int.MaxValue)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var i = 0
      val off = c * dim
      while (i < n) {
        val x = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
        dot += x * flat(off + i)
        i += 1
      }
      val d = norms(c) - 2.0 * dot
      if (d < bestD(m - 1) || (d == bestD(m - 1) && c < bestC(m - 1))) {
        var j = m - 1
        while (j > 0 && (d < bestD(j - 1) || (d == bestD(j - 1) && c < bestC(j - 1)))) {
          bestD(j) = bestD(j - 1); bestC(j) = bestC(j - 1); j -= 1
        }
        bestD(j) = d; bestC(j) = c
      }
      c += 1
    }
    new GenericArrayData(bestC)
  }

  override protected def nullSafeEval(input: Any): Any =
    nearestIds(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("centroidKernel", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $self.nearestIds($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd residual vec − centroids[cid] over the broadcast matrix
  * (same kernel pattern as [[NearestCentroids]] — the matrix travels
  * once per executor, the plan holds one node at any k). */
case class CentroidResidual(left: Expression, right: Expression, cents: BroadcastCentroids)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _) | ArrayType(FloatType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"centroid_residual requires (array<double|float>, int cid), " +
        s"got (${l.simpleString(10)}, ${r.simpleString(10)})")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_residual"

  @transient private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def compute(input: ArrayData, cid: Int): ArrayData = {
    val flat = cents.flat.value
    val dim = cents.dim
    if (input.numElements() != dim)
      throw new IllegalArgumentException(
        s"centroid_residual: vector has ${input.numElements()} dims, centroids have $dim")
    if (cid < 0 || cid >= cents.k)
      throw new IllegalArgumentException(s"centroid_residual: cid $cid outside [0, ${cents.k})")
    val off = cid * dim
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val x = if (isFloat) input.getFloat(i).toDouble else input.getDouble(i)
      out(i) = x - flat(off + i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(vec: Any, cid: Any): Any =
    compute(vec.asInstanceOf[ArrayData], cid.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("residKernel", this, classOf[CentroidResidual].getName)
    nullSafeCodeGen(ctx, ev, (v, c) => s"${ev.value} = $self.compute($v, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
