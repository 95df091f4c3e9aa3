package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Per-band hyperplane-LSH bucket keys over an `array<double>` vector:
  * key(b) has bit j set when plane(b·bandBits + j) · v ≥ 0.
  *
  * The previous formulation inlined every plane as a `typedLit`
  * 64-double array inside the expression tree — 192 planes made ~1 MB
  * task binaries ("Broadcasting large task binary" on every stage) and
  * enormous codegen. This kernel ships FIVE INTS: the plane matrix is
  * re-generated on each executor from the seed (the same seeded
  * `java.util.Random` stream as [[Hyperplanes.planes]], so keys are
  * bit-identical to the literal formulation), flattened row-major for
  * locality, and all `bits` dots run in one JIT-compiled primitive
  * loop per row (CodegenFallback is fine: the loop body is JVM code
  * invoked once per row).
  *
  * Dot accumulation order is ascending element index — identical to
  * [[ArrayDot]] — so signs (and therefore bucket keys and every
  * downstream oracle hash) are unchanged.
  */
case class HyperplaneBandKeys(child: Expression, dim: Int, bits: Int, bands: Int, seed: Int)
    extends UnaryExpression with CodegenFallback {

  require(bands > 0 && bits % bands == 0, s"bits ($bits) must divide into bands ($bands)")
  require(bits / bands <= 63, s"band key bits (${bits / bands}) must fit a signed long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_band_keys requires array<double|float>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_keys"

  @transient private lazy val flatPlanes: Array[Double] = Hyperplanes.flat(dim, bits, seed)
  @transient private lazy val bandBits: Int = bits / bands
  // float elements widen exactly per element; accumulation stays
  // double, so signs/keys are bit-identical to the cast-up-front plan
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val keys = new Array[Long](bands)
    var p = 0
    while (p < bits) {
      val off = p * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += flatPlanes(off + i) * x
        i += 1
      }
      if (acc >= 0) keys(p / bandBits) |= 1L << (p % bandBits)
      p += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic random hyperplanes: seeded driver-independent RNG so
  * every executor (and every round) derives the identical matrix. */
object Hyperplanes {
  def planes(dim: Int, bits: Int, seed: Int): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(bits)(Array.fill(dim)(rng.nextDouble() * 2 - 1))
  }

  /** Row-major flattening of [[planes]] — plane p occupies
    * [p·dim, (p+1)·dim). */
  def flat(dim: Int, bits: Int, seed: Int): Array[Double] = {
    val out = new Array[Double](bits * dim)
    val ps = planes(dim, bits, seed)
    var p = 0
    while (p < bits) { System.arraycopy(ps(p), 0, out, p * dim, dim); p += 1 }
    out
  }
}
