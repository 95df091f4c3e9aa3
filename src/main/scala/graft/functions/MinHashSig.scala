package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: for each of `perms` seeded xxhash64
  * permutations, the minimum hash over the input shingle set.
  *
  * The SQL formulation (transform over perms × array_min over transform
  * over shingles) allocates a lambda frame and boxes per element —
  * O(perms·n) interpreted closures per row. This expression is one
  * tight primitive double loop (CodegenFallback is fine: the loop body
  * itself is JIT-compiled JVM code, called once per row).
  */
case class MinHashSig(child: Expression, perms: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string>, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // empty shingle set has no defined signature — null, not a shared
    // sentinel vector that would band every empty doc together
    if (n == 0) return null
    val sig = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      var p = 0
      while (p < perms) {
        val h = XxHash64Function.hash(s, StringType, p.toLong)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
