package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit character-class count signature: 16 classes × 4-bit
  * SATURATING code-point counts, packed little-nibble-first.
  *
  * Purpose: a sound LOWER bound on edit distance that costs O(1) per
  * candidate pair instead of the banded DP's O((2d+1)·len). One unit
  * edit (insert / delete / substitute of one code point) changes the
  * true per-class count vector by L1 ≤ 2, so
  *
  *   nibbleL1(charCountSig(a), charCountSig(b)) ≤ 2 · editDistance(a, b)
  *
  * and a pair with nibbleL1 > 2·bound can be refuted without running
  * the DP. Both lossy steps only WEAKEN the bound, never break it:
  * merging code points into 16 classes shrinks L1 (triangle
  * inequality per class), and saturating each count at 15 shrinks
  * per-class differences (|min(x,15) − min(y,15)| ≤ |x − y|). The
  * signature is computed once per row (O(len)) and rides joins as one
  * long; the per-pair bound check is a 16-nibble loop inside
  * whole-stage codegen.
  *
  * Code points are decoded from the UTF-8 bytes by length prefix; the
  * class index mixes the code-point bytes through a Fibonacci-hash
  * multiply so ASCII text spreads over all 16 classes (a plain `c & 15`
  * folds 'a' and 'q' together for the whole lowercase alphabet).
  */
case class CharCountSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_count_sig requires string, got ${t.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "char_count_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val cnt = new Array[Int](16)
    val nb = s.numBytes()
    var i = 0
    while (i < nb) {
      val b0 = s.getByte(i) & 0xFF
      val len = if (b0 < 0x80) 1 else if (b0 < 0xE0) 2 else if (b0 < 0xF0) 3 else 4
      var cp = b0
      var j = 1
      while (j < len && i + j < nb) { cp = cp * 31 + (s.getByte(i + j) & 0xFF); j += 1 }
      val bk = (cp * 0x9E3779B1) >>> 28
      if (cnt(bk) < 15) cnt(bk) += 1
      i += len
    }
    var sig = 0L
    var b = 0
    while (b < 16) { sig |= cnt(b).toLong << (4 * b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val b0 = ctx.freshName("b0")
      val len = ctx.freshName("len")
      val cp = ctx.freshName("cp")
      val j = ctx.freshName("j")
      val bk = ctx.freshName("bk")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      s"""
         |int[] $cnt = new int[16];
         |int $nb = $a.numBytes();
         |int $i = 0;
         |while ($i < $nb) {
         |  int $b0 = $a.getByte($i) & 0xFF;
         |  int $len = $b0 < 0x80 ? 1 : $b0 < 0xE0 ? 2 : $b0 < 0xF0 ? 3 : 4;
         |  int $cp = $b0;
         |  for (int $j = 1; $j < $len && $i + $j < $nb; $j++) {
         |    $cp = $cp * 31 + ($a.getByte($i + $j) & 0xFF);
         |  }
         |  int $bk = ($cp * 0x9E3779B1) >>> 28;
         |  if ($cnt[$bk] < 15) $cnt[$bk]++;
         |  $i += $len;
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 16; $b++) {
         |  $sig |= ((long) $cnt[$b]) << (4 * $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L1 distance between two [[CharCountSig]] signatures: Σ over the 16
  * nibble fields of |aᵢ − bᵢ|. Int result in [0, 240]. */
case class NibbleL1(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nibble_l1 requires (bigint, bigint), got " +
        s"${left.dataType.simpleString(10)} / ${right.dataType.simpleString(10)}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nibble_l1"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long]
    var y = b.asInstanceOf[Long]
    var l1 = 0
    var k = 0
    while (k < 16) {
      val xa = (x & 15L).toInt
      val yb = (y & 15L).toInt
      l1 += (if (xa > yb) xa - yb else yb - xa)
      x >>>= 4; y >>>= 4
      k += 1
    }
    l1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val l1 = ctx.freshName("l1")
      val k = ctx.freshName("k")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      s"""
         |long $x = $a; long $y = $b;
         |int $l1 = 0;
         |for (int $k = 0; $k < 16; $k++) {
         |  int $xa = (int) ($x & 15L);
         |  int $yb = (int) ($y & 15L);
         |  $l1 += ($xa > $yb) ? $xa - $yb : $yb - $xa;
         |  $x >>>= 4; $y >>>= 4;
         |}
         |${ev.value} = $l1;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
