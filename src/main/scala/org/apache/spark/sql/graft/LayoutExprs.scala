package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Space-filling-curve layout kernels (companions to the pure-Column
  * Morton interleave in graft.ops.Layout).
  *
  * Why Hilbert is an Expression while Morton is a Column fold: Morton is
  * a stateless per-bit interleave, so the bits-step fold references each
  * input ONCE per step and the expression tree stays linear in `bits`.
  * The Hilbert transform carries rotated (x, y) STATE across steps — a
  * Column fold would substitute the whole prior-step expression into
  * every use of x and y, doubling the tree per step (2^bits blowup). A
  * tiny imperative loop in a codegen Expression is the honest shape: one
  * function call per row, whole-stage-codegen'd, zero allocation.
  */
object LayoutExprs {

  /** The standard Hilbert xy→d walk (the iterate-and-rotate form of the
    * curve both Wikipedia's xy2d and Iceberg-style layout writers use):
    * MSB→LSB, accumulate the quadrant index, rotate/reflect the frame.
    * Inputs must already be masked into [0, 2^bits); d occupies the low
    * 2·bits bits. Pure integer arithmetic — an engine with &, XOR and
    * integer division replays it exactly (the generated DuckDB oracle
    * runs the same walk as a recursive CTE).
    */
  private[graft] def hilbertD(x0: Long, y0: Long, bits: Int): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert-curve distance of the grid cell (x, y) — see
  * [[LayoutExprs.hilbertD]] for the algorithm and why this is an
  * Expression rather than a Column fold.
  */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    LayoutExprs.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a;
         |long $y = $b;
         |long $d = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) {
         |      $x = $s - 1 - $x;
         |      $y = $s - 1 - $y;
         |    }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

object LayoutColumns {
  def hilbertValue(x: Column, y: Column, bits: Int): Column =
    ExpressionUtils.column(HilbertValue(
      ExpressionUtils.expression(x), ExpressionUtils.expression(y), bits))
}
