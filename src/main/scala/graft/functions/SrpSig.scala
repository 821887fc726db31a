package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: the full 32-plane SRP (signed random
  * projection) signature of a float32 vector in one codegen'd pass.
  *
  * The composable formulation — 32 × `when(aggregate(zip_with(e, w, *),
  * 0.0, +) >= 0, bit)` — runs 32 interpreted higher-order folds per row
  * (HigherOrderFunction lambdas don't participate in whole-stage
  * codegen). Here the ±1 hyperplanes arrive bit-packed as one long per
  * plane (second, foldable argument; bit i set ⇔ weight i is −1), and
  * the per-plane accumulation is a primitive loop.
  *
  * Numeric parity: per plane the accumulation is left-to-right in double
  * over float-widened elements, and x·(+1.0) ≡ x / x·(−1.0) ≡ −x
  * bit-exactly, so signatures equal the fold formulation (asserted in
  * FunctionsSpec) and the DuckDB twin generated from the same constants.
  * A vector whose length differs from [[SrpSig.Dim]] yields signature 0 —
  * exactly what the fold computes (null-poisoned dots fail every
  * `>= 0` test). */
case class SrpSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _))
        if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"srp_sig requires (array<float>, foldable array<bigint>), got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "srp_sig"

  @transient private lazy val masks: Array[Long] =
    right.eval().asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var sig = 0L
    if (x.numElements() == SrpSig.Dim) {
      var j = 0
      while (j < masks.length) {
        var acc = 0.0
        val m = masks(j)
        var i = 0
        while (i < SrpSig.Dim) {
          val xi = x.getFloat(i).toDouble
          acc += (if (((m >>> i) & 1L) == 0L) xi else -xi)
          i += 1
        }
        if (acc >= 0.0) sig |= (1L << j)
        j += 1
      }
    }
    sig
  }

  // ALL emitted locals (including loop variables) via ctx.freshName —
  // same Janino redefinition hazard as CosineF32 when two signature
  // expressions share one generated function.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val masksRef = ctx.addReferenceObj("srpMasks", masks, "long[]")
      val sig = ctx.freshName("sig")
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      s"""
         |long $sig = 0L;
         |if ($a.numElements() == ${SrpSig.Dim}) {
         |  for (int $j = 0; $j < $masksRef.length; $j++) {
         |    double $acc = 0.0;
         |    long $m = $masksRef[$j];
         |    for (int $i = 0; $i < ${SrpSig.Dim}; $i++) {
         |      double $x = (double) $a.getFloat($i);
         |      $acc += ((($m >>> $i) & 1L) == 0L) ? $x : -$x;
         |    }
         |    if ($acc >= 0.0) $sig |= (1L << $j);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpSig =
    copy(left = newLeft, right = newRight)
}

object SrpSig {
  /** Embedding dimensionality the bit-packed masks cover (one bit per
    * element of a 64-bit long). */
  val Dim = 64

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SrpSig].getName, "srp_sig")
}
