package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float32 vectors in
  * one codegen'd loop (three accumulators, no intermediate arrays).
  *
  * The composable formulation — `aggregate(zip_with(a,b,*))/sqrt(...)` —
  * materializes two product arrays per row and walks each vector five
  * times through generic ArrayData lambdas. This expression reads each
  * input once; per-element work is two float loads and three fused
  * multiply-adds, inside whole-stage codegen (SURVEY §2.9: the one place
  * the extension set earns a custom Expression).
  *
  * Numeric parity: accumulation is left-to-right in double over
  * float-widened elements — exactly the fold order of the composable
  * version and of DuckDB's `list_sum(list_transform(...))`, so results
  * are bit-identical and the DuckDB oracles keep matching.
  */
case class CosineF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is off-limits (AbstractDataType is private[sql]);
  // type-check manually instead.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_f32 requires (array<float>, array<float>), got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  // Nullable even over non-null inputs: ragged lengths produce null, and
  // codegen writes ev.isNull (which Spark elides unless nullable).
  override def nullable: Boolean = true

  override def prettyName: String = "cosine_f32"

  // Ragged inputs (different lengths) yield null, matching the composable
  // zip_with formulation (null padding poisons its fold) and the oracle —
  // silent truncation would hide exactly the malformed rows verification
  // exists to catch.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  // Every emitted local goes through ctx.freshName: two cosine-bearing
  // expressions can land in ONE generated function (a projection scoring
  // two vector columns — or the parity spec itself), where fixed names
  // make Janino fail ("Redefinition of local variable") and Spark
  // silently interpret the whole projection. CODEGEN_ONLY specs in
  // FunctionsSpec pin this.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (Math.sqrt($na) * Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineF32 =
    copy(left = newLeft, right = newRight)
}

object CosineF32 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineF32].getName, "cosine_f32")
}
