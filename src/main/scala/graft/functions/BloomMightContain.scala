package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]], for declarative
  * semi-join pruning (`bloom_might_contain(bloomBytes, key)`).
  *
  * Why an expression and not Spark's own runtime filter: the built-in
  * InjectRuntimeFilter rule only fires when the application side's scan
  * exceeds `spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold`
  * (10 GB default) — correct for a planner that must not pay sketch-build
  * cost speculatively, but it means the 100 TB plan shape is untestable at
  * bench SF. This is the DECLARATIVE variant (the same relationship the
  * Skew tier has to AQE's skew-join split): the caller builds the dim-side
  * bloom once (`DataFrameStatFunctions.bloomFilter`, a tree-aggregated
  * sketch whose shipped size is the bit array, not the rows), embeds it as
  * a binary literal, and the fact side filters BEFORE its shuffle — at
  * 100 TB the win is exchange bytes on the fact relation, bought for one
  * broadcast-sized sketch. False positives pass the probe and are removed
  * by the exact join that follows; the expression never changes an answer
  * (the oracle is the plain join).
  *
  * The first child must be a FOLDABLE binary (the serialized sketch): the
  * filter deserializes once per JVM lazily and codegen embeds the
  * deserialized object via `addReferenceObj`, so the per-row cost is two
  * hash multiplications and `k` bit probes inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a foldable (literal) serialized bloom" +
          " as its first argument")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per JVM (driver for interpreted eval + codegen
    * reference capture; executors re-run the lazy from the serialized
    * task's `bloomBytes`). */
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: serialized bloom is null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  // The left child's generated code is a constant reference to the literal
  // bytes (no per-row work); the probe itself goes through a reference to
  // the ONE deserialized filter. Locals all come from ctx (freshName /
  // addReferenceObj) — the CosineF32 redefinition lesson, pinned by the
  // CODEGEN_ONLY composition spec in FunctionsSpec.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BloomMightContain].getName, "bloom_might_contain")
}
