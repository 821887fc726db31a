package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions.call_function

/** Registration surface for graft's native expressions.
  *
  * Two entry points, per the standard extension pattern:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (injectFunction), or
  *  - `GraftFunctions.register(spark)` on an existing session (idempotent)
  *    — what the query builders call, since they receive a session.
  */
object GraftFunctions {

  val cosineF32Id: FunctionIdentifier = FunctionIdentifier("cosine_f32")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(cosineF32Id)) {
      reg.registerFunction(cosineF32Id, CosineF32.info,
        exprs => CosineF32(exprs(0), exprs(1)))
    }
  }

  /** Column-level helper; requires `register` (or the extension) first. */
  def cosineF32(a: Column, b: Column): Column =
    call_function("cosine_f32", a, b)
}

/** `spark.sql.extensions`-injectable variant. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((GraftFunctions.cosineF32Id, CosineF32.info,
      exprs => CosineF32(exprs(0), exprs(1))))
}
