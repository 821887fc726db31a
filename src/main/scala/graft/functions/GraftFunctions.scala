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
  val simHash64Id: FunctionIdentifier = FunctionIdentifier("simhash64")
  val srpSigId: FunctionIdentifier = FunctionIdentifier("srp_sig")
  val bloomMightContainId: FunctionIdentifier =
    FunctionIdentifier("bloom_might_contain")

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(cosineF32Id)) {
      reg.registerFunction(cosineF32Id, CosineF32.info,
        exprs => CosineF32(exprs(0), exprs(1)))
    }
    if (!reg.functionExists(simHash64Id)) {
      reg.registerFunction(simHash64Id, SimHash64.info,
        exprs => SimHash64(exprs(0)))
    }
    if (!reg.functionExists(srpSigId)) {
      reg.registerFunction(srpSigId, SrpSig.info,
        exprs => SrpSig(exprs(0), exprs(1)))
    }
    if (!reg.functionExists(bloomMightContainId)) {
      reg.registerFunction(bloomMightContainId, BloomMightContain.info,
        exprs => BloomMightContain(exprs(0), exprs(1)))
    }
  }

  /** Column-level helpers; require `register` (or the extension) first. */
  def cosineF32(a: Column, b: Column): Column =
    call_function("cosine_f32", a, b)
  def simHash64(toks: Column): Column =
    call_function("simhash64", toks)
  def srpSig(e: Column, masks: Array[Long]): Column =
    call_function("srp_sig", e, org.apache.spark.sql.functions.lit(masks))
  def bloomMightContain(bloomBytes: Array[Byte], key: Column): Column =
    call_function("bloom_might_contain",
      org.apache.spark.sql.functions.lit(bloomBytes), key)
}

/** `spark.sql.extensions`-injectable variant. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((GraftFunctions.cosineF32Id, CosineF32.info,
      exprs => CosineF32(exprs(0), exprs(1))))
    ext.injectFunction((GraftFunctions.simHash64Id, SimHash64.info,
      exprs => SimHash64(exprs(0))))
    ext.injectFunction((GraftFunctions.srpSigId, SrpSig.info,
      exprs => SrpSig(exprs(0), exprs(1))))
    ext.injectFunction((GraftFunctions.bloomMightContainId,
      BloomMightContain.info,
      exprs => BloomMightContain(exprs(0), exprs(1))))
  }
}
