package graft.catalyst

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension installer. Two entry points:
  *
  *  - `spark.sql.extensions=graft.catalyst.GraftExtensions` at session
  *    build time (the standard deployment path), or
  *  - [[GraftExtensions.install]] on a live session (the driver owns
  *    SparkSession construction in this harness, so queries self-install).
  *
  * Currently injects the codegen'd seq-id codec expression
  * (`seq_id_decode_native`) — the native counterpart of the
  * `graft.udf.SeqId` UDF surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.seqIdDecodeDescriptor)
    ext.injectOptimizerRule(_ => CompactLatestRewrite)
  }
}

object GraftExtensions {

  private[catalyst] val seqIdDecodeDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("seq_id_decode_native"),
    new ExpressionInfo(classOf[SeqIdDecodeExpr].getName, "seq_id_decode_native"),
    (children: Seq[Expression]) => SeqIdDecodeExpr(children.head)
  )

  /** Idempotently register the native functions on a live session. */
  def install(spark: SparkSession): Unit = {
    val (ident, info, builder) = seqIdDecodeDescriptor
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
  }
}
