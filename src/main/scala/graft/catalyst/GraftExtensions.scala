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
    GraftExtensions.functionDescriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => CompactLatestRewrite)
  }
}

object GraftExtensions {

  private type Descriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def descriptor(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): Descriptor =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  private[catalyst] val functionDescriptors: Seq[Descriptor] = Seq(
    descriptor("seq_id_decode_native", classOf[SeqIdDecodeExpr]) {
      children => SeqIdDecodeExpr(children.head)
    },
    descriptor("bitset_from_ids", classOf[BitsetFromIdsExpr]) {
      children => BitsetFromIdsExpr(children(0), children(1))
    },
    descriptor("bitset_intersect_count", classOf[BitsetIntersectCountExpr]) {
      children => BitsetIntersectCountExpr(children(0), children(1))
    },
    descriptor("sorted_intersect_count", classOf[SortedIntersectCountExpr]) {
      children => SortedIntersectCountExpr(children(0), children(1))
    },
    descriptor("bitset_containment_shared", classOf[BitsetContainmentSharedExpr]) {
      children => BitsetContainmentSharedExpr(children(0), children(1), children(2))
    },
    descriptor("packed_tf_min_overlap", classOf[PackedTfMinOverlapExpr]) {
      children => PackedTfMinOverlapExpr(children(0), children(1))
    },
    descriptor("ngram_shingles", classOf[NgramShinglesExpr]) {
      children => NgramShinglesExpr(children(0), children(1))
    },
    descriptor("bitset_from_tokens", classOf[BitsetFromTokensExpr]) {
      children => BitsetFromTokensExpr(children(0), children(1), children(2))
    },
    descriptor("word_bigrams", classOf[WordBigramsExpr]) {
      children => WordBigramsExpr(children.head)
    },
    descriptor("vec_dot", classOf[VecDotExpr]) {
      children => VecDotExpr(children(0), children(1))
    },
    descriptor("vec_sqdist", classOf[VecSqDistExpr]) {
      children => VecSqDistExpr(children(0), children(1))
    },
    descriptor("vec_sqdist_long", classOf[VecSqDistLongExpr]) {
      children => VecSqDistLongExpr(children(0), children(1))
    }
  )

  /** Idempotently register the native functions on a live session. */
  def install(spark: SparkSession): Unit =
    functionDescriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
