package graft.expressions

import graft.core.Sensision
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's Warp-flavored URL
  * encoding (Go url.QueryEscape + '+'→"%20", core/warp.go:434-441) — a
  * codegen'd `UnaryExpression` instead of a Scala UDF so it stays inside
  * whole-stage codegen with no serialization boundary (SURVEY.md §4.3).
  */
case class UrlEncodeWarp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"url_encode_warp requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StringType
  override def prettyName: String = "url_encode_warp"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Sensision.urlEncodeWarp(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.Sensision.urlEncodeWarp($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UrlEncodeWarp =
    copy(child = newChild)
}

object UrlEncodeWarp {
  val fnName = "url_encode_warp"
  val info = new ExpressionInfo(classOf[UrlEncodeWarp].getName, fnName)
  val builder: Seq[Expression] => Expression = exprs => UrlEncodeWarp(exprs.head)

  /** Imperative registration on an existing session (the driver creates
    * sessions without extensions configured).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      fnName, builder, "built-in")
}

/** `spark.sql.extensions=graft.expressions.GraftExtensions` — the
  * config-driven injection path for sessions we own: the native encoder
  * function plus the opt-in global-window scale guard
  * ([[graft.plans.GlobalWindowGuard]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(UrlEncodeWarp.fnName),
      UrlEncodeWarp.info, UrlEncodeWarp.builder))
    ext.injectFunction((FunctionIdentifier(DotProductDouble.fnName),
      DotProductDouble.info, DotProductDouble.builder))
    ext.injectFunction((FunctionIdentifier(NfcNormalize.fnName),
      NfcNormalize.info, NfcNormalize.builder))
    ext.injectFunction((FunctionIdentifier(Md5Hash60.fnName),
      Md5Hash60.info, Md5Hash60.builder))
    ext.injectFunction((FunctionIdentifier(ImageHeaderDecode.fnName),
      ImageHeaderDecode.info, ImageHeaderDecode.builder))
    ext.injectFunction((FunctionIdentifier(AudioHeaderDecode.fnName),
      AudioHeaderDecode.info, AudioHeaderDecode.builder))
    ext.injectFunction((FunctionIdentifier(ImageAHash.fnName),
      ImageAHash.info, ImageAHash.builder))
    ext.injectFunction((FunctionIdentifier(DotProductLong.fnName),
      DotProductLong.info, DotProductLong.builder))
    ext.injectFunction((FunctionIdentifier(AudioFingerprint.fnName),
      AudioFingerprint.info, AudioFingerprint.builder))
    ext.injectFunction((FunctionIdentifier(VideoHeaderDecode.fnName),
      VideoHeaderDecode.info, VideoHeaderDecode.builder))
    ext.injectPostHocResolutionRule(graft.plans.GlobalWindowGuard.apply)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // row_number()<=k filters route to the bounded TopKPerGroup operator
    // (default on; kill switch spark.graft.rewrite.topK=false)
    ext.injectOptimizerRule(graft.plans.TopKRewrite.apply)
  }
}
