package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming as a native Catalyst expression with `doGenCode`, so the
  * stem call is inlined into whole-stage codegen instead of breaking the
  * generated pipeline the way a Scala UDF would (the tokenize→filter→stem
  * chain stays one fused operator). Replaces the reference's per-token
  * `stemmer.stem(...)` calls (DocumentFreq.java:69, IDF.java:92).
  */
case class StemExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.text.PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.PorterStemmer.stem($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): StemExpr =
    copy(child = newChild)
}

object StemExpr {
  /** Expose as a Column function: stem($"token"). */
  def stem(c: Column): Column =
    GraftSqlBridge.column(StemExpr(GraftSqlBridge.expression(c)))
}
