package graft.expressions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** Whole-stage-codegen glue for single-pass unary expressions whose work
  * lives in `nullSafeEval`: the generated code calls the expression object
  * DIRECTLY with the unboxed child value.
  *
  * `CodegenFallback` would instead materialize the ENTIRE input row
  * (`UnsafeRow` copy of every column in flight) per call and route through
  * `Expression.eval` — per-row row-packing overhead in exactly the hot
  * scans these expressions exist to speed up. With this trait the stage
  * stays one fused loop and only the child column is touched; the heavy
  * lifting (tokenizing, hashing, normalizing) already runs as compiled JVM
  * code either way, so a hand-written `doGenCode` body would add nothing
  * further.
  */
trait NullSafeEvalCodegen extends UnaryExpression {

  /** Public bridge — generated Java (another package) cannot call the
    * protected `nullSafeEval`.
    */
  final def evalChild(v: AnyRef): AnyRef = nullSafeEval(v).asInstanceOf[AnyRef]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftExpr", this,
      classOf[NullSafeEvalCodegen].getName)
    nullSafeCodeGen(ctx, ev, c => {
      // box primitive children explicitly — janino autoboxing is unreliable
      val childJava = CodeGenerator.javaType(child.dataType)
      val childBoxed = CodeGenerator.boxedType(child.dataType)
      val arg = if (childJava == childBoxed) c else s"$childBoxed.valueOf($c)"
      val javaType = CodeGenerator.javaType(dataType)
      val boxed = CodeGenerator.boxedType(dataType)
      val tmp = ctx.freshName("graftEval")
      // nullSafeEval may itself return null for a non-null input; mirror
      // interpreted eval by propagating it to ev.isNull instead of NPEing
      // on the unbox. When nullable=false, ev.isNull is the literal `false`
      // (not assignable) — there the non-null contract genuinely holds.
      val unboxed =
        if (javaType == boxed) s"($boxed) $tmp"
        else s"(($boxed) $tmp).${javaType}Value()"
      if (nullable)
        s"""
           |Object $tmp = $ref.evalChild($arg);
           |if ($tmp == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = $unboxed;
           |}
         """.stripMargin
      else
        s"""
           |Object $tmp = $ref.evalChild($arg);
           |${ev.value} = $unboxed;
         """.stripMargin
    })
  }
}
