package graft.expr

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns — the
  * hot inner loop of every similarity operator (`llm.Similarity`).
  *
  * The composed-Column form `aggregate(zip_with(a,b,_*_), 0.0, _+_)` is
  * an interpreted higher-order function: Catalyst evaluates the lambda
  * row-at-a-time through reflection and re-materializes the zipped
  * array — measured ~10× slower than straight-line code on 64-dim
  * vectors, and it breaks the enclosing whole-stage-codegen span. This
  * expression emits a plain Java loop via `doGenCode`, so a cosine
  * scoring projection (dot + two norms) stays one fused codegen stage.
  *
  * Null semantics mirror the HOF form exactly: a null element or a
  * length mismatch yields NULL (zip_with pads with null → null product
  * → null sum). The summation order is the same sequential left fold,
  * so results are bit-identical to the HOF form — oracle hashes are
  * unchanged.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes
  with Serializable {

  override def dataType: DataType = DoubleType

  // ImplicitCastInputTypes: array<float> (the embeddings' storage type)
  // coerces to array<double> at analysis instead of failing
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  // nullable even when children aren't: length mismatch / null element
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $sum = 0.0;
         |if (!$bad) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $sum; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Column form of the native expression. */
  def native(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(ArrayDotProduct(expression(a), expression(b)))
  }

  /** Register `array_dot` for SQL use in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot",
      exprs => ArrayDotProduct(exprs(0), exprs(1)),
      "built-in")
}
