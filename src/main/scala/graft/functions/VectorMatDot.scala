package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native matrix-vector dot: `vec_mat_dot(v: array<float>, m:
  * array<array<float>>) -> array<double>`, element i = `dot(v, m[i])`
  * with the same left-to-right double accumulation as [[VectorDot]].
  *
  * Why it exists: scoring one vector against MANY constant vectors
  * (LSH plane banks, IVF codebooks) as N separate `vec_dot` calls
  * inlines N copies of the literal and N loop bodies into the stage —
  * at 32 planes the generated method blew past Janino's limit, whole-
  * stage codegen fell back to interpreted eval, and the corpus scan
  * went from microseconds to ~200µs per row. One `vec_mat_dot` call
  * is a single nested loop over a single 2-D literal: tiny code, full
  * codegen, one pass over the vector per constant row. */
case class VectorMatDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_mat_dot requires (array<float>, array<array<float>>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "vec_mat_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val rows = m.numElements()
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      val row = m.getArray(r)
      val n = math.min(v.numElements(), row.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * row.getFloat(i).toDouble
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val rows = ctx.freshName("rows")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val arrCls = classOf[ArrayData].getName
      val genCls = classOf[GenericArrayData].getName
      s"""
         |int $rows = $b.numElements();
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  $arrCls $row = $b.getArray($r);
         |  int $n = java.lang.Math.min($a.numElements(), $row.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $row.getFloat($i);
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new $genCls($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorMatDot =
    copy(left = newLeft, right = newRight)
}
