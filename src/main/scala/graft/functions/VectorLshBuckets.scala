package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native multi-table sign-LSH bucketing: `vec_lsh_buckets(v:
  * array<float>, planes: array<array<float>>, nPlanes: int) ->
  * array<int>` — projects `v` onto the concatenated plane bank and
  * packs the projection signs into one bucket id per group of
  * `nPlanes` planes (bit i of bucket l = sign of plane `l*nPlanes+i`).
  *
  * Why one expression instead of `vec_mat_dot` + 32 `element_at` sign
  * terms: the composed form fused into a Project→Project→Generate
  * whole-stage whose generated code ran ~1000× slower than
  * interpreted eval (5 ms/row for a 2k-flop computation — a measured
  * codegen pathology in the fused Generate stage). A single native
  * expression keeps the corpus scan at Scan→Project(1 expr)→Generate,
  * the shape that measured fast, and is the plan you want at any
  * table count. Same float→double accumulation and `> 0` sign rule as
  * the composed form, so bucketing is bit-identical. */
case class VectorLshBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _), IntegerType) =>
        if (third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure("vec_lsh_buckets nPlanes must be a literal")
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_lsh_buckets requires (array<float>, array<array<float>>, int), got ($a, $b, $c)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "vec_lsh_buckets"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    val nPlanes = c.asInstanceOf[Int]
    val nTables = m.numElements() / nPlanes
    val out = new Array[Int](nTables)
    var p = 0
    while (p < nTables * nPlanes) {
      val row = m.getArray(p)
      val n = math.min(v.numElements(), row.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += v.getFloat(i).toDouble * row.getFloat(i).toDouble
        i += 1
      }
      if (acc > 0) out(p / nPlanes) |= 1 << (p % nPlanes)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val nTables = ctx.freshName("nTables")
      val p = ctx.freshName("p")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val out = ctx.freshName("out")
      val arrCls = classOf[ArrayData].getName
      val genCls = classOf[GenericArrayData].getName
      s"""
         |int $nTables = $b.numElements() / $c;
         |int[] $out = new int[$nTables];
         |for (int $p = 0; $p < $nTables * $c; $p++) {
         |  $arrCls $row = $b.getArray($p);
         |  int $n = java.lang.Math.min($a.numElements(), $row.numElements());
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $row.getFloat($i);
         |  }
         |  if ($acc > 0) $out[$p / $c] |= 1 << ($p % $c);
         |}
         |${ev.value} = new $genCls($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): VectorLshBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}
