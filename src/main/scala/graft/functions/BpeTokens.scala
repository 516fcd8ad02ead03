package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native BPE encode: `bpe_tokens(text) -> array<string>` over the
  * committed merges fixture (see [[Bpe]]).
  *
  * Preference tier (b), same rationale as [[VectorDot]]: the pure
  * built-in spelling — `aggregate(merges, syms, replace)` — is
  * semantically exact but interpreted (higher-order functions never
  * enter whole-stage codegen) and re-scans the whole symbol string
  * once per merge rank; this expression generates ONE static call
  * inside WholeStageCodegen to [[Bpe.encodeDocFast]], which
  * pre-tokenizes once and encodes per PIECE through a bounded
  * per-executor memo (piece inventories are vocabulary-scale). Output
  * is bit-identical to the fold — BpeSpec pins native == fold ==
  * pairwise reference corpus-wide — so the DuckDB-oracle contract
  * (which replays the fold) is unchanged. */
case class BpeTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bpe_tokens"

  override protected def nullSafeEval(input: Any): Any =
    Bpe.encodeDocFast(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bpe.encodeDocFast($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}
