package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.types.{LongType, StructType}

/** Sequence packing — the training-example assembler: documents are
  * packed whole into fixed-token-capacity sequences (4k/8k context
  * windows), the step after chunking (q43) and sharding (q41) that
  * actually decides which docs share a training example.
  *
  * Algorithm: per-shard SEQUENTIAL GREEDY packing in a caller-chosen
  * deterministic order — a doc that would overflow `capacity` closes
  * the current sequence and opens the next; an oversize doc occupies a
  * sequence of its own (docs are never split here — splitting is
  * chunking's job). Greedy-in-order is the production choice over
  * global first-fit-decreasing because it PRESERVES the caller's order
  * (curriculum, shuffle-seed, or dedup-priority order survives into
  * the pack) and because it is deterministic under any partitioning —
  * the property that makes the pack reproducible across engines and
  * re-runs, and the property the DuckDB oracle can replay exactly
  * (q120).
  *
  * Scale shape: ONE hash shuffle on the shard key, then a
  * partition-local sort and a single sequential pass (`mapPartitions`
  * — genuinely per-partition imperative logic: bin state cannot be
  * expressed as a window function because the running fill RESETS on
  * overflow, which no associative combiner computes). Shards are
  * independent, so 100 TB packs as wide as the shard count; a hash
  * partition may hold several shards — the pass resets its counters on
  * every shard boundary of the (shard, order)-sorted stream. */
object SeqPack {

  /** Adds `seq_no` (0-based per shard) to `df`. `shard`/`order`/`tok`
    * are expressions over `df`'s columns; `tok` must be non-negative. */
  def pack(df: DataFrame, shard: Column, order: Column, tok: Column,
      capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    // the staging columns would silently shadow (then drop) same-named
    // input columns, and an existing seq_no would duplicate in the
    // output schema — refuse loudly instead of corrupting the frame
    val reserved = Seq("_sp_shard", "_sp_ord", "_sp_tok", "seq_no")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"SeqPack.pack input must not contain reserved column(s) ${clash.mkString(", ")}")
    val staged = df
      .withColumn("_sp_shard", shard.cast(LongType))
      .withColumn("_sp_ord", order)
      .withColumn("_sp_tok", tok.cast(LongType))
    val outSchema = new StructType(staged.schema.fields).add("seq_no", LongType,
      nullable = false)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val shardIdx = staged.schema.fieldIndex("_sp_shard")
    val tokIdx = staged.schema.fieldIndex("_sp_tok")
    staged
      .repartition(org.apache.spark.sql.functions.col("_sp_shard"))
      .sortWithinPartitions("_sp_shard", "_sp_ord")
      .mapPartitions { rows =>
        var curShard = Long.MinValue
        var fill = 0L
        var seq = -1L
        var first = true
        rows.map { r =>
          val s = r.getLong(shardIdx)
          val t = r.getLong(tokIdx)
          require(t >= 0, s"negative token count $t")
          if (first || s != curShard) {
            curShard = s; fill = t; seq = 0L; first = false
          } else if (fill + t > capacity) {
            fill = t; seq += 1
          } else fill += t
          Row.fromSeq(r.toSeq :+ seq)
        }
      }
      .drop("_sp_shard", "_sp_ord", "_sp_tok")
  }
}
