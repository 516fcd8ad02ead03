package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations whose key distribution has
  * hot values (the `word_length`-style partition skew called out in
  * SURVEY.md §7.5; at 100 TB a single hot key strands one reducer with
  * the whole shuffle).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * default on) already splits oversized sort-merge partitions at
  * runtime; these helpers cover the cases AQE does not — broadcast-less
  * fact-to-dim joins where the dim is replicable, and deterministic
  * pre-salting when the skew is known up front.
  */
object Skew {

  /** Salted equi-join of a skewed `fact` against a small-ish `dim`:
    * fact rows get a deterministic salt in [0, salts) (hash of the whole
    * row — even rows identical on the join key spread), the dim is
    * replicated `salts`× with every salt value, and the join keys on
    * (key, salt) so a hot key's rows land on `salts` reducers instead
    * of one.
    *
    * Dim replication costs |dim|×salts rows — that is the knob: use for
    * dims too large to broadcast outright but far smaller than the
    * fact. Result equals `fact.join(dim, keys)` exactly (inner join).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, keys :+ "_salt").drop("_salt")
  }

  /** Two-stage salted aggregation: count and algebraic sums per key via
    * a (key, salt) pre-aggregation. Spark's map-side partial
    * aggregation usually makes this unnecessary for groupBy — the
    * helper exists for high-cardinality-accumulator aggregations
    * (collect_set-like) where partials are large, and as the documented
    * pattern. `sums` maps output name -> column to sum. */
  def saltedSums(df: DataFrame, keys: Seq[String], salts: Int,
      sums: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val partials = sums.map { case (n, c) => sum(c).as(n) }.toSeq :+
      count(lit(1)).as("_cnt")
    val stage1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val finals = sums.keys.map(n => sum(col(n)).as(n)).toSeq :+
      sum(col("_cnt")).as("n_rows")
    stage1.groupBy(keys.map(col): _*).agg(finals.head, finals.tail: _*)
  }
}
