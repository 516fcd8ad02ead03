package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Canonical writer identity for a stream's checkpoint directory.
  *
  * The checkpoint IS the stream identity (batchIds are monotone within
  * it), but the raw constructor string is not canonical: `./ckpt`,
  * `ckpt/`, and `/abs/path/ckpt` can all address the same physical
  * checkpoint, and a restart that spells the path differently would
  * look like a NEW writer to the table's (appId, batchId) replay guard
  * — silently bypassing exactly-once. Qualifying through the Hadoop
  * FileSystem resolves scheme, authority, and relative segments to one
  * stable URI. */
private[graft] object CheckpointId {
  def apply(spark: SparkSession, checkpointDir: String): String = {
    val p = new Path(checkpointDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toUri.toString
  }
}
