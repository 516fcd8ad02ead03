package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: opaque binary payloads with typed
  * metadata. The live ingestion path (`binaryFile` source → commit-log
  * table, deterministic stub decode, typed frame sampling) is in
  * [[graft.ops.Multimodal]] and covered by ScalaTest; these queries pin
  * the engine-neutral byte-level semantics through the oracle gate by
  * treating each document's UTF-8 payload as its binary content:
  *
  *  - q32: metadata extraction (size, checksum, magic byte);
  *  - q45: fixed-stride frame sampling — a 64-unit window every 128
  *    units, md5-fingerprinted per frame. One Generate per payload, no
  *    shuffle except the presentation sort (the same fan-out shape as
  *    [[graft.ops.Multimodal.sampleFrames]]'s flatMap).
  */
object QueriesMultimodal {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- binary metadata extraction: size, checksum, magic byte -------
    "q32_binary_meta" -> ((s, dir) => {
      import s.implicits._
      val payload = $"text".cast("binary")
      Tables.documents(s, dir)
        .select(
          $"doc_id",
          octet_length(payload).cast("long").as("n_bytes"),
          md5(payload).as("checksum"),
          ascii(substring($"text", 1, 1)).cast("long").as("first_byte"))
        .orderBy($"doc_id")
    }),

    // ---- fixed-stride frame sampling over the payload -----------------
    "q45_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val frameLen = 64L
      val stride = 128L
      Tables.documents(s, dir)
        .withColumn("n", length($"text").cast("long"))
        .filter($"n" > 0)
        .select($"doc_id", $"n",
          posexplode(transform(
            sequence(lit(0), ($"n" - 1).cast("int"), lit(stride.toInt)),
            off => md5($"text".substr(off + 1, lit(frameLen.toInt)).cast("binary")))))
        .select($"doc_id",
          $"pos".cast("long").as("frame_idx"),
          $"col".as("frame_md5"),
          least(lit(frameLen), $"n" - lit(stride) * $"pos").as("frame_bytes"))
        .orderBy($"doc_id", $"frame_idx")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q32_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q45_frame_sample" ->
      """WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents)
        |SELECT doc_id, CAST(off // 128 AS BIGINT) AS frame_idx,
        |  md5(substring(text, off+1, 64)) AS frame_md5,
        |  least(64, n - off) AS frame_bytes
        |FROM t, UNNEST(generate_series(0, n-1, 128)) AS u(off)
        |WHERE n > 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
