package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: opaque binary payloads with typed
  * metadata. The live ingestion path (`binaryFile` source → commit-log
  * table, deterministic stub decode) is in [[graft.ops.Multimodal]] and
  * covered by ScalaTest; this query pins the engine-neutral byte-level
  * metadata semantics through the oracle gate by treating each
  * document's UTF-8 payload as its binary content.
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
  )

  def oracleSql: Map[String, String] = Map(
    "q32_binary_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS checksum,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
