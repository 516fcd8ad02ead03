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
  *    [[graft.ops.Multimodal.sampleFrames]]'s flatMap);
  *  - q51: the REAL audio codec path — encode/decode round-trip
  *    through [[graft.ops.Wav]] with arithmetically-reproducible
  *    features;
  *  - q52: the REAL image codec path — encode/decode round-trip
  *    through [[graft.ops.Ppm]], features reproduced by the oracle's
  *    own modular-arithmetic raster.
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
    // ---- REAL codec round-trip under the oracle gate ------------------
    // Synthesize a PCM-16 WAV per document (header fields and clipped
    // ramp samples derived deterministically from the row), decode with
    // the real chunk-walking parser (graft.ops.Wav — the de-stubbed M2
    // path), and emit features the oracle reproduces arithmetically: a
    // header-math bug in either direction, a sample misparse
    // (endianness, interleave), or a chunk-walk slip all surface as a
    // hash mismatch. peak_amp requires actually decoding the data
    // chunk: samples are min(i, 32767), so peak = min(total-1, 32767).
    "q51_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", length($"text").cast("int").as("n"))
        .as[(Long, Int)]
      val media = docs.map { case (docId, n) =>
        val channels = 1 + (docId % 2).toInt
        val rate = 8000 + 4000 * (docId % 3).toInt
        val samples = Array.tabulate(n * channels)(i => math.min(i, 32767).toShort)
        val bytes = graft.ops.Wav.encodePcm16(samples, channels, rate)
        graft.ops.Multimodal.MediaFile(s"doc_$docId.wav", "wav",
          bytes.length.toLong, bytes)
      }
      graft.ops.Multimodal.decodeWav(media).toDF()
        .select(
          regexp_extract($"filename", "doc_(\\d+)", 1).cast("long").as("doc_id"),
          $"channels".cast("long").as("channels"),
          $"sampleRate".cast("long").as("sample_rate"),
          $"dataBytes".as("data_bytes"),
          $"nFrames".as("n_frames"),
          $"durationMs".as("duration_ms"),
          $"peakAmp".cast("long").as("peak_amp"))
        .orderBy($"doc_id")
    }),

    // ---- REAL image codec round-trip under the oracle gate ------------
    // Synthesize a P6 PPM per document (dimensions/maxval from the row,
    // raster channels by modular arithmetic over the pixel index — SQL-
    // expressible), decode with the real netpbm parser (graft.ops.Ppm),
    // and emit exact integer channel folds: a header-parse bug, an RGB
    // interleave slip, or a short raster read all change the sums. The
    // raster is capped at 768 pixels to bound the oracle's per-pixel
    // UNNEST; the Spark side decodes the real bytes either way.
    "q52_ppm_decode" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select($"doc_id", length($"text").cast("int").as("n"))
        .as[(Long, Int)]
      val media = docs.map { case (docId, n) =>
        val w = (8 + docId % 5).toInt
        val h = math.max(1, math.min(n, 768) / w)
        val m = (199 + (docId % 7) * 8).toInt
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          rgb(3 * i) = ((docId + 3L * i) % (m + 1)).toByte
          rgb(3 * i + 1) = ((docId + 5L * i) % (m + 1)).toByte
          rgb(3 * i + 2) = ((docId + 7L * i) % (m + 1)).toByte
          i += 1
        }
        val bytes = graft.ops.Ppm.encodeP6(w, h, m, rgb)
        graft.ops.Multimodal.MediaFile(s"doc_$docId.ppm", "ppm",
          bytes.length.toLong, bytes)
      }
      graft.ops.Multimodal.decodePpm(media).toDF()
        .select(
          regexp_extract($"filename", "doc_(\\d+)", 1).cast("long").as("doc_id"),
          $"width".cast("long").as("width"),
          $"height".cast("long").as("height"),
          $"maxVal".cast("long").as("max_val"),
          $"nPixels".as("n_pixels"),
          $"sumR".as("sum_r"),
          $"sumG".as("sum_g"),
          $"sumB".as("sum_b"),
          $"maxChannel".cast("long").as("max_channel"))
        .orderBy($"doc_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q51_wav_decode" ->
      """SELECT doc_id,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |  CAST(8000 + 4000 * (doc_id % 3) AS BIGINT) AS sample_rate,
        |  CAST(length(text) * (1 + doc_id % 2) * 2 AS BIGINT) AS data_bytes,
        |  CAST(length(text) AS BIGINT) AS n_frames,
        |  CAST((length(text) * 1000) // (8000 + 4000 * (doc_id % 3)) AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN length(text) * (1 + doc_id % 2) = 0 THEN 0
        |       ELSE least(length(text) * (1 + doc_id % 2) - 1, 32767) END AS BIGINT) AS peak_amp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q52_ppm_decode" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    8 + doc_id % 5 AS w,
        |    greatest(1, least(length(text), 768) // (8 + doc_id % 5)) AS h,
        |    199 + (doc_id % 7) * 8 AS m
        |  FROM documents),
        |p AS (SELECT doc_id, w, h, m, w * h AS npix FROM t)
        |SELECT doc_id,
        |  CAST(w AS BIGINT) AS width,
        |  CAST(h AS BIGINT) AS height,
        |  CAST(m AS BIGINT) AS max_val,
        |  CAST(npix AS BIGINT) AS n_pixels,
        |  CAST(sum((doc_id + 3 * i) % (m + 1)) AS BIGINT) AS sum_r,
        |  CAST(sum((doc_id + 5 * i) % (m + 1)) AS BIGINT) AS sum_g,
        |  CAST(sum((doc_id + 7 * i) % (m + 1)) AS BIGINT) AS sum_b,
        |  CAST(greatest(max((doc_id + 3 * i) % (m + 1)),
        |                max((doc_id + 5 * i) % (m + 1)),
        |                max((doc_id + 7 * i) % (m + 1))) AS BIGINT) AS max_channel
        |FROM p, UNNEST(generate_series(0, npix - 1)) AS u(i)
        |GROUP BY doc_id, w, h, m, npix
        |ORDER BY doc_id""".stripMargin,
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
