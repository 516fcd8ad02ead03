package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.table.IncrementalTable

/** Persisted, incrementally-maintained PQ-ANN index (VERDICT r9 #3 —
  * the scale path for the in-plan q97): the PQ codes ARE a graft
  * table, maintained from the upstream embedding table's commit log by
  * the same [[DerivedStream]] machinery every other derived asset
  * uses, and served at query time without retraining or re-encoding
  * the corpus.
  *
  * At 100 TB this is the difference between an index and a demo: the
  * in-plan path re-derives codebook + codes on every query (memoized
  * per JVM at best), while here
  *
  *  - the CODEBOOK is trained once from the upstream snapshot
  *    (deterministic: stride seeds + decimal-exact-mean refinement,
  *    see [[graft.QueriesSimilarity.pqTrain]]) and committed to the
  *    index table's `pqcb/` meta channel — it rides the commit log,
  *    so every writer and every reader sees the same quantizer;
  *  - the CODES table holds one row per vector: `(vec_id,
  *    codes array<int>)`, 8 small ints per 256-byte embedding — the
  *    ~50× compression that fits the scan side of ANN in cluster RAM;
  *  - MAINTENANCE is the X12 DerivedStream contract: each upstream
  *    append commit encodes exactly the added files (O(new vectors),
  *    pure per-row under the fixed codebook); upstream
  *    replace/compaction recomputes the touched scope; crash replays
  *    are no-ops because the downstream table itself is the
  *    checkpoint (appId+batchId replay guard);
  *  - QUERIES read the index table: broadcast ADC lookup tables
  *    against the stored codes, then exact cosine re-rank of the
  *    bounded top-C candidates against the upstream vectors. Encoding
  *    is deterministic, so the served result is bit-identical to a
  *    full recompute over the same corpus (PqIndexSpec pins this).
  *
  * Codebook stability is the deliberate index contract (same as
  * FAISS/IVF-PQ in production): vectors appended after training are
  * coded under the ORIGINAL quantizer — recall degrades only as the
  * data distribution drifts, and a rebuild is an explicit
  * [[retrain]] + full re-encode, never an implicit per-query one. */
final class PqIndexStream(s: SparkSession, up: IncrementalTable,
    down: IncrementalTable, name: String = "pq",
    // rate control, passed through to the underlying DerivedStream
    maxCommitsPerDrain: Int = Int.MaxValue) {
  import s.implicits._

  private val CbKey = "pqcb/cb"

  /** The persisted codebook: read from the index table's meta channel,
    * or train-once from the current upstream snapshot and commit it.
    * Everything downstream (encode, query) reads THIS — training never
    * happens inside a maintenance drain or a query plan. */
  def codebook(): Seq[(Int, Int, Seq[Double])] =
    down.latestMeta(CbKey) match {
      case Some(ser) if ser.nonEmpty => parseCb(ser)
      case _ =>
        up.refresh()
        val cb = graft.QueriesSimilarity.pqTrain(s, up.read())
        down.commitMeta(Map(CbKey -> renderCb(cb)))
        cb
    }

  /** Drop the persisted codebook and codes, retrain from the current
    * upstream snapshot, and rebuild — the explicit index rebuild for
    * distribution drift. */
  def retrain(): Int = {
    down.commitMeta(Map(CbKey -> ""))
    val cb = codebook()
    // a full replace through the DerivedStream replay would still
    // carry the old per-commit codes; reset the cursor by replacing
    // the whole codes table from the snapshot
    down.replaceWhere(encode(cb)(up.read()), Nil, Map.empty,
      partitionFilter = Map.empty,
      meta = Map(s"src_version/pqidx-$name" -> up.latestVersion.toString))
    1
  }

  // doubles round-trip exactly through java.lang.Double.toString, so
  // the channel value is a faithful serialization of the quantizer
  private def renderCb(cb: Seq[(Int, Int, Seq[Double])]): String =
    cb.sortBy(r => (r._1, r._2)).map { case (sub, cid, v) =>
      s"$sub:$cid:${v.mkString(",")}"
    }.mkString(";")
  private def parseCb(ser: String): Seq[(Int, Int, Seq[Double])] =
    ser.split(";").toSeq.map { row =>
      val Array(sub, cid, v) = row.split(":", 3)
      (sub.toInt, cid.toInt,
        v.split(",").toSeq.filter(_.nonEmpty).map(_.toDouble))
    }

  /** The maintenance transform: encode a batch under the FIXED
    * codebook, packed one row per vector (`codes[sub] = cid`). */
  private def encode(cb: Seq[(Int, Int, Seq[Double])])(df: DataFrame): DataFrame =
    graft.QueriesSimilarity.pqCodes(s, df, cb)
      .groupBy($"vec_id")
      .agg(transform(array_sort(collect_list(struct($"sub", $"cid"))),
        p => p.getField("cid")).as("codes"))

  /** Process every upstream commit the index hasn't incorporated;
    * returns how many were applied (0 = up to date / replay no-op). */
  def drain(): Int = {
    val cb = codebook()
    // keyedBy (X97): encode is per-vector under the fixed codebook, so
    // an upstream dv delete (forget-user over the embedding corpus)
    // deletes exactly those vec_ids' code rows — O(deleted vectors),
    // never a corpus re-encode
    new DerivedStream(up, down, Nil, encode(cb), s"pqidx-$name",
      replayScope = Nil, keyedBy = Seq("vec_id"),
      maxCommitsPerDrain = maxCommitsPerDrain).drain()
  }

  /** Serve `queries` (`vec_id`, `embedding`) from the maintained
    * index: ADC over the codes table + exact re-rank against the
    * upstream vectors. Requires a drained index. */
  def query(queries: DataFrame): DataFrame = {
    val cb = parseCb(down.latestMeta(CbKey).filter(_.nonEmpty).getOrElse(
      throw new IllegalStateException(
        s"pq index '$name' has no codebook — drain() first")))
    val codes = down.read()
      .select($"vec_id", posexplode($"codes"))
      .toDF("vec_id", "sub", "cid")
    graft.QueriesSimilarity.pqQueryCodes(s, queries, up.read(), codes, cb)
  }
}
