package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** True byte-pair-encoding application over a COMMITTED merges fixture
  * (`graft/bpe_merges.txt`, trained once by `tools/gen_bpe_merges.py`
  * on the sf0.001 corpus and checked in — nothing trains at runtime).
  *
  * The encode is the classic greedy algorithm: pre-tokenize with
  * [[TextOps.bpePretokenRe]], split each piece into character symbols,
  * then apply the merges IN RANK ORDER, each exhaustively, merging
  * adjacent occurrences left-to-right. Rank-order application is exact:
  * a merge can only create pairs of HIGHER rank (a pair naming symbol
  * `ab` can only have been learned after `ab` itself existed), so when
  * rank k is processed no pair of rank < k can exist.
  *
  * The trick that makes this a pure column fold in BOTH engines: encode
  * the symbol sequence as ONE string — symbols separated by U+001F,
  * pieces by U+001E (merges never cross pieces: no pattern contains
  * U+001E) — and observe that `replace(acc, l+SEP+r, l+r)` IS the
  * greedy left-to-right exhaustive merge of rank (l,r): `replace` scans
  * left to right, substitutes non-overlapping occurrences, and resumes
  * AFTER each substitution, which is exactly BPE's pairing rule (e.g.
  * four `a`s under merge (a,a) become two `aa`s, never three).
  *
  * So the whole encode is `aggregate(merges, syms, replace)` — built-in
  * expressions only, one embarrassingly-parallel projection: no UDF, no
  * shuffle, no state. At 100 TB the cost is O(|merges| × chars) per
  * row on the natural parallel axis, and the DuckDB oracle replays the
  * IDENTICAL fold (`list_reduce` + `replace`) generated from the same
  * fixture lines, so the comparison is bit-exact, not approximate.
  */
object Bpe {
  /** Symbol separator (within a piece). Never appears in a merge's
    * left/right (symbols are concatenations of text characters). */
  val Sep = "\u001f"
  /** Piece separator. Appears in NO merge pattern, so merges can never
    * apply across a pre-tokenizer boundary. */
  val PieceSep = "\u001e"

  /** The committed merges, in rank order. */
  val merges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.txt")
    require(in != null, "missing resource graft/bpe_merges.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { l =>
      val Array(a, b) = l.split("\t", 2)
      (a, b)
    }.toVector
    finally in.close()
  }

  /** Merge patterns as they appear in the encoded string: `l SEP r`. */
  val mergePatterns: Seq[String] = merges.map { case (l, r) => l + Sep + r }

  /** Token-boundary split regex (both separators). */
  val boundaryRe = "[\u001e\u001f]"

  /** The encoded symbol string for `text`: pre-tokenize, interleave
    * separators, fold the merges. Control separators are stripped from
    * the input first so adversarial text cannot forge a boundary. */
  def encodedString(text: Column): Column = {
    val clean = translate(text, Sep + PieceSep, "")
    val pieces = regexp_extract_all(clean, lit(TextOps.bpePretokenRe), lit(0))
    val symed = transform(pieces, p => array_join(split(p, ""), Sep))
    val doc0 = array_join(symed, PieceSep)
    val mergesArr = array(mergePatterns.map(lit): _*)
    aggregate(mergesArr, doc0,
      (acc, m) => replace(acc, m, translate(m, Sep, "")))
  }

  /** The BPE token array of `text` (empty for empty/whitespace-free-
    * piece-less text). */
  def tokens(text: Column): Column = {
    val enc = encodedString(text)
    when(length(enc) === 0, array().cast("array<string>"))
      .otherwise(split(enc, boundaryRe))
  }

  // ---- native encode (preference tier (b): the aggregate/replace
  // fold above is semantically exact but interpreted — HOFs never
  // enter whole-stage codegen — and 64 full-string replace passes per
  // row made it the cost center of the new rows (q161 4.3 s / q41
  // 2.3 s at sf0.1). The BpeTokens expression calls this instead: one
  // regex pass + a per-PIECE memo (the corpus vocabulary is tiny, so
  // almost every piece is a cache hit), bit-identical output by the
  // rank-order/min-rank equivalence the spec pins corpus-wide.

  private val pretokenPattern =
    java.util.regex.Pattern.compile(TextOps.bpePretokenRe)
  // bounded per-executor memo: distinct pre-tokenizer pieces are
  // vocabulary-scale, not corpus-scale; stop inserting past the bound
  // (never evict — the hot pieces are the ones already in)
  private val pieceCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      Array[org.apache.spark.unsafe.types.UTF8String]]()
  private val PieceCacheBound = 1 << 16

  /** Runtime entry for the native [[BpeTokens]] expression. */
  def encodeDocFast(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val raw = s.toString
    val text =
      if (raw.indexOf('\u001e') < 0 && raw.indexOf('\u001f') < 0) raw
      else raw.filterNot(c => c == '\u001e' || c == '\u001f')
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.unsafe.types.UTF8String]
    val m = pretokenPattern.matcher(text)
    while (m.find()) {
      val piece = m.group()
      var toks = pieceCache.get(piece)
      if (toks == null) {
        toks = encodeReference(piece).iterator
          .map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray
        if (pieceCache.size < PieceCacheBound) pieceCache.put(piece, toks)
      }
      var i = 0
      while (i < toks.length) { out += toks(i); i += 1 }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray[Any])
  }

  /** The BPE token array as a Column, via the native codegen'd
    * expression — what the queries use; [[tokens]] (the pure-built-in
    * fold) stays as the in-plan cross-check implementation. */
  def tokensNative(text: Column): Column =
    call_function("bpe_tokens", text)

  /** Reference implementation (plain Scala, pairwise arrays — no string
    * trick): the independent cross-check the spec pins the column fold
    * against. Same greedy left-to-right, rank-order-exhaustive rule. */
  def encodeReference(piece: String): Seq[String] = {
    // iterate by CODE POINT, not UTF-16 code unit: the column fold
    // (split(p, "")), the DuckDB oracle (string_split) and the native
    // expression all split by code point, and a lone-surrogate symbol
    // would also make UTF8String emit invalid UTF-8 (ADVICE r11)
    var syms: Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < piece.length) {
        val cp = piece.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b.result()
    }
    merges.foreach { case (l, r) =>
      if (syms.length > 1) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
    }
    syms
  }

  /** Pre-tokenize + reference-encode a whole document (test oracle). */
  def encodeDocReference(text: String): Seq[String] = {
    val clean = text.filterNot(c => c == '\u001e' || c == '\u001f')
    TextOps.bpePretokenRe.r.findAllIn(clean).toSeq.flatMap(encodeReference)
  }

  // ---- DuckDB oracle generation (single source of truth) -------------

  private def sqlQuote(s: String): String =
    "'" + s.replace("'", "''").replace(Sep, "' || chr(31) || '") + "'"

  /** The DuckDB merge-pattern list literal (generated from the SAME
    * fixture the Spark fold uses). */
  def duckMergeList: String = mergePatterns.map(sqlQuote).mkString(", ")

  /** DuckDB expression producing the encoded symbol string of `expr` —
    * the exact `list_reduce`+`replace` mirror of [[encodedString]]. */
  def duckEncodedString(expr: String): String =
    s"""list_reduce(
       |    [array_to_string(
       |       list_transform(
       |         regexp_extract_all(replace(replace($expr, chr(31), ''), chr(30), ''),
       |                            '${TextOps.bpePretokenRe}'),
       |         pc -> array_to_string(string_split(pc, ''), chr(31))),
       |       chr(30))] || [$duckMergeList],
       |    (acc, m) -> replace(acc, m, replace(m, chr(31), '')))""".stripMargin

  /** DuckDB expression for the BPE token LIST of `expr`. */
  def duckTokens(expr: String): String =
    s"""(CASE WHEN length(${duckEncodedString(expr)}) = 0 THEN []
       |  ELSE regexp_split_to_array(${duckEncodedString(expr)}, '[\\x1e\\x1f]')
       |  END)""".stripMargin
}
