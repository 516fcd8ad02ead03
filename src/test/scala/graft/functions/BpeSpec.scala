package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** True BPE encode (graft.functions.Bpe): the column fold — a pure
  * aggregate(merges, replace) over the committed fixture — must be
  * bit-identical to an independent pairwise reference implementation,
  * and the fixture must exercise REAL sub-word segmentation (tokens
  * strictly outnumber pre-tokenizer pieces on every language slice). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("fixture loads in rank order and no pattern contains a separator") {
    assert(Bpe.merges.size == 64)
    Bpe.merges.foreach { case (l, r) =>
      assert(!l.contains(Bpe.Sep) && !l.contains(Bpe.PieceSep))
      assert(!r.contains(Bpe.Sep) && !r.contains(Bpe.PieceSep))
      assert(l.nonEmpty && r.nonEmpty)
    }
  }

  test("column fold equals the pairwise reference on the whole corpus") {
    val got = Tables.documents(spark, dir)
      .select($"doc_id", $"text", Bpe.tokens($"text").as("toks"))
      .as[(Long, String, Seq[String])].collect()
    assert(got.length == 500)
    got.foreach { case (id, text, toks) =>
      val ref = Bpe.encodeDocReference(text)
      assert(toks == ref, s"doc $id: fold ${toks.take(8)} != ref ${ref.take(8)}")
    }
  }

  test("the native bpe_tokens expression is bit-identical to the fold") {
    // three implementations, one answer: the codegen'd expression (what
    // the queries run), the pure-built-in fold (what the DuckDB oracle
    // replays), and the pairwise reference — corpus-wide
    val rows = Tables.documents(spark, dir)
      .select($"doc_id", $"text",
        Bpe.tokensNative($"text").as("nat"),
        Bpe.tokens($"text").as("fold"))
      .as[(Long, String, Seq[String], Seq[String])].collect()
    assert(rows.length == 500)
    rows.foreach { case (id, text, nat, fold) =>
      assert(nat == fold, s"doc $id: native != fold")
      assert(nat == Bpe.encodeDocReference(text), s"doc $id: native != ref")
    }
    // separator-stripping and empty-input parity
    val edge = Seq("", "  ", "ab", "", " the")
    val got = edge.toDF("text")
      .select($"text", Bpe.tokensNative($"text").as("nat"),
        Bpe.tokens($"text").as("fold"))
      .as[(String, Seq[String], Seq[String])].collect()
    got.foreach { case (t, nat, fold) =>
      assert(nat == fold && nat == Bpe.encodeDocReference(t), s"'$t'")
    }
    // SQL door parity (the extension-registered function)
    val viaSql = spark.sql(
      s"SELECT bpe_tokens(' the quick') AS t").as[Seq[String]].head()
    assert(viaSql == Bpe.encodeDocReference(" the quick"))
  }

  test("astral characters split by code point in every implementation") {
    // non-BMP input (emoji, CJK extensions) is admitted by the
    // ' ?[^A-Za-z0-9 ]+' pre-token class; the reference must iterate by
    // CODE POINT like the fold's split(p, "") and the oracle's
    // string_split — a UTF-16 code-unit walk yields lone-surrogate
    // symbols and invalid UTF-8 from the native path (ADVICE r11)
    val astral = Seq("😀", " a😀b", "😀😀",
      "é🎉 mix", "𤭢𤭢ed")
    val got = astral.toDF("text")
      .select($"text", Bpe.tokensNative($"text").as("nat"),
        Bpe.tokens($"text").as("fold"))
      .as[(String, Seq[String], Seq[String])].collect()
    got.foreach { case (t, nat, fold) =>
      assert(nat == fold, s"'$t': native $nat != fold $fold")
      assert(nat == Bpe.encodeDocReference(t), s"'$t': native != ref")
      // no lone surrogates anywhere: every token is well-formed
      nat.foreach { tok =>
        assert(tok.codePoints().toArray.toSeq.map(cp =>
          new String(Character.toChars(cp))).mkString == tok,
          s"'$t': token '$tok' is not code-point-clean")
      }
    }
  }

  test("greedy left-to-right overlap rule matches replace() semantics") {
    // synthetic pieces that stress run-merging: repeated symbols only
    // pair left-to-right (4 of a kind -> 2 merged, never 3), and the
    // column fold must agree with the reference on every one
    val weird = Seq("ssss", " sssss", "erer", " the the", "aaaa bbbb",
      "mererer", "x", "", "  ", "a", " s s s")
    val got = weird.toDF("text")
      .select($"text", Bpe.tokens($"text").as("toks"))
      .as[(String, Seq[String])].collect().toMap
    weird.foreach { w =>
      assert(got(w) == Bpe.encodeDocReference(w), s"'$w': ${got(w)}")
    }
    // control separators in the input are stripped, never token breaks
    val adv = Seq("ab", "a\u001eb").toDF("text")
      .select(Bpe.tokens($"text")).as[Seq[String]].collect()
    assert(adv.forall(_ == Bpe.encodeDocReference("ab")))
  }

  test("token budgets drift from piece budgets on every language slice") {
    val rows = Tables.documents(spark, dir)
      .select($"lang",
        size(regexp_extract_all($"text", lit(TextOps.bpePretokenRe), lit(0)))
          .cast("long").as("n_pieces"),
        size(Bpe.tokens($"text")).cast("long").as("n_tokens"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n"),
        avg($"n_tokens".cast("double") / $"n_pieces").as("ratio"),
        min($"n_tokens" - $"n_pieces").as("min_gap"))
      .as[(String, Long, Double, Long)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { case (lang, n, ratio, minGap) =>
      assert(n > 0)
      // with 64 merges words split into 2-4 tokens: the pre-tokenizer
      // piece count UNDERSTATES the true token budget by >1.5x on every
      // slice, and no document in the corpus is fully merged
      assert(ratio > 1.5 && ratio < 4.0, s"$lang ratio $ratio")
      assert(minGap > 0, s"$lang min gap $minGap")
    }
  }
}
