package graft.table

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Write-time string-stat truncation (VERDICT r11 #1, Iceberg
  * truncate(16) semantics) + the code-point order unification that
  * makes non-ASCII pruning sound:
  *  - minS/maxS are BOUNDED (≤16 code points) regardless of value
  *    length — a text corpus's stats column no longer bloats every
  *    commit and manifest with document prefixes;
  *  - non-ASCII corpora keep sound pruning (the old harvest dropped
  *    the entry entirely);
  *  - every driver-side comparison routes through cpCompare, whose
  *    order equals UTF8String binary order (what row-time predicate
  *    evaluation uses) — java.lang.String order diverges beyond the
  *    BMP and would prune unsoundly. */
class StringStatsSpec extends SparkSpec {
  import spark.implicits._

  private def cps(s: String): Int = s.codePointCount(0, s.length)

  test("truncateLower / truncateUpper semantics") {
    // short values pass through exactly
    assert(DataSkipping.truncateLower("abc") == "abc")
    assert(DataSkipping.truncateUpper("abc").contains("abc"))
    // long ASCII: prefix lower, bumped-prefix upper
    val long = "a" * 20
    assert(DataSkipping.truncateLower(long) == "a" * 16)
    assert(DataSkipping.truncateUpper(long).contains("a" * 15 + "b"))
    // the bumped upper exceeds EVERY string with the truncated prefix
    assert(DataSkipping.cpCompare(
      DataSkipping.truncateUpper(long).get, "a" * 100) > 0)
    // surrogate gap: U+D7FF bumps to U+E000, never a lone surrogate
    val gap = "x" * 15 + "퟿" + "tail-that-forces-truncation"
    val up = DataSkipping.truncateUpper(gap).get
    assert(up == "x" * 15 + "", s"got ${up.map(_.toInt)}")
    // astral max: U+10FFFF carries the borrow leftward
    val astral = "ab" + new String(Character.toChars(0x10FFFF)) * 15
    assert(cps(astral) == 17)
    assert(DataSkipping.truncateUpper(astral).contains("ac"))
    // nothing to carry into: no finite upper bound
    val allMax = new String(Character.toChars(0x10FFFF)) * 20
    assert(DataSkipping.truncateUpper(allMax).isEmpty)
    // truncation counts code points, not UTF-16 units
    val emoji = "😀" * 20
    assert(cps(DataSkipping.truncateLower(emoji)) == 16)
  }

  test("cpCompare order equals UTF8String binary order (incl. astral)") {
    val samples = Seq("", "a", "ab", "b", "￿", "😀", "a😀", "é",
      "", "퟿", "𤭢", "z￿z", "z😀z", "ascii only",
      new String(Character.toChars(0x10FFFF)))
    for (a <- samples; b <- samples) {
      val cp = Integer.signum(DataSkipping.cpCompare(a, b))
      val u8 = Integer.signum(
        UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      assert(cp == u8, s"'$a' vs '$b': cpCompare $cp != UTF8 $u8")
      // ... and java.lang.String order is NOT that order in general
      // (documented divergence the code must avoid): U+FFFF vs astral
    }
    assert("￿".compareTo("😀") > 0, "UTF-16 order quirk (the trap)")
    assert(DataSkipping.cpCompare("￿", "😀") < 0, "cp order (the truth)")
  }

  test("stat bytes stay bounded on a long-string column; pruning stays exact") {
    val t = IncrementalTable(spark, tmpDir("sstats") + "/t")
    // values 10x longer than the truncation bound, sharing a long
    // common prefix after the discriminating key — the worst shape for
    // full-value stats, the exact shape of a text corpus
    val rows = (0 until 400).map { i =>
      (i.toLong, f"k$i%04d-" + ("lorem ipsum dolor sit amet " * 8))
    }.toDF("id", "s")
    t.append(rows.repartition(8), Nil)
    t.compact(targetFiles = 8, clusterBy = Seq("s"), statsColumns = Seq("s"))
    val stats = t.liveFileStats()
    assert(stats.nonEmpty)
    stats.values.flatMap(_.get("s")).foreach { st =>
      assert(st.isString, st)
      assert(cps(st.minS.get) <= DataSkipping.StatsStringTruncate, st.minS)
      assert(cps(st.maxS.get) <= DataSkipping.StatsStringTruncate, st.maxS)
    }
    // the truncated index still prunes (the discriminating prefix fits
    // inside 16 code points) ...
    val pred = $"s" >= "k0100" && $"s" < "k0200"
    val pruned = t.liveFilesWhere(pred)
    assert(pruned.size < t.liveFiles().size,
      s"no pruning: ${pruned.size} of ${t.liveFiles().size}")
    // ... and the pruned read is exact
    assert(t.readWhere(pred).select($"id").as[Long].collect().sorted.toSeq
      == (100L until 200L).toSeq)
  }

  test("non-ASCII corpus: sound bounds instead of a dropped entry") {
    val t = IncrementalTable(spark, tmpDir("sstats") + "/i18n")
    // multilingual keys (BMP + astral), long enough to truncate
    val rows = (0 until 300).map { i =>
      (i.toLong, f"도큐$i%04d-" + "текст 本文 😀 document body " * 6)
    }.toDF("id", "s")
    t.append(rows.repartition(6), Nil)
    t.compact(targetFiles = 6, clusterBy = Seq("s"), statsColumns = Seq("s"))
    val stats = t.liveFileStats()
    val entries = stats.values.flatMap(_.get("s")).toSeq
    assert(entries.nonEmpty, "non-ASCII bounds must be RECORDED now")
    entries.foreach { st =>
      assert(cps(st.minS.get) <= DataSkipping.StatsStringTruncate)
      assert(cps(st.maxS.get) <= DataSkipping.StatsStringTruncate)
    }
    val pred = $"s" >= "도큐0050" && $"s" < "도큐0150"
    val pruned = t.liveFilesWhere(pred)
    assert(pruned.size < t.liveFiles().size,
      s"non-ASCII range must prune: ${pruned.size} of ${t.liveFiles().size}")
    assert(t.readWhere(pred).select($"id").as[Long].collect().sorted.toSeq
      == (50L until 150L).toSeq)
    // astral-vs-BMP soundness: rows above U+FFFF must never be pruned
    // by a java.lang.String-order comparison against a BMP bound
    val t2 = IncrementalTable(spark, tmpDir("sstats") + "/astral")
    t2.append(Seq((1L, "￿-bmp-top"), (2L, "😀-astral"), (3L, "a-plain"))
      .toDF("id", "s"), Nil)
    t2.compact(targetFiles = 3, clusterBy = Seq("s"), statsColumns = Seq("s"))
    val got = t2.readWhere($"s" >= "￿").select($"id").as[Long]
      .collect().sorted.toSeq
    assert(got == Seq(1L, 2L),
      s"astral row pruned by a UTF-16-order comparison: $got")
  }
}
