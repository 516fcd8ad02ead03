package graft.ingest

import java.nio.file.{Files, Path, Paths}
import java.time.{LocalDate, ZoneOffset}
import java.util.UUID

/** G1: rate-limited arrival simulator — the reference's dev harness
  * (/root/reference/generate.py:20-34: one random word per file,
  * seq-prefixed uuid filenames, 30-60 s apart, into today's partition).
  *
  * Deterministic given a seed (words and jitter from one PRNG); the
  * interval is configurable so tests can drop files instantly while a
  * live demo reproduces the reference's ~0.03 files/s design point.
  */
final class Generator(
    ingestRoot: String,
    seed: Long = 42L,
    baseIntervalMillis: Long = 30000L,
    jitterMillis: Long = 30000L) {

  private val rnd = new scala.util.Random(seed)
  private var seq = 0
  private val syllables =
    Vector("ta", "ri", "mo", "ze", "ka", "lu", "ne", "po", "sa", "vi")

  private def word(): String =
    (0 until (2 + rnd.nextInt(3))).map(_ => syllables(rnd.nextInt(syllables.size))).mkString

  def today: LocalDate = LocalDate.now(ZoneOffset.UTC)

  /** Drop one file (optionally sleeping the rate-limit interval first);
    * returns its path. Filename = `NNNN-<uuid>.txt` (generate.py:22-23's
    * seq prefix making arrival order explicit). */
  def dropOne(day: LocalDate = today, sleep: Boolean = false): Path = {
    if (sleep && baseIntervalMillis > 0)
      Thread.sleep(baseIntervalMillis +
        (if (jitterMillis > 0) rnd.nextLong(jitterMillis) else 0L))
    val dir = Paths.get(ingestRoot, s"day=$day")
    Files.createDirectories(dir)
    val p = dir.resolve(f"$seq%04d-${new UUID(rnd.nextLong(), rnd.nextLong())}.txt")
    Files.write(p, word().getBytes("UTF-8"))
    seq += 1
    p
  }

  def drop(n: Int, day: LocalDate = today, sleep: Boolean = false): Seq[Path] =
    (0 until n).map(_ => dropOne(day, sleep))
}
