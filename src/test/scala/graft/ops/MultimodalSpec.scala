package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.table.IncrementalTable

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixtures(dir: String): Map[String, Array[Byte]] = {
    val rnd = new scala.util.Random(7)
    val files = Map(
      "cat.png" -> rnd.nextBytes(4096),
      "dog.png" -> rnd.nextBytes(1024),
      "talk.wav" -> rnd.nextBytes(8192),
      "clip.mp4" -> rnd.nextBytes(2048),
      "notes.txt" -> "not media".getBytes("UTF-8"))
    Files.createDirectories(Paths.get(dir))
    files.foreach { case (n, b) => Files.write(Paths.get(dir, n), b) }
    files
  }

  test("binaryFile ingest -> stub decode -> feature table commit") {
    val root = tmpDir("mm")
    val fixtures = writeFixtures(s"$root/media")

    // glob keeps non-media out at the scan (pushed filter, not a stage)
    val media = Multimodal.ingestDir(spark, s"$root/media", glob = "*.{png,wav,mp4}")
    val byName = media.collect().map(f => f.filename -> f).toMap
    assert(byName.keySet == fixtures.keySet - "notes.txt")
    assert(byName("cat.png").nBytes == 4096 && byName("cat.png").mediaType == "png")
    assert(byName("talk.wav").content.sameElements(fixtures("talk.wav")))

    val feats = Multimodal.extractFeatures(media)
    val f = feats.collect().map(x => x.filename -> x).toMap
    // deterministic stub: same bytes -> same features, histogram covers
    // every byte exactly once
    assert(f("cat.png").byteHistogram.sum == 4096)
    assert(f("clip.mp4").byteHistogram.sum == 2048)
    assert(f("cat.png").width >= 16 && f("cat.png").nFrames >= 1)
    val again = Multimodal.extractFeatures(media).collect()
      .map(x => x.filename -> x).toMap
    assert(f("dog.png").width == again("dog.png").width)
    assert(f("dog.png").byteHistogram.sameElements(again("dog.png").byteHistogram))
    assert(f("talk.wav").sampleBytes.length == 32)
    assert(f("talk.wav").sampleBytes(1) == fixtures("talk.wav")(64))

    // features commit without the payload; partition pruning by type
    val table = IncrementalTable(spark, s"$root/tables/media_features/v1")
    Multimodal.commitFeatures(table, feats)
    val back = table.read()
    assert(back.count() == 4)
    assert(!back.columns.contains("content"))
    assert(table.read(Map("media_type" -> "png")).count() == 2)
  }

  test("frame sampling: deterministic fan-out, slices match the payload") {
    val root = tmpDir("mm")
    val fixtures = writeFixtures(s"$root/media")
    val media = Multimodal.ingestDir(spark, s"$root/media", glob = "*.{png,wav,mp4}")

    val frames = Multimodal.sampleFrames(media, every = 8, frameSize = 64).collect()
    val again = Multimodal.sampleFrames(media, every = 8, frameSize = 64).collect()
    assert(frames.map(f => (f.filename, f.frameIdx)).sorted.toSeq ==
      again.map(f => (f.filename, f.frameIdx)).sorted.toSeq)

    // fan-out count: ceil(nFrames/every) per file, frameIdx stepped by `every`
    val feats = Multimodal.extractFeatures(media).collect().map(x => x.filename -> x).toMap
    frames.groupBy(_.filename).foreach { case (name, fs) =>
      val expected = (feats(name).nFrames + 7) / 8
      assert(fs.length == expected, s"$name: ${fs.length} frames vs expected $expected")
      assert(fs.map(_.frameIdx).sorted.toSeq == (0 until feats(name).nFrames by 8).toSeq)
    }

    // each frame's bytes are exactly the payload window at its offset
    frames.foreach { f =>
      val content = fixtures(f.filename)
      val off = f.offset.toInt
      val want = content.slice(off, math.min(content.length, off + 64))
      assert(f.frameBytes.sameElements(want), s"${f.filename}#${f.frameIdx}")
    }
  }
}
