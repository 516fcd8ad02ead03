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

  test("WAV codec: real encode/decode round-trip, chunk skipping, loud failures") {
    // round-trip: header fields and sample-derived peak survive
    val samples = Array.tabulate(480)(i => ((i * 131) % 20000 - 10000).toShort)
    val bytes = Wav.encodePcm16(samples, channels = 2, sampleRate = 16000)
    val m = Wav.decode(bytes)
    assert(m.channels == 2 && m.sampleRate == 16000 && m.bitsPerSample == 16)
    assert(m.dataBytes == 960 && m.nFrames == 240)
    assert(m.durationMs == 240L * 1000 / 16000)
    assert(m.peakAmp == samples.map(s => math.abs(s.toInt)).max)

    // foreign layout: odd-size unknown chunk before fmt — the decoder
    // must honor RIFF's even-offset padding rule to find fmt/data
    val inner = Wav.encodePcm16(Array[Short](1, -5, 3), 1, 8000)
    val fmtAndData = inner.drop(12).filterNot(_ => false) // chunks after RIFF hdr
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 9, 9, 9, 0 /*pad*/ )
    val bb = java.nio.ByteBuffer.allocate(12 + junk.length + fmtAndData.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + junk.length + fmtAndData.length)
      .put("WAVE".getBytes("US-ASCII")).put(junk).put(fmtAndData)
    val m2 = Wav.decode(bb.array())
    assert(m2.nFrames == 3 && m2.peakAmp == 5)

    // malformed payloads fail loudly, never emit garbage features
    intercept[IllegalArgumentException](Wav.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Wav.decode("RIFFxxxxJUNK".getBytes("US-ASCII")))
    val nonPcm = bytes.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](Wav.decode(nonPcm))

    // distributed decode through the MediaFile path (per-partition shape)
    val files = Seq(
      Multimodal.MediaFile("a.wav", "wav", bytes.length.toLong, bytes),
      Multimodal.MediaFile("b.wav", "wav", inner.length.toLong, inner)).toDS()
    val feats = Multimodal.decodeWav(files).collect().map(f => f.filename -> f).toMap
    assert(feats("a.wav").nFrames == 240 && feats("a.wav").channels == 2)
    assert(feats("b.wav").nFrames == 3 && feats("b.wav").sampleRate == 8000)
  }

  test("PPM codec: real encode/decode round-trip, header variants, loud failures") {
    // round-trip: header fields and exact raster folds survive
    val (w, h, m) = (5, 4, 255)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 37) % 256).toByte)
    val bytes = Ppm.encodeP6(w, h, m, rgb)
    val meta = Ppm.decode(bytes)
    assert(meta.width == 5 && meta.height == 4 && meta.maxVal == 255)
    assert(meta.nPixels == 20)
    val chans = rgb.map(_ & 0xff)
    assert(meta.sumR == chans.indices.collect { case i if i % 3 == 0 => chans(i) }.sum)
    assert(meta.sumG == chans.indices.collect { case i if i % 3 == 1 => chans(i) }.sum)
    assert(meta.sumB == chans.indices.collect { case i if i % 3 == 2 => chans(i) }.sum)
    assert(meta.maxChannel == chans.max)

    // foreign-writer header: comments and mixed whitespace between
    // every token, CRLF, multiple comment lines
    val raster = Array.tabulate(6)(i => (10 * (i + 1)).toByte)
    val weird = ("P6 # magic comment\n#another\n\t 2\r\n#c\n 1 \n200\n"
      .getBytes("US-ASCII")) ++ raster
    val wm = Ppm.decode(weird)
    assert(wm.width == 2 && wm.height == 1 && wm.maxVal == 200)
    assert(wm.sumR == 10 + 40 && wm.sumG == 20 + 50 && wm.sumB == 30 + 60)
    assert(wm.maxChannel == 60)

    // malformed payloads fail loudly, never emit garbage features
    intercept[IllegalArgumentException](Ppm.decode("P5\n1 1\n255\n!".getBytes))
    intercept[IllegalArgumentException](Ppm.decode(Ppm.encodeP6(2, 2, 255,
      new Array[Byte](12)).dropRight(1))) // truncated raster
    intercept[IllegalArgumentException](Ppm.decode("P6\n1 1\n70000\n".getBytes
      ++ new Array[Byte](6))) // 2-byte channels unsupported
    intercept[IllegalArgumentException](Ppm.decode("P6\n-1 1\n255\n".getBytes
      ++ new Array[Byte](3))) // negative width is non-numeric per netpbm
    intercept[IllegalArgumentException](Ppm.encodeP6(2, 2, 255, new Array[Byte](3)))

    // distributed decode through the MediaFile path (per-partition shape)
    val files = Seq(
      Multimodal.MediaFile("a.ppm", "ppm", bytes.length.toLong, bytes),
      Multimodal.MediaFile("b.ppm", "ppm", weird.length.toLong, weird)).toDS()
    val feats = Multimodal.decodePpm(files).collect().map(f => f.filename -> f).toMap
    assert(feats("a.ppm").nPixels == 20 && feats("a.ppm").maxVal == 255)
    assert(feats("b.ppm").width == 2 && feats("b.ppm").sumB == 90)
  }

  test("safe decode quarantines malformed payloads instead of failing the job") {
    val good = Ppm.encodeP6(2, 2, 255,
      Array.tabulate(12)(i => ((i * 31) % 256).toByte))
    val truncated = good.dropRight(1) // short raster
    val wrongMagic = "P5\n1 1\n255\n!".getBytes
    val files = Seq(
      Multimodal.MediaFile("ok.ppm", "ppm", good.length.toLong, good),
      Multimodal.MediaFile("cut.ppm", "ppm", truncated.length.toLong, truncated),
      Multimodal.MediaFile("gray.pgm", "ppm", wrongMagic.length.toLong, wrongMagic)).toDS()

    // strict decode kills the job on the first bad payload...
    intercept[org.apache.spark.SparkException](
      Multimodal.decodePpm(files).collect())

    // ...safe decode completes: features for the good file, quarantine
    // rows (filename + reason) for the bad ones, one pass
    val res = Multimodal.decodePpmSafe(files).collect()
      .map(r => r.filename -> r).toMap
    assert(res.size == 3)
    assert(res("ok.ppm").ok && res("ok.ppm").feat.get.nPixels == 4
      && res("ok.ppm").error.isEmpty)
    assert(!res("cut.ppm").ok && res("cut.ppm").feat.isEmpty
      && res("cut.ppm").error.get.contains("raster"))
    assert(!res("gray.pgm").ok && res("gray.pgm").error.get.nonEmpty)
    // good-path features identical to the strict decoder's
    val strict = Multimodal.decodePpm(files.filter(_.filename == "ok.ppm"))
      .collect().head
    assert(res("ok.ppm").feat.get == strict)

    // WAV twin: one malformed header among good files
    val wav = graft.ops.Wav.encodePcm16(Array[Short](3, -2, 7), 1, 8000)
    val badWav = wav.take(10)
    val wfiles = Seq(
      Multimodal.MediaFile("a.wav", "wav", wav.length.toLong, wav),
      Multimodal.MediaFile("b.wav", "wav", badWav.length.toLong, badWav)).toDS()
    val wres = Multimodal.decodeWavSafe(wfiles).collect()
      .map(r => r.filename -> r).toMap
    assert(wres("a.wav").ok && wres("a.wav").feat.get.nFrames == 3)
    assert(!wres("b.wav").ok && wres("b.wav").error.get.nonEmpty)
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
