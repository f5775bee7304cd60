package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the reference's Kafka+CSV (§2.1
  * superset): JSON-lines and ORC round-trips preserve schema + values, and
  * both formats support the same predicate/column pushdown contract the
  * parquet fixture queries rely on (pruned ReadSchema; ORC carries
  * PushedFilters like parquet — JSON filters evaluate post-parse).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def roundTrip(fmt: String): Unit = {
    val src = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text", $"lang", $"n_chars")
    val dir = graft.TempStores.newStorePath(s"graft_$fmt").toString + "/t"
    src.write.format(fmt).save(dir)
    val back = spark.read.format(fmt)
      .schema(src.schema) // explicit schema: no inference pass at scale
      .load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), s"$fmt schema drift")
    assert(back.except(src).isEmpty && src.except(back).isEmpty,
      s"$fmt round-trip changed values")
  }

  test("JSON-lines round-trip preserves schema and values") { roundTrip("json") }
  test("ORC round-trip preserves schema and values") { roundTrip("orc") }

  test("XML round-trip preserves schema and values (built-in Spark 4 source)") {
    val src = Tables.documents(spark, sf0001)
      .select($"doc_id", $"text", $"lang", $"n_chars")
    val dir = graft.TempStores.newStorePath("graft_xml").toString + "/t"
    src.write.format("xml").option("rowTag", "doc").save(dir)
    val back = spark.read.format("xml").option("rowTag", "doc")
      .schema(src.schema).load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      src.schema.map(f => (f.name, f.dataType)), "xml schema drift")
    assert(back.except(src).isEmpty && src.except(back).isEmpty,
      "xml round-trip changed values")
  }

  test("binaryFile source ingests raw files as (path, content) rows") {
    // The multimodal ingestion path: image/audio/video files land as
    // binary columns + metadata (ext/Multimodal operates downstream of
    // exactly this shape). Partition-parallel over files, no decode.
    val dir = graft.TempStores.newStorePath("graft_bin")
    val payloads = Map("a.bin" -> Array[Byte](1, 2, 3, 4),
      "b.bin" -> Array[Byte](9, 8))
    payloads.foreach { case (n, bytes) =>
      Files.write(dir.resolve(n), bytes) }
    val df = spark.read.format("binaryFile").load(dir.toString)
    assert(df.columns.toSet == Set("path", "modificationTime", "length", "content"))
    val got = df.select(element_at(split($"path", "/"), -1), $"length", $"content")
      .as[(String, Long, Array[Byte])].collect()
      .map(r => r._1 -> (r._2, r._3.toSeq)).toMap
    assert(got == payloads.map { case (n, b) => n -> (b.length.toLong, b.toSeq) },
      s"binary content mismatch: $got")
  }

  test("text source reads lines; wholetext reads one row per file") {
    val dir = graft.TempStores.newStorePath("graft_text")
    Files.writeString(dir.resolve("d.txt"), "line one\nline two\n")
    val lines = spark.read.text(dir.toString).as[String].collect().toSet
    assert(lines == Set("line one", "line two"))
    val whole = spark.read.option("wholetext", "true").text(dir.toString)
      .as[String].collect()
    assert(whole.toSeq == Seq("line one\nline two\n"))
  }

  test("_metadata hidden columns expose file provenance and row position") {
    // At 100 TB, per-row provenance (which file, which position) is how
    // corrupt-shard triage and exactly-once re-ingestion work; Spark
    // exposes it as the hidden _metadata struct on file sources.
    val dir = graft.TempStores.newStorePath("graft_meta").toString + "/t"
    Tables.documents(spark, sf0001).select($"doc_id")
      .repartition(2).write.parquet(dir)
    val df = spark.read.parquet(dir)
      .select($"doc_id", $"_metadata.file_name".as("f"),
        $"_metadata.row_index".as("ri"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("f").endsWith(".parquet")))
    assert(rows.map(_.getAs[String]("f")).distinct.length == 2,
      "expected rows attributed to 2 distinct files")
    // row_index restarts per file and is dense from 0
    val perFile = rows.groupBy(_.getAs[String]("f"))
    perFile.values.foreach { rs =>
      val ixs = rs.map(_.getAs[Long]("ri")).sorted.toSeq
      assert(ixs == (0L until ixs.length).toSeq,
        "row_index must be dense per file")
    }
  }

  test("parquet mergeSchema reads evolving table generations as one frame") {
    // A long-lived 100 TB table accretes columns; readers must see the
    // union schema with nulls for generations that predate a column.
    val dir = graft.TempStores.newStorePath("graft_evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(s"$dir/gen=1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "name", "score", "gen"))
    val rows = merged.select($"id", $"score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(9.5)),
      "old generation must null-extend the new column")
  }

  test("ORC scan prunes columns and pushes filters like parquet") {
    val src = Tables.documents(spark, sf0001)
    val dir = graft.TempStores.newStorePath("graft_orc_push").toString + "/t"
    src.write.format("orc").save(dir)
    val q = spark.read.format("orc").schema(src.schema).load(dir)
      .where($"doc_id" === 7L).select($"doc_id", $"lang")
    val p = q.queryExecution.executedPlan.toString
    val scan = p.linesIterator.find(_.contains("ReadSchema:"))
      .getOrElse(fail(s"no scan:\n$p"))
    assert(scan.contains("doc_id") && !scan.contains("text"),
      s"unpruned ORC scan: $scan")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]"),
      s"filter not pushed to ORC:\n$p")
    assert(q.count() == 1)
  }

  test("real image decode: binaryFile PNGs → dimensions + pixel checksum, partition-parallel") {
    // The REAL codec path (javax.imageio — JDK-public): deterministic
    // synthetic PNGs on disk, ingested via binaryFile, decoded inside
    // mapPartitions across >1 partition. PNG is lossless, so the decoded
    // raster must reproduce the generator's pixels exactly — asserted via
    // the same rolling checksum computed driver-side over the source
    // pattern. A garbage payload must degrade to ok=false, not throw.
    import java.awt.image.BufferedImage
    val dir = graft.TempStores.newStorePath("graft_png")
    def pixel(id: Int, x: Int, y: Int): Int =
      (((x * 31 + y * 17 + id * 101) % 255) << 16) |
        (((x * 7 + id) % 255) << 8) | ((y * 13 + id * 3) % 255)
    val dims = (0 until 24).map { id =>
      val w = 8 + (id % 5) * 3
      val h = 6 + (id % 7) * 2
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(id, x, y))
      javax.imageio.ImageIO.write(img, "png", dir.resolve(f"img_$id%03d.png").toFile)
      id -> (w, h)
    }.toMap
    Files.write(dir.resolve("img_099.png"), Array[Byte](0, 1, 2, 3)) // not a PNG
    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(regexp_extract(input_file_name(), "img_(\\d+)", 1).cast("long").as("doc_id"),
        $"content".as("media"))
      .repartition(5)
    val got = graft.ext.Multimodal.decodeImages(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got.size == 25)
    assert(!got(99L).ok && got(99L).width == -1, "garbage bytes must decode to ok=false")
    def expectedChecksum(id: Int, w: Int, h: Int): Long = {
      var acc = 0L
      for (y <- 0 until h; x <- 0 until w)
        acc = (acc * 31 + (pixel(id, x, y) & 0xffffff)) % 2147483647L
      acc
    }
    dims.foreach { case (id, (w, h)) =>
      val f = got(id.toLong)
      assert(f.ok && f.width == w && f.height == h && f.channels == 3,
        s"img $id decoded as ${f.width}x${f.height}x${f.channels} (want ${w}x$h x3)")
      assert(f.pixel_checksum == expectedChecksum(id, w, h),
        s"img $id pixel checksum ${f.pixel_checksum} != generator pattern")
    }
  }

  test("real audio decode: binaryFile WAVs → format fields + sample checksum, partition-parallel") {
    // The REAL audio codec path (javax.sound.sampled — JDK-public):
    // deterministic synthetic int16-PCM WAVs on disk, ingested via
    // binaryFile, decoded inside mapPartitions across >1 partition. WAV is
    // lossless PCM, so the decoded samples must reproduce the generator's
    // exactly — asserted via the rolling checksum computed driver-side.
    // A garbage payload must degrade to ok=false, not throw.
    import javax.sound.sampled._
    val dir = graft.TempStores.newStorePath("graft_wav")
    def sample(id: Int, i: Int): Short = ((id * 7919 + i * 31) % 65536 - 32768).toShort
    val meta = (0 until 24).map { id =>
      val rate = Seq(8000, 16000, 44100)(id % 3)
      val channels = 1 + id % 2
      val nFrames = 200 + id * 17
      val pcm = new Array[Byte](nFrames * channels * 2)
      for (i <- 0 until nFrames * channels) {
        val s = sample(id, i)
        pcm(2 * i) = (s & 0xff).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE,
        dir.resolve(f"aud_$id%03d.wav").toFile)
      id -> ((rate, channels, nFrames))
    }.toMap
    Files.write(dir.resolve("aud_099.wav"), Array[Byte](9, 9, 9, 9)) // not a WAV
    val media = spark.read.format("binaryFile").load(dir.toString)
      .select(regexp_extract(input_file_name(), "aud_(\\d+)", 1).cast("long").as("doc_id"),
        $"content".as("media"))
      .repartition(5)
    val got = graft.ext.Multimodal.decodeAudio(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got.size == 25)
    assert(!got(99L).ok && got(99L).sample_rate == -1,
      "garbage bytes must decode to ok=false")
    meta.foreach { case (id, (rate, channels, nFrames)) =>
      val f = got(id.toLong)
      assert(f.ok && f.sample_rate == rate && f.channels == channels &&
        f.bits == 16 && f.n_frames == nFrames,
        s"wav $id decoded as ${f.sample_rate}Hz x${f.channels}ch " +
          s"${f.bits}bit ${f.n_frames}fr (want ${rate}Hz x${channels}ch 16bit ${nFrames}fr)")
      var acc = 0L
      for (i <- 0 until nFrames * channels)
        acc = (acc * 31 + (sample(id, i) & 0xffff)) % 2147483647L
      assert(f.sample_checksum == acc,
        s"wav $id sample checksum ${f.sample_checksum} != generator pattern")
    }
  }

  test("real video frames: animated GIFs → per-frame dims + pixel checksums, partition-parallel") {
    // The REAL multi-frame path (javax.imageio GIF reader — JDK-public):
    // deterministic animated GIFs with an explicit 8-color indexed
    // palette (GIF is palette-based; an explicit IndexColorModel makes
    // the round-trip lossless), decoded across >1 partition. Every frame
    // must come back with true dimensions and the generator pattern's
    // exact pixel checksum; garbage bytes degrade to one ok=false row.
    import java.awt.image.{BufferedImage, IndexColorModel}
    import javax.imageio.{ImageIO, IIOImage}
    val palette = Array(0x000000, 0xff0000, 0x00ff00, 0x0000ff,
      0xffff00, 0xff00ff, 0x00ffff, 0xffffff)
    val icm = new IndexColorModel(8, palette.length,
      palette.map(c => ((c >> 16) & 0xff).toByte),
      palette.map(c => ((c >> 8) & 0xff).toByte),
      palette.map(c => (c & 0xff).toByte))
    def colorIx(id: Int, f: Int, x: Int, y: Int): Int =
      (x * 3 + y * 5 + f * 7 + id * 11) % palette.length
    val meta = (0 until 12).map { id =>
      val w = 10 + (id % 3) * 4
      val h = 8 + (id % 4) * 3
      val nFrames = 2 + id % 4
      val buf = new java.io.ByteArrayOutputStream()
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(buf)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
        for (y <- 0 until h; x <- 0 until w)
          img.setRGB(x, y, 0xff000000 | palette(colorIx(id, f, x, y)))
        writer.writeToSequence(new IIOImage(img, null, null), null)
      }
      writer.endWriteSequence(); writer.dispose(); ios.close()
      (id.toLong, buf.toByteArray, w, h, nFrames)
    }
    val corrupt = (99L,
      "GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](30)(0x7f), 0, 0, 0)
    val media = (meta :+ corrupt).map(m => (m._1, m._2))
      .toDF("doc_id", "media").repartition(4)
    val got = graft.ext.Multimodal.decodeVideoFrames(spark, media).collect()
      .groupBy(_.doc_id)
    def expectedChecksum(id: Int, f: Int, w: Int, h: Int): Long = {
      var acc = 0L
      for (y <- 0 until h; x <- 0 until w)
        acc = (acc * 31 + (palette(colorIx(id, f, x, y)) & 0xffffff)) % 2147483647L
      acc
    }
    meta.foreach { case (id, _, w, h, nFrames) =>
      val frames = got(id).sortBy(_.frame_ix)
      assert(frames.length == nFrames && frames.forall(_.ok),
        s"gif $id: ${frames.length} frames (want $nFrames, all ok)")
      frames.zipWithIndex.foreach { case (fr, ix) =>
        assert(fr.frame_ix == ix && fr.width == w && fr.height == h,
          s"gif $id frame $ix decoded as ${fr.width}x${fr.height}")
        assert(fr.pixel_checksum == expectedChecksum(id.toInt, ix, w, h),
          s"gif $id frame $ix checksum ${fr.pixel_checksum} != generator")
      }
    }
    val bad = got(99L)
    assert(bad.length == 1 && !bad(0).ok && bad(0).frame_ix == -1,
      "corrupt GIF must degrade to one ok=false row")
    // stride mirrors keyframe sampling: only every 2nd frame decodes
    val strided = graft.ext.Multimodal.decodeVideoFrames(spark, media, stride = 2)
      .collect().filter(f => f.doc_id == meta.last._1 && f.ok)
    assert(strided.map(_.frame_ix).sorted.toSeq ==
      (0 until meta.last._5 by 2).toSeq)
  }

  test("malformed real containers degrade to rows, never task failures") {
    // The codec contract is 'corrupt media must not kill a 100 TB job' —
    // and javax.imageio / javax.sound readers throw RUNTIME exceptions
    // (IllegalArgument, CMM, NegativeArraySize, AIOOBE), not only
    // IOException, on adversarial bytes. Feed every decode path payloads
    // that get PAST format sniffing (valid magic, broken body): the
    // operator must return one row per payload (ok=false for undecodable
    // ones), not propagate.
    import java.awt.image.BufferedImage
    val img = new BufferedImage(40, 30, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) img.setRGB(x, y, x * 7 + y)
    val pngBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngBuf)
    val png = pngBuf.toByteArray
    val payloads = Seq(
      1L -> png.take(png.length / 3),                      // truncated mid-IDAT
      2L -> (png.take(24) ++ Array.fill[Byte](64)(0x41)),  // PNG magic + garbage chunks
      3L -> ("BM".getBytes("US-ASCII") ++ Array.fill[Byte](60)(0xff.toByte)),
      4L -> ("GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](40)(0xff.toByte)),
      5L -> ("RIFF$   WAVE".getBytes("US-ASCII") ++ Array.fill[Byte](50)(0xee.toByte)),
      6L -> Array.emptyByteArray)
    val media = payloads.toDF("doc_id", "media").repartition(3)
    val imgs = graft.ext.Multimodal.decodeImages(spark, media).collect()
    assert(imgs.length == payloads.length, "decodeImages must emit one row per payload")
    assert(imgs.forall(f => f.ok || f.width == -1))
    val thumbs = graft.ext.Multimodal.resizeImages(spark, media, 8, 8).collect()
    assert(thumbs.length == payloads.length)
    val auds = graft.ext.Multimodal.decodeAudio(spark, media).collect()
    assert(auds.length == payloads.length && auds.forall(!_.ok),
      "none of the adversarial payloads is valid PCM audio")
    // flatMap path: undecodable payloads yield zero windows, no failure
    graft.ext.Multimodal.audioPcmWindows(spark, media).collect()
  }

  test("real audio windows: Σ s² over decoded PCM matches a driver-side fold") {
    import javax.sound.sampled._
    def sample(i: Int): Short = ((i * 2654435761L) % 65536 - 32768).toShort
    val nFrames = 1000
    val pcm = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = sample(i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(16000f, 16, 1, true, false)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, buf)
    val media = Seq((1L, buf.toByteArray), (2L, Array[Byte](3, 1, 4)))
      .toDF("doc_id", "media")
    val got = graft.ext.Multimodal.audioPcmWindows(spark, media, win = 256, hop = 128)
      .collect()
    assert(got.forall(_.doc_id == 1L), "unparseable payload must yield zero rows")
    val expectWins = (nFrames - 256 + 127) / 128 + 1
    assert(got.length == expectWins, s"got ${got.length} windows, want $expectWins")
    got.foreach { w =>
      val start = w.win_ix * 128
      val end = math.min(start + 256, nFrames)
      val expect = (start until end).map(i => sample(i).toLong * sample(i)).sum
      assert(w.energy == expect && w.n_samples == end - start,
        s"window ${w.win_ix}: energy ${w.energy} != $expect")
    }
  }

  test("real image resize: Graphics2D rescale re-encodes valid PNG thumbnails") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, (x * 16 + y) << 8)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val media = Seq((1L, buf.toByteArray), (2L, Array[Byte](7, 7)))
      .toDF("doc_id", "media")
    val thumbs = graft.ext.Multimodal.resizeImages(spark, media, 4, 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(thumbs(1L)))
    assert(back.getWidth == 4 && back.getHeight == 3,
      s"thumbnail decoded as ${back.getWidth}x${back.getHeight}")
    assert(thumbs(2L).isEmpty, "non-image payload must yield an empty thumb")
  }

  test("audio fingerprint: volume-scaled copies match exactly, different content differs") {
    import javax.sound.sampled._
    // per-window amplitude pattern -> strongly ordered window energies
    def wav(amps: Seq[Int]): Array[Byte] = {
      val winSamples = 256
      val pcm = new Array[Byte](amps.length * winSamples * 2)
      for (k <- amps.indices; i <- 0 until winSamples) {
        val s = (amps(k) * (((k * winSamples + i) * 37) % 7 - 3)).toShort
        val ix = k * winSamples + i
        pcm(2 * ix) = (s & 0xff).toByte
        pcm(2 * ix + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new AudioFormat(8000f, 16, 1, true, false)
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm),
        fmt, (amps.length * winSamples).toLong)
      val buf = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, buf)
      buf.toByteArray
    }
    val pattern = Seq(1, 4, 2, 8, 3, 9, 1, 6, 2, 7)
    val media = Seq(
      1L -> wav(pattern.map(_ * 100)),
      2L -> wav(pattern.map(_ * 550)),          // volume-scaled copy
      3L -> wav(pattern.reverse.map(_ * 100)),  // different content
      4L -> Array[Byte](1, 2, 3))               // garbage
      .toDF("doc_id", "media").repartition(3)
    // hop=win: non-overlapping windows align with the amplitude blocks
    val fp = graft.ext.Multimodal.audioFingerprint(spark, media, win = 256, hop = 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fp.keySet == Set(1L, 2L, 3L), "garbage clip yields no windows")
    assert(fp(1L)._2 == fp(2L)._2, "volume scaling must not change the fingerprint")
    assert(fp(1L)._2 != fp(3L)._2, "reordered content must change the fingerprint")
    assert(fp(1L)._1 == pattern.length)
  }

  test("perceptual image near-dup: aHash pairs re-encoded and noisy copies, separates distinct content") {
    import java.awt.image.BufferedImage
    // 64x64 checkerboard of 8x8 blocks with STRONG contrast (noise
    // cannot flip a block's relation to the global mean)
    def checker(invert: Boolean, noise: Int): BufferedImage = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val dark = ((x / 8 + y / 8) % 2 == 0) ^ invert
        val base = if (dark) 30 else 225
        val v = (base + ((x * 7 + y * 13) % (2 * noise + 1)) - noise)
          .max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def enc(img: BufferedImage, fmt: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, buf)
      buf.toByteArray
    }
    val tiny = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    val media = Seq(
      1L -> enc(checker(invert = false, noise = 0), "png"),
      2L -> enc(checker(invert = false, noise = 0), "bmp"),  // re-encoded copy
      3L -> enc(checker(invert = false, noise = 3), "png"),  // noisy copy
      4L -> enc(checker(invert = true, noise = 0), "png"),   // inverted content
      5L -> enc(tiny, "png"),                                // below 8x8
      6L -> Array[Byte](1, 2, 3))                            // garbage
      .toDF("doc_id", "media").repartition(3)

    val hashes = graft.ext.Multimodal.imageAHash(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    assert(hashes(1L).ok && hashes(2L).ok && hashes(3L).ok && hashes(4L).ok)
    assert(!hashes(5L).ok && !hashes(6L).ok)
    assert(hashes(1L).ahash == hashes(2L).ahash,
      "container re-encode of identical pixels must hash identically")
    assert(java.lang.Long.bitCount(hashes(1L).ahash ^ hashes(4L).ahash) > 30,
      "inverted content must be far in hamming space")

    val pairs = graft.ext.Multimodal.imageNearDupPairs(spark, media)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"unexpected pairs: $pairs")
    assert(pairs.find(p => (p._1, p._2) == ((1L, 2L))).get._3 == 0L)
  }
}
