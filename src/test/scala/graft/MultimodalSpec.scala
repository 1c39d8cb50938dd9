package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** The multimodal binary-column plumbing (Q34 extension): schema, batched
  * decode (REAL ImageIO codec — dims + bounded luminance histogram, typed
  * quarantine for undecodable bytes), frame sampling.
  */
class MultimodalSpec extends SparkSpec {

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, w, h)
    g.dispose()
    pngBytes(img)
  }

  test("real codec: dims + luminance histogram off real PNG bytes") {
    import spark.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "image/png", 0L, solidPng(20, 10, 0xFFFFFF)),
      Multimodal.Asset(2L, "image/png", 0L, solidPng(8, 8, 0x000000)),
      Multimodal.Asset(3L, "image/png", 0L, solidPng(3, 3, 0x808080)),
      Multimodal.Asset(4L, "image/corrupt", 0L, Array[Byte](9, 9, 9)))
      .toDS()
    val d = Multimodal.decodeAll(assets).collect()
      .map(r => r.doc_id -> r).toMap
    // true dimensions from the decoder, not header heuristics
    assert(d(1L).width == 20 && d(1L).height == 10)
    assert(d(2L).width == 8 && d(2L).height == 8)
    // solid white -> all mass in the top luminance bin; black -> bin 0;
    // mid-grey 0x80 -> bin 8; every histogram sums to 1
    assert(d(1L).features(15) == 1.0f && d(1L).features.sum == 1.0f)
    assert(d(2L).features(0) == 1.0f)
    assert(d(3L).features(8) == 1.0f)
    // undecodable bytes quarantine typed instead of throwing
    assert(d(4L).width == -1 && d(4L).height == -1 &&
      d(4L).features.isEmpty)
  }

  test("huge image: feature pass stays bounded (sampled grid)") {
    import spark.implicits._
    // 1024x512 is > 64x64 samples — the histogram must come from the
    // bounded grid, still normalized
    val assets = Seq(Multimodal.Asset(7L, "image/png", 0L,
      solidPng(1024, 512, 0xFFFFFF))).toDS()
    val d = Multimodal.decodeAll(assets).head()
    assert(d.width == 1024 && d.height == 512)
    assert(math.abs(d.features.sum - 1.0f) < 1e-5)
    assert(d.features(15) > 0.99f)
  }

  test("payload attach produces binary column + prunable metadata") {
    val assets = Multimodal.withPayload(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val f = assets.schema("payload")
    assert(f.dataType.typeName == "binary")
    // metadata filter must not require reading payload bytes
    val n = assets.filter(col("n_bytes") > 100).select("doc_id").count()
    assert(n > 0)
  }

  test("batched decode preserves row count; non-images all quarantine") {
    import spark.implicits._
    // text bytes are not images: every row must surface as the typed
    // quarantine row — never an exception, never a dropped row
    val assets = Multimodal.withPayload(
      spark.read.parquet(s"$sfDir/documents.parquet")).as[Multimodal.Asset]
    val decoded = Multimodal.decodeAll(assets).cache()
    assert(decoded.count() == assets.count())
    assert(decoded.filter(d => d.width != -1 || d.features.nonEmpty)
      .count() == 0L)
    decoded.unpersist()
  }

  test("frame sampling of an empty payload yields an empty frame array") {
    import spark.implicits._
    val assets = Seq((99L, "media/none", 0L, Array.empty[Byte]))
      .toDF("doc_id", "mime", "n_bytes", "payload")
    val row = Multimodal.sampleFrames(assets).select("frames").head()
    assert(row.getSeq[Array[Byte]](0).isEmpty)
  }

  test("frame sampling emits bounded fixed-size binary frames") {
    val assets = Multimodal.withPayload(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val framed = Multimodal.sampleFrames(assets, frameBytes = 8, maxFrames = 4)
    val row = framed.filter(col("doc_id") === 0).select("frames").head()
    val frames = row.getSeq[Array[Byte]](0)
    assert(frames.nonEmpty && frames.size <= 5)
    assert(frames.forall(_.length <= 8))
  }

  test("binaryFile ingest: bytes round-trip, glob prunes before read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    val img = Array[Byte](-1, -40, -1, -32, 0, 16) // JPEG-ish magic
    java.nio.file.Files.write(dir.resolve("a.jpg"), img)
    java.nio.file.Files.write(dir.resolve("b.jpg"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("notes.txt"),
      "not media".getBytes("UTF-8"))
    val rows = Multimodal.readMediaDir(spark, dir.toString, glob = "*.jpg")
      .collect().map(r => (new java.io.File(r.getString(0)).getName,
        r.getLong(1), r.getAs[Array[Byte]](2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("a.jpg", "b.jpg"),
      "glob must exclude the txt file")
    assert(rows.head._2 == img.length && rows.head._3.toSeq == img.toSeq,
      "payload bytes must round-trip untouched")
    // the ingested frame feeds the existing decode path unchanged
    import spark.implicits._
    val assets2 = Multimodal.readMediaDir(spark, dir.toString, "*.jpg")
      .select(monotonically_increasing_id().as("doc_id"),
        lit("image/jpeg").as("mime"), col("length").as("n_bytes"),
        col("content").as("payload"))
      .as[Multimodal.Asset]
    assert(Multimodal.decodeAll(assets2).count() == 2)
  }

  test("real audio codec: loudness triple off real WAV bytes; quarantine") {
    import spark.implicits._
    // constant full-amplitude square: rms == peak == amp/32768 EXACTLY,
    // silence 0; a half-silent file splits the ratio exactly in half; a
    // stereo file interleaves without skewing any feature
    def wav(sr: Int, ch: Int, frames: Int, sample: Int => Int): Array[Byte] = {
      val data = new Array[Byte](frames * ch * 2)
      (0 until frames).foreach { k =>
        val s = sample(k)
        (0 until ch).foreach { c =>
          val idx = (k * ch + c) * 2
          data(idx) = (s & 0xff).toByte
          data(idx + 1) = ((s >> 8) & 0xff).toByte
        }
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, 16, ch,
        true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), fmt, frames.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val assets = Seq(
      Multimodal.Asset(1L, "audio/wav", 0L,
        wav(8000, 1, 1000, k => if (k % 2 == 0) 8192 else -8192)),
      Multimodal.Asset(2L, "audio/wav", 0L,
        wav(16000, 2, 500, k => if (k < 250) 0 else 4096)),
      Multimodal.Asset(3L, "audio/corrupt", 0L, Array[Byte](1, 2, 3)))
      .toDS()
    val d = Multimodal.decodeAllAudio(assets).collect()
      .map(r => r.doc_id -> r).toMap
    assert(d(1L).sample_rate == 8000 && d(1L).channels == 1 &&
      d(1L).n_frames == 1000L)
    assert(d(1L).rms == (8192.0 / 32768.0).toFloat &&
      d(1L).peak == d(1L).rms && d(1L).silence_ratio == 0f, d(1L))
    assert(d(2L).sample_rate == 16000 && d(2L).channels == 2 &&
      d(2L).n_frames == 500L)
    assert(d(2L).silence_ratio == 0.5f && d(2L).peak ==
      (4096.0 / 32768.0).toFloat, d(2L))
    // rms of half-silent constant amp = amp/sqrt(2)/32768
    assert(math.abs(d(2L).rms -
      (4096.0 / math.sqrt(2.0) / 32768.0)) < 1e-7, d(2L))
    assert(d(3L).sample_rate == -1 && d(3L).n_frames == -1L &&
      d(3L).rms == -1f, d(3L))
  }

  test("audio pipeline: every synthesized WAV decodes to its closed form") {
    val rows = Multimodal.pipelineAudio(spark, sfDir).collect()
      .map(r => r.doc_id -> r).toMap
    assert(rows.size == 14)
    (0 until 12).foreach { i =>
      val r = rows(i.toLong)
      assert(r.sample_rate == 8000 + 1000 * (i % 3), r)
      assert(r.channels == 1 + (i % 2), r)
      assert(r.n_frames == 800L + 50L * i, r)
      assert(r.silence_ratio == 0.5f, r)
      assert(r.peak == (1000.0 * (i + 1) / 32768.0).toFloat, r)
    }
    assert(rows(900L).rms == -1f && rows(901L).rms == -1f)
  }

  test("pngDims reads IHDR width/height off real header bytes; non-PNG null") {
    import spark.implicits._
    def be32(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    def png(w: Int, h: Int): Array[Byte] =
      sig ++ be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0)
    val rows = Seq(
      (1L, png(640, 480)), (2L, png(1, 1)), (3L, png(65535, 2)),
      (4L, Array[Byte](-1, -40, -1)),         // JPEG magic: not a PNG
      (5L, sig.take(8)))                      // signature only, truncated
      .toDF("id", "payload")
      .select(col("id"), Multimodal.pngDims(col("payload")).as("dims"))
      .orderBy("id").collect()
    def dims(i: Int) = (rows(i).getStruct(1).getLong(0),
      rows(i).getStruct(1).getLong(1))
    assert(dims(0) == (640L, 480L) && dims(1) == (1L, 1L) &&
      dims(2) == (65535L, 2L))
    assert(rows(3).isNullAt(1) && rows(4).isNullAt(1))
  }

  test("wavMeta reads rate/channels/depth/duration off real header bytes") {
    import spark.implicits._
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >>> (8 * i)) & 0xFF).toByte).toArray
    // canonical 44-byte PCM header the way every standard encoder lays
    // it out: RIFF size, WAVEfmt , fmt-size 16, format 1 (PCM)
    def wav(rate: Long, ch: Long, bits: Long, dataBytes: Long): Array[Byte] =
      "RIFF".getBytes ++ le(36 + dataBytes, 4) ++ "WAVEfmt ".getBytes ++
        le(16, 4) ++ le(1, 2) ++ le(ch, 2) ++ le(rate, 4) ++
        le(rate * ch * bits / 8, 4) ++ le(ch * bits / 8, 2) ++
        le(bits, 2) ++ "data".getBytes ++ le(dataBytes, 4)
    val rows = Seq(
      (1L, wav(44100L, 2L, 16L, 176400L)),  // exactly 1 s of CD stereo
      (2L, wav(16000L, 1L, 8L, 8000L)),     // 0.5 s of 8-bit mono
      (3L, wav(0L, 1L, 16L, 100L)),         // zero rate: fields, no duration
      (4L, "RIFFxxxxLIST".getBytes),        // RIFF but not canonical WAVE
      (5L, Array[Byte](0x49, 0x44, 0x33)))  // MP3/ID3: not a WAV
      .toDF("id", "payload")
      .select(col("id"), Multimodal.wavMeta(col("payload")).as("m"))
      .orderBy("id").collect()
    val cd = rows(0).getStruct(1)
    assert((cd.getLong(0), cd.getLong(1), cd.getLong(2), cd.getLong(3)) ==
      ((44100L, 2L, 16L, 176400L)))
    assert(math.abs(cd.getDouble(4) - 1.0) < 1e-12)
    assert(math.abs(rows(1).getStruct(1).getDouble(4) - 0.5) < 1e-12)
    assert(rows(2).getStruct(1).isNullAt(4), "zero rate must null duration")
    assert(rows(3).isNullAt(1) && rows(4).isNullAt(1))
  }

  test("jpegDims walks the segment chain to SOF; aborts on SOS/invalid") {
    import spark.implicits._
    def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
    def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
      Array(0xFF.toByte, marker.toByte) ++ be16(payload.length + 2) ++
        payload
    val soi = Array(0xFF.toByte, 0xD8.toByte)
    // SOF payload: precision(1), height(2), width(2), components...
    def sof(marker: Int, w: Int, h: Int): Array[Byte] =
      seg(marker, Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    val app0 = seg(0xE0, "JFIF".getBytes ++ Array[Byte](0, 1, 2, 0, 0,
      0, 1, 0, 1, 0, 0))
    val bigExif = seg(0xE1, Array.fill[Byte](1000)(0x42)) // one LONG segment
    val dqt = seg(0xDB, Array.fill[Byte](65)(7))
    val rows = Seq(
      // baseline: SOI + JFIF + DQT + SOF0
      (1L, soi ++ app0 ++ dqt ++ sof(0xC0, 640, 480)),
      // progressive (SOF2) behind a 1 KB EXIF blob — the walk must jump
      // the whole segment in one step, not scan bytes
      (2L, soi ++ bigExif ++ sof(0xC2, 1920, 1080)),
      // SOS before any SOF: abort to null, never read entropy bytes
      (3L, soi ++ app0 ++ seg(0xDA, Array[Byte](1, 1, 0)) ++
        Array[Byte](0x12, 0xFF.toByte, 0xC0.toByte, 0x34)),
      // truncated mid-segment-chain
      (4L, soi ++ app0.take(6)),
      (5L, "GIF89a".getBytes)) // not a JPEG
      .toDF("id", "payload")
      .select(col("id"), Multimodal.jpegDims(col("payload")).as("dims"))
      .orderBy("id").collect()
    def dims(i: Int) = (rows(i).getStruct(1).getLong(0),
      rows(i).getStruct(1).getLong(1))
    assert(dims(0) == (640L, 480L), s"baseline: ${rows(0)}")
    assert(dims(1) == (1920L, 1080L), s"behind exif: ${rows(1)}")
    assert(rows(2).isNullAt(1) && rows(3).isNullAt(1) && rows(4).isNullAt(1))
  }

  test("mp4Meta walks moov/mvhd/tkhd; corrupt containers quarantine") {
    import spark.implicits._
    def be32(v: Long) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      (v & 0xff).toByte)
    def box(t: String, p: Array[Byte]) =
      be32(8L + p.length) ++ t.getBytes("US-ASCII") ++ p
    val good = Multimodal.synthMp4(600L, 1800L, 2, 320, 240)
    // moov behind a leading free box — the top-level walk must hop it
    val ftyp = box("ftyp", "isom".getBytes ++ be32(0))
    val hop = ftyp ++ box("free", new Array[Byte](32)) ++
      good.drop(ftyp.length)
    // v1 mvhd (64-bit times) + v1 tkhd: shifted offsets must parse
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](16) ++ be32(90000L) ++
      new Array[Byte](4) ++ be32(450000L) ++ new Array[Byte](80))
    val tkhd1 = box("tkhd", Array[Byte](1, 0, 0, 0) ++
      new Array[Byte](84) ++ be32(1280L << 16) ++ be32(720L << 16))
    val v1 = ftyp ++ box("moov", mvhd1 ++ box("trak", tkhd1))
    // non-canonical trak (first child is edts, not tkhd): duration and
    // track count still parse; dims fall back to -1
    val odd = ftyp ++ box("moov",
      box("mvhd", new Array[Byte](12) ++ be32(1000L) ++ be32(5000L) ++
        new Array[Byte](80)) ++
      box("trak", box("edts", new Array[Byte](8))))
    // truncated moov (declared size beyond the bytes) and extended-size
    // (size == 1) both quarantine
    val truncated = ftyp ++ be32(4096L) ++ "moov".getBytes
    val extended = ftyp ++ be32(1L) ++ "moov".getBytes ++ be32(0) ++ be32(64L)
    // r16: codec fourcc from the stsd chain — an mp4a entry, and a
    // CORRUPT stsd (claims one entry, carries none) that must NULL the
    // codec while the container fields still parse
    val audio = Multimodal.synthMp4(8000L, 16000L, 1, 0, 0,
      codec = Some("mp4a"))
    val badStsd = Multimodal.synthMp4(1000L, 2000L, 1, 64, 48,
      codec = None)
    val rows = Seq(
      (0L, good), (1L, hop), (2L, v1), (3L, odd),
      (4L, truncated), (5L, extended),
      (6L, "not even close".getBytes),
      (7L, audio), (8L, badStsd))
      .toDF("id", "payload")
      .select(col("id"), Multimodal.mp4Meta(col("payload")).as("m"))
      .orderBy("id").collect()
    def m(i: Int) = rows(i).getStruct(1)
    assert((m(0).getLong(0), m(0).getLong(1), m(0).getLong(3),
      m(0).getLong(4), m(0).getLong(5)) == ((600L, 1800L, 2L, 320L, 240L)),
      s"good: ${rows(0)}")
    assert(m(0).getDouble(2) == 3.0)
    assert((m(1).getLong(0), m(1).getLong(3)) == ((600L, 2L)),
      s"hop over free: ${rows(1)}")
    assert((m(2).getLong(0), m(2).getLong(1), m(2).getLong(4),
      m(2).getLong(5)) == ((90000L, 450000L, 1280L, 720L)),
      s"v1 boxes: ${rows(2)}")
    assert((m(3).getLong(0), m(3).getLong(3), m(3).getLong(4)) ==
      ((1000L, 1L, -1L)), s"non-canonical trak: ${rows(3)}")
    assert(rows(4).isNullAt(1), s"truncated: ${rows(4)}")
    assert(rows(5).isNullAt(1), s"extended-size: ${rows(5)}")
    assert(rows(6).isNullAt(1), s"junk: ${rows(6)}")
    // codec fourcc (field 6): synthMp4's default avc1; an mp4a entry; a
    // trak without the mdia chain (v1/odd) and a corrupt stsd both NULL
    // the codec without disturbing the container fields
    assert(m(0).getString(6) == "avc1", s"codec: ${rows(0)}")
    assert(m(7).getString(6) == "mp4a" && m(7).getLong(0) == 8000L,
      s"audio codec: ${rows(7)}")
    assert(m(2).isNullAt(6), s"v1 without mdia chain: ${rows(2)}")
    assert(m(3).isNullAt(6), s"non-canonical trak: ${rows(3)}")
    assert(m(8).isNullAt(6) && (m(8).getLong(0), m(8).getLong(4),
      m(8).getLong(5)) == ((1000L, 64L, 48L)),
      s"corrupt stsd quarantines the FIELD only: ${rows(8)}")
  }
}
