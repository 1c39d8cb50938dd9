package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2B Q34; builder-prompt
  * requirement): image/audio/video travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction run batched per
  * partition so decoder init amortizes per partition, not per row.
  *
  * The decode step is REAL (r13): `javax.imageio.ImageIO` — part of the
  * JDK, so zero added dependencies — decodes PNG/JPEG/BMP/GIF payloads to
  * true dimensions plus a bounded 16-bin luminance histogram; payloads no
  * installed reader understands come back as a typed UNDECODABLE row
  * (width/height −1, empty features) so a media lake quarantines bad
  * bytes instead of crashing the job. AUDIO decode is real too (r14):
  * `javax.sound.sampled` decodes WAV/AIFF/AU PCM to loudness features
  * with the same typed quarantine ([[AudioCodec]]); only compressed
  * video still stops at the metadata pass (ffmpeg-class codecs are not
  * in this container) — its header parsers are the real ones below.
  */
object Multimodal {

  /** An opaque media asset: payload + typed metadata. */
  case class Asset(doc_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  /** Decoded features for one asset. */
  case class Decoded(doc_id: Long, mime: String, width: Int, height: Int,
      features: Array[Float])

  /** REAL image decoder over the JDK's ImageIO readers (PNG, JPEG, BMP,
    * GIF, WBMP out of the box). Features are a 16-bin LUMINANCE histogram
    * sampled on a bounded ≤64×64 pixel grid — per-asset feature cost is
    * O(1) regardless of image size, the property that keeps a decode
    * pass viable over a 100 TB media lake (the full-resolution read is
    * the codec's streaming decode; the feature pass must not be another
    * O(pixels) loop on a 100-megapixel scan). Undecodable payloads
    * return the typed quarantine row rather than throwing: one corrupt
    * asset must never kill a billion-row decode stage.
    */
  object ImageCodec {
    private val MaxSamples = 64

    def decode(a: Asset): Decoded = {
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(a.payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) Decoded(a.doc_id, a.mime, -1, -1, Array.empty)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sx = math.max(1, w / MaxSamples)
        val sy = math.max(1, h / MaxSamples)
        val hist = new Array[Float](16)
        var n = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 +
              ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
            hist(math.min(15, lum >> 4)) += 1f
            n += 1
            x += sx
          }
          y += sy
        }
        var i = 0
        while (i < 16) { hist(i) /= n; i += 1 }
        Decoded(a.doc_id, a.mime, w, h, hist)
      }
    }
  }

  /** Decoded audio features for one asset. `n_frames` is per-channel
    * sample count; `rms`/`peak` are normalized to int16 full scale;
    * `silence_ratio` is the share of samples at or below ~1% full scale.
    */
  case class DecodedAudio(doc_id: Long, mime: String, sample_rate: Int,
      channels: Int, n_frames: Long, rms: Float, silence_ratio: Float,
      peak: Float)

  /** REAL audio decoder over the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * PCM out of the box — like ImageIO, zero added dependencies; an
    * ffmpeg-class codec for compressed formats would replace only this
    * object, the [[decodeAllAudio]] seam is unchanged). Features are the
    * loudness triple every audio-curation pipeline filters on first: RMS
    * level, silence ratio, and peak — all single-pass over the PCM
    * stream in exact integer arithmetic (sample² sums fit a Long up to
    * ~2^32 samples), with the irrational sqrt applied once per asset.
    * Undecodable or non-16-bit payloads quarantine as a typed row
    * (−1 everywhere) — one corrupt asset must never kill the stage.
    */
  object AudioCodec {
    /** |sample| at or below this (≈1% of int16 full scale) is silence. */
    val SilenceThreshold = 327

    def decode(a: Asset): DecodedAudio = {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(a.payload))
        try {
          val fmt = in.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            s"unsupported encoding ${fmt.getEncoding}")
          val bytes = in.readAllBytes()
          val big = fmt.isBigEndian
          var i = 0
          var sumSq = 0L
          var silent = 0L
          var peak = 0
          while (i + 1 < bytes.length) {
            val s =
              if (big) (bytes(i) << 8) | (bytes(i + 1) & 0xff)
              else (bytes(i + 1) << 8) | (bytes(i) & 0xff)
            val m = math.abs(s)
            sumSq += s.toLong * s
            if (m <= SilenceThreshold) silent += 1
            if (m > peak) peak = m
            i += 2
          }
          val nSamples = bytes.length / 2
          val frames = nSamples / fmt.getChannels
          DecodedAudio(a.doc_id, a.mime, fmt.getSampleRate.toInt,
            fmt.getChannels, frames,
            (math.sqrt(sumSq.toDouble / nSamples) / 32768.0).toFloat,
            (silent.toDouble / nSamples).toFloat,
            (peak.toDouble / 32768.0).toFloat)
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) =>
        DecodedAudio(a.doc_id, a.mime, -1, -1, -1L, -1f, -1f, -1f)
      }
    }
  }

  /** Batched audio decode — the [[decodeAll]] shape for sound: codec
    * probing happens per partition, features stay columnar downstream.
    */
  def decodeAllAudio(assets: Dataset[Asset]): Dataset[DecodedAudio] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(AudioCodec.decode))
  }

  /** End-to-end AUDIO decode pipeline over REAL bytes — the audio dual of
    * [[pipeline]]: synthesize a deterministic WAV set (half-silent square
    * waves: sample rate 8000+1000·(i%3), channels 1+(i%2), 800+50·i
    * frames, amplitude 1000·(i+1) — every decoded feature is a CLOSED
    * FORM of i, which is what lets a cross-engine oracle check a real
    * codec), write them with the JDK's own WAV writer, ingest through the
    * `binaryFile` source, and batch-decode with [[AudioCodec]]. Two
    * corrupt payloads ride along to prove the quarantine path.
    */
  def pipelineAudio(spark: SparkSession, dir: String): Dataset[DecodedAudio] = {
    import spark.implicits._
    val media = java.nio.file.Files.createTempDirectory("graft-media-au")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(media.toFile)
    }
    (0 until 12).foreach { i =>
      val sr = 8000 + 1000 * (i % 3)
      val ch = 1 + (i % 2)
      val frames = 800 + 50 * i
      val amp = 1000 * (i + 1)
      val silentFrames = frames / 2
      val data = new Array[Byte](frames * ch * 2)
      var k = 0
      while (k < frames) {
        val s =
          if (k < silentFrames) 0
          else if (((k - silentFrames) / 8) % 2 == 0) amp
          else -amp
        var c = 0
        while (c < ch) {
          val idx = (k * ch + c) * 2
          data(idx) = (s & 0xff).toByte
          data(idx + 1) = ((s >> 8) & 0xff).toByte
          c += 1
        }
        k += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        sr.toFloat, 16, ch, /* signed = */ true, /* bigEndian = */ false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE,
        media.resolve(f"au$i%03d.wav").toFile)
    }
    java.nio.file.Files.write(media.resolve("bad900.wav"),
      Array[Byte](9, 9, 9, 9))
    java.nio.file.Files.write(media.resolve("bad901.wav"),
      "definitely not audio".getBytes("UTF-8"))
    val assets = readMediaDir(spark, media.toString, glob = "*.wav")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.wav$", 1).cast("long")
          .as("doc_id"),
        when(col("path").contains("bad"), "audio/corrupt")
          .otherwise("audio/wav").as("mime"),
        col("length").as("n_bytes"),
        col("content").as("payload"))
      .as[Asset]
    decodeAllAudio(assets)
  }

  /** Media-directory ingestion via Spark's built-in `binaryFile` source —
    * how raw image/audio/video files actually enter the pipeline: each
    * file becomes one row (path, modificationTime, length, content) with
    * the bytes untouched. `pathGlobFilter` prunes by extension BEFORE any
    * read; `maxBytesPerFile` would be the guard against a stray huge file
    * at scale (one row must fit an executor). The projection drops
    * `modificationTime` so downstream caching/dedup keys are
    * content-derived, not scan-time-derived.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"), col("content"))

  /** REAL (non-stub) header parse: PNG dimensions straight off the binary
    * payload with builtin codegen functions only — no UDF, no codec. A
    * PNG's first chunk is mandatory IHDR at a fixed offset, so width and
    * height are big-endian u32 at bytes 17–20 / 21–24 (1-based); the
    * 8-byte signature gates non-PNG payloads to a null struct. substring
    * on binary is zero-copy slicing, hex/conv are whole-stage-codegen'd —
    * this runs at scan speed on 10⁹ thumbnails, which is exactly how a
    * metadata-extraction pass over a media lake should look (full decode
    * only AFTER pruning on cheap header fields).
    */
  def pngDims(content: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val isPng = hex(substring(content, 1, 8)) === lit("89504E470D0A1A0A")
    val be32 = (off: Int) =>
      conv(hex(substring(content, off, 4)), 16, 10).cast("long")
    when(isPng && length(content) >= 24,
      struct(be32(17).as("width"), be32(21).as("height")))
      .otherwise(lit(null))
  }

  /** REAL (non-stub) audio-header parse, the WAV sibling of [[pngDims]]:
    * sample rate / channels / bit depth / payload size / duration straight
    * off canonical RIFF-WAVE bytes (44-byte PCM header: "RIFF" @1,
    * "WAVEfmt " @9, "data" @37 — the layout every standard PCM encoder
    * writes), builtin codegen functions only. WAV fields are
    * LITTLE-endian, so each integer is read by hex-ing its bytes in
    * reverse order before `conv` — still zero-copy slicing + codegen'd
    * string ops. Non-canonical containers (extra chunks before `data`)
    * and non-WAV payloads gate to a null struct rather than misparse:
    * metadata-pass-then-decode, same posture as the image side. Duration
    * is null when any rate/channel/depth field is zero (division guard),
    * not a fabricated 0.0.
    */
  def wavMeta(content: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val le = (off: Int, n: Int) =>
      conv(concat((0 until n).reverse.map(i =>
        hex(substring(content, off + i, 1))): _*), 16, 10).cast("long")
    val isWav = hex(substring(content, 1, 4)) === lit("52494646") &&
      hex(substring(content, 9, 8)) === lit("57415645666D7420") &&
      hex(substring(content, 37, 4)) === lit("64617461")
    val rate = le(25, 4)
    val ch = le(23, 2)
    val bits = le(35, 2)
    val dataBytes = le(41, 4)
    val duration = when(rate > 0 && ch > 0 && bits > 0,
      dataBytes.cast("double") * 8.0 /
        (rate.cast("double") * ch.cast("double") * bits.cast("double")))
    when(isWav && length(content) >= 44,
      struct(rate.as("sample_rate"), ch.as("channels"),
        bits.as("bits_per_sample"), dataBytes.as("data_bytes"),
        duration.as("duration_s")))
      .otherwise(lit(null))
  }

  /** REAL (non-stub) JPEG dimension parse — and unlike PNG/WAV, a JPEG's
    * SOF marker sits at NO fixed offset: the header is a chain of
    * variable-length segments (APPn/EXIF, quantization tables, comments)
    * that must be WALKED. The walk is a bounded `aggregate` higher-order
    * function over up to 32 segment steps — state (offset, w, h), each
    * step either captures SOF0/1/2 dimensions, advances by the segment's
    * big-endian length, or aborts on a standalone/invalid marker — so an
    * iterative binary parse still runs as one codegen'd expression at
    * scan speed, no UDF. 32 segments covers real encoders comfortably
    * (EXIF is ONE segment however large); an SOS before any SOF aborts
    * to null, never misparses entropy-coded bytes. Same posture as
    * [[pngDims]]: cheap header pass first, full decode only after
    * pruning.
    */
  def jpegDims(content: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    val isJpeg = hex(substring(content, 1, 2)) === lit("FFD8")
    def be16(off: Column) =
      conv(hex(substring(content, off.cast("int"), lit(2))), 16, 10)
        .cast("long")
    def st(o: Column, w: Column, h: Column) =
      struct(o.cast("long").as("off"), w.cast("long").as("w"),
        h.cast("long").as("h"))
    // markers with NO length field (or that legally end the header scan):
    // stray SOI, EOI, SOS (entropy data follows — dims must precede it),
    // TEM, RST0-7
    val standalone = Seq("FFD8", "FFD9", "FFDA", "FF01",
      "FFD0", "FFD1", "FFD2", "FFD3", "FFD4", "FFD5", "FFD6", "FFD7")
    val walk = aggregate(
      sequence(lit(1), lit(32)),
      st(lit(3), lit(-1), lit(-1)),
      (acc, _) => {
        val off = acc.getField("off")
        val w = acc.getField("w")
        val mk = hex(substring(content, off.cast("int"), lit(2)))
        when(w >= 0 || off < 0 || off + 3 > length(content), acc)
          .when(mk.isin("FFC0", "FFC1", "FFC2"),
            when(off + 8 <= length(content),
              st(lit(-1), be16(off + 7), be16(off + 5)))
              .otherwise(st(lit(-1), lit(-1), lit(-1))))
          .when(mk.startsWith("FF") && !mk.isin(standalone: _*),
            st(off + 2 + be16(off + 2), lit(-1), lit(-1)))
          .otherwise(st(lit(-1), lit(-1), lit(-1)))
      })
    when(isJpeg && walk.getField("w") >= 0,
      struct(walk.getField("w").as("width"),
        walk.getField("h").as("height")))
      .otherwise(lit(null))
  }

  /** REAL (non-stub) MP4/ISO-BMFF container metadata parse — the VIDEO
    * sibling of [[jpegDims]], closing the image/audio/video metadata
    * matrix within zero-egress (no ffmpeg needed for the CONTAINER walk;
    * only the entropy-coded samples would need a codec). An ISO-BMFF
    * file is a chain of `[u32 size][4cc type]` boxes; the movie metadata
    * lives under `moov`: `mvhd` carries timescale + duration, each
    * `trak` is one track whose `tkhd` (canonically its first child)
    * carries 16.16 fixed-point width/height. Two BOUNDED `aggregate`
    * walks — ≤16 top-level boxes to find `moov`, ≤32 children inside it
    * — run the whole parse as codegen'd expressions at scan speed, the
    * [[jpegDims]] precedent. mvhd/tkhd version 1 (64-bit times) shifts
    * the field offsets and is handled; truncated/corrupt/extended-size
    * containers gate to a NULL struct (quarantine, never misparse).
    * Width/height fall back to −1 when the first trak child is not tkhd
    * (non-canonical muxer) — the duration/track fields still parse.
    */
  def mp4Meta(content: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.Column
    def be32(off: Column) =
      conv(hex(substring(content, off.cast("int"), lit(4))), 16, 10)
        .cast("long")
    def be64(off: Column) =
      conv(hex(substring(content, off.cast("int"), lit(8))), 16, 10)
        .cast("long")
    def u8(off: Column) =
      conv(hex(substring(content, off.cast("int"), lit(1))), 16, 10)
        .cast("long")
    def fourcc(off: Column) =
      substring(content, (off + lit(4)).cast("int"), lit(4)).cast("string")
    // the standard sniff: every ISO-BMFF file leads with an ftyp box
    val isMp4 = length(content) >= 16 && fourcc(lit(1)) === lit("ftyp")
    def st2(off: Column, moov: Column, end: Column) =
      struct(off.cast("long").as("off"), moov.cast("long").as("moov"),
        end.cast("long").as("end"))
    // walk 1: top-level boxes until moov (size==0/1 = to-EOF/extended —
    // abort rather than guess; a box must be ≥ 8 bytes to advance)
    val findMoov = aggregate(
      sequence(lit(1), lit(16)),
      st2(lit(1), lit(-1), lit(-1)),
      (acc, _) => {
        val off = acc.getField("off")
        val size = be32(off)
        when(acc.getField("moov") >= 0 || off < 0 ||
            off + 7 > length(content), acc)
          .when(fourcc(off) === "moov" && size >= 16 &&
            off + size - 1 <= length(content),
            st2(lit(-1), off, off + size))
          .when(size >= 8, st2(off + size, lit(-1), lit(-1)))
          .otherwise(st2(lit(-1), lit(-1), lit(-1)))
      })
    val moov = findMoov.getField("moov")
    val moovEnd = findMoov.getField("end")
    def st6(off: Column, ts: Column, dur: Column, tracks: Column,
        w: Column, h: Column) =
      struct(off.cast("long").as("off"), ts.cast("long").as("ts"),
        dur.cast("long").as("dur"), tracks.cast("long").as("tracks"),
        w.cast("long").as("w"), h.cast("long").as("h"))
    // walk 2: moov children. mvhd v0: timescale @+20, duration @+24;
    // v1 (64-bit times): @+28 / be64 @+32. tkhd (first child of trak)
    // v0: 16.16 width @trak+92, height @trak+96; v1: @+104 / @+108.
    val walk = aggregate(
      sequence(lit(1), lit(32)),
      st6(moov + 8, lit(-1), lit(-1), lit(0), lit(-1), lit(-1)),
      (acc, _) => {
        val off = acc.getField("off")
        val ts = acc.getField("ts")
        val dur = acc.getField("dur")
        val tracks = acc.getField("tracks")
        val w = acc.getField("w")
        val h = acc.getField("h")
        val size = be32(off)
        val t = fourcc(off)
        val next = when(size >= 8, off + size).otherwise(lit(-1L))
        val v = u8(off + 8) // full-box version byte
        val tkhdV = u8(off + 16)
        val isTkhd = fourcc(off + 8) === "tkhd"
        when(off < 0 || off + 7 > moovEnd - 1, acc)
          .when(t === "mvhd" && off + 35 <= length(content),
            st6(next,
              when(v === 1, be32(off + 28)).otherwise(be32(off + 20)),
              when(v === 1, be64(off + 32)).otherwise(be32(off + 24)),
              tracks, w, h))
          .when(t === "trak",
            st6(next, ts, dur, tracks + 1,
              when(w >= 0, w).when(isTkhd && tkhdV === 1 &&
                  off + 111 <= length(content),
                  be32(off + 104) / 65536)
                .when(isTkhd && off + 99 <= length(content),
                  be32(off + 92) / 65536)
                .otherwise(lit(-1L)),
              when(h >= 0, h).when(isTkhd && tkhdV === 1 &&
                  off + 111 <= length(content),
                  be32(off + 108) / 65536)
                .when(isTkhd && off + 99 <= length(content),
                  be32(off + 96) / 65536)
                .otherwise(lit(-1L))))
          .otherwise(st6(next, ts, dur, tracks, w, h))
      })
    // walk 3 (r16): the codec fourcc — the field a media-lake triage
    // actually filters on. The sample description lives four levels down
    // the FIRST trak: trak → mdia → minf → stbl → stsd; each hop is one
    // bounded child-find (unknown siblings — tkhd, mdhd, hdlr, vmhd,
    // dinf — skip by size), and the stsd FullBox's first sample entry is
    // `[u32 size][4cc codec]` at stsd+16. A missing/truncated/corrupt
    // stsd yields a NULL codec while the container fields still parse
    // (quarantine the FIELD, not the row — the walk never misreads
    // neighbor bytes: the entry header must sit inside the stsd box).
    // ONE flat state machine, not four chained finds: chaining aggregate
    // expressions via getField duplicates the parent subtree at every
    // reference (2^levels copies — the analyzer's fixed-point blows up).
    // The accumulator is (lvl, off, end): lvl indexes the target chain
    // trak→mdia→minf→stbl→stsd; matching a target DESCENDS (scan region
    // narrows to the matched box), anything else skips by size. ≤72
    // bounded steps cover 32 moov-level siblings plus the nested hops.
    val chainTargets = array(lit("trak"), lit("mdia"), lit("minf"),
      lit("stbl"), lit("stsd"))
    def st3(lvl: Column, off: Column, end: Column) =
      struct(lvl.cast("long").as("lvl"), off.cast("long").as("off"),
        end.cast("long").as("end"))
    val chainWalk = aggregate(
      sequence(lit(1), lit(72)),
      st3(lit(0), moov + 8, moovEnd),
      (acc, _) => {
        val lvl = acc.getField("lvl")
        val off = acc.getField("off")
        val end = acc.getField("end")
        val size = be32(off)
        val isTgt = fourcc(off) ===
          element_at(chainTargets, (lvl + 1).cast("int"))
        when(lvl >= 5 || off < 0 || off + 7 > end - 1, acc)
          .when(isTgt && size >= 8 && off + size <= end,
            when(lvl === 4, st3(lit(5), off, off + size)) // stsd box kept
              .otherwise(st3(lvl + 1, off + 8, off + size)))
          .when(size >= 8, st3(lvl, off + size, end))
          .otherwise(st3(lvl, lit(-1), end)) // unparseable sibling: stop
      })
    val stsdOff = when(chainWalk.getField("lvl") === 5,
      chainWalk.getField("off")).otherwise(lit(-1L))
    val stsdEnd = chainWalk.getField("end")
    val codec = when(stsdOff >= 0 && be32(stsdOff + 12) >= 1 &&
        stsdOff + 16 + 7 <= stsdEnd - 1,
      fourcc(stsdOff + 16)).otherwise(lit(null).cast("string"))
    when(isMp4 && moov >= 0 && walk.getField("ts") > 0,
      struct(walk.getField("ts").as("timescale"),
        walk.getField("dur").as("duration_units"),
        (walk.getField("dur").cast("double") /
          walk.getField("ts").cast("double")).as("duration_s"),
        walk.getField("tracks").as("track_count"),
        walk.getField("w").as("width"),
        walk.getField("h").as("height"),
        codec.as("codec")))
      .otherwise(lit(null))
  }

  /** Deterministic minimal ISO-BMFF synthesis — the MP4 dual of
    * [[pipelineAudio]]'s WAV synthesis: every container field is a
    * CLOSED FORM of the index, which is what lets a cross-engine oracle
    * check a real binary parser. v0 boxes; only the fields the parser
    * reads are non-zero.
    */
  def synthMp4(timescale: Long, durationUnits: Long, tracks: Int,
      width: Int, height: Int,
      codec: Option[String] = Some("avc1")): Array[Byte] = {
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(t: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ t.getBytes("US-ASCII") ++ payload
    val mvhd = box("mvhd",
      new Array[Byte](12) ++ be32(timescale) ++ be32(durationUnits) ++
        new Array[Byte](80)) // rate/volume/matrix/next-id: parser-unread
    val tkhd = box("tkhd",
      new Array[Byte](76) ++ be32(width.toLong << 16) ++
        be32(height.toLong << 16))
    // sample description chain (r16): mdia → minf → stbl → stsd; the
    // stsd FullBox carries entry_count then `[size][codec 4cc]` entries.
    // codec = None synthesizes a CORRUPT stsd (claims one entry, carries
    // none) — the parser must NULL the codec field, not read neighbors.
    val stsd = codec match {
      case Some(c) => box("stsd",
        new Array[Byte](4) ++ be32(1L) ++ box(c, new Array[Byte](8)))
      case None => box("stsd", new Array[Byte](4) ++ be32(1L))
    }
    val mdia = box("mdia", box("minf", box("stbl", stsd)))
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov",
      mvhd ++ (0 until tracks).flatMap(_ => trak).toArray)
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(0)) ++ moov ++
      box("mdat", Array[Byte](1, 2, 3))
  }

  /** End-to-end VIDEO-container metadata pipeline over REAL bytes — the
    * [[pipeline]]/[[pipelineAudio]] shape for MP4: synthesize
    * deterministic containers (timescale 1000, duration (i+1)s,
    * 1+(i%3) tracks, (160+16i)×(120+8i)), ingest through `binaryFile`,
    * parse with [[mp4Meta]] at scan speed. Two corrupt payloads prove
    * the quarantine path (NULL metadata rows, never exceptions).
    */
  def pipelineVideo(spark: SparkSession): DataFrame = {
    val media = java.nio.file.Files.createTempDirectory("graft-media-mp4")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(media.toFile)
    }
    val codecs = Seq("avc1", "mp4a", "hvc1")
    (0 until 12).foreach { i =>
      java.nio.file.Files.write(media.resolve(f"vid$i%03d.mp4"),
        synthMp4(1000L, 1000L * (i + 1), 1 + (i % 3),
          160 + 16 * i, 120 + 8 * i, codec = Some(codecs(i % 3))))
    }
    java.nio.file.Files.write(media.resolve("vid900.mp4"),
      Array[Byte](0, 0, 0, 9, 9, 9))
    java.nio.file.Files.write(media.resolve("vid901.mp4"),
      "certainly not a movie".getBytes("UTF-8"))
    // corrupt stsd (entry_count 1, no entry): the container fields parse,
    // the codec quarantines to NULL
    java.nio.file.Files.write(media.resolve("vid902.mp4"),
      synthMp4(1000L, 5000L, 1, 320, 240, codec = None))
    readMediaDir(spark, media.toString, glob = "*.mp4")
      .select(
        regexp_extract(col("path"), "(\\d+)\\.mp4$", 1).cast("long")
          .as("doc_id"),
        mp4Meta(col("content")).as("meta"))
  }

  /** Attach a fake binary payload to the documents table (in production the
    * payload column arrives from the source parquet; text bytes stand in).
    * The metadata struct keeps scan-time pruning possible: filters on
    * `mime`/`n_bytes` never touch the payload bytes.
    */
  def withPayload(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      concat(lit("media/"), col("source")).as("mime"),
      length(col("text")).cast("long").as("n_bytes"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Batched decode: mapPartitions so codec init happens once per
    * partition. Returns a typed Dataset — downstream joins/aggregations on
    * (doc_id, width, height, features) stay columnar.
    */
  def decodeAll(assets: Dataset[Asset]): Dataset[Decoded] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition codec init: no temp-file cache (pure in-memory
      // streams), exactly the once-per-partition seam a heavier codec
      // (ffmpeg, a JNI decoder) would initialize in
      javax.imageio.ImageIO.setUseCache(false)
      it.map(ImageCodec.decode)
    }
  }

  /** Fixed-size frame sampling from a binary payload (video-style): emits
    * up to `maxFrames` equally spaced `frameBytes`-sized slices, columnar
    * (no UDF) via higher-order functions on the binary column.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 8, maxFrames: Int = 4): DataFrame = {
    val nFrames = least(lit(maxFrames),
      ceil(col("n_bytes").cast("double") / frameBytes).cast("int"))
    val stride = greatest(lit(frameBytes),
      (col("n_bytes") / nFrames).cast("int"))
    // empty payload => empty frames: sequence(0, -1) would yield [0, -1]
    // (negative default step), not an empty array
    val frames = when(col("n_bytes") > 0,
      transform(sequence(lit(0), nFrames - 1),
        i => col("payload").substr(i * stride + 1, lit(frameBytes))))
      .otherwise(expr("CAST(array() AS ARRAY<BINARY>)"))
    assets.select(col("doc_id"), col("mime"), frames.as("frames"))
  }

  /** End-to-end decode pipeline over REAL bytes: synthesize a small,
    * deterministic PNG set (sizes and grey levels derived from the index
    * — ImageIO writes real image files), ingest it through the
    * `binaryFile` source, and batch-decode with the real codec. Two
    * deliberately corrupt payloads ride along to prove the quarantine
    * path (they surface as width −1 rows, never exceptions). In
    * production the synth step is replaced by pointing [[readMediaDir]]
    * at the media lake; everything downstream is unchanged.
    */
  def pipeline(spark: SparkSession, dir: String): Dataset[Decoded] = {
    import spark.implicits._
    val media = java.nio.file.Files.createTempDirectory("graft-media-px")
    sys.addShutdownHook {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(); ()
      }
      rm(media.toFile)
    }
    (0 until 24).foreach { i =>
      val img = new java.awt.image.BufferedImage(
        8 + i, 4 + (i % 7), java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      val grey = (i * 10) % 256
      g.setColor(new java.awt.Color(grey, grey, grey))
      g.fillRect(0, 0, img.getWidth, img.getHeight)
      g.dispose()
      javax.imageio.ImageIO.write(img, "png",
        media.resolve(f"img$i%03d.png").toFile)
    }
    java.nio.file.Files.write(media.resolve("bad900.png"),
      Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(media.resolve("bad901.png"),
      "not an image at all".getBytes("UTF-8"))
    val assets = readMediaDir(spark, media.toString, glob = "*.png")
      .select(
        // stable id from the file name (img000 → 0), so results do not
        // depend on listing order
        regexp_extract(col("path"), "(\\d+)\\.png$", 1).cast("long")
          .as("doc_id"),
        when(col("path").contains("bad"), "image/corrupt")
          .otherwise("image/png").as("mime"),
        col("length").as("n_bytes"),
        col("content").as("payload"))
      .as[Asset]
    decodeAll(assets)
  }
}
