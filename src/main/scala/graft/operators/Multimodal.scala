package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2B Q34; builder-prompt
  * requirement): image/audio/video travel as opaque `binary` columns with a
  * typed metadata struct; decode / feature-extraction run batched per
  * partition so a real decoder would amortize model/codec init per
  * partition, not per row.
  *
  * The decode step itself is a STUB — this container has no image/audio
  * codecs — replaced by a deterministic fake (shape + features derived from
  * the payload bytes) so the Spark-side plumbing (schema, partitioning,
  * batch shape, encoder boundaries) is real and testable. The one function
  * to swap for production is [[FakeCodec.decode]].
  */
object Multimodal {

  /** An opaque media asset: payload + typed metadata. */
  case class Asset(doc_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])

  /** Decoded features for one asset. */
  case class Decoded(doc_id: Long, mime: String, width: Int, height: Int,
      features: Array[Float])

  /** STUB decoder — deterministic fake standing in for a real codec
    * (jpeg/png/ffmpeg). Derives shape and a 16-dim feature vector from the
    * payload bytes only, so tests are reproducible anywhere.
    */
  object FakeCodec {
    def decode(a: Asset): Decoded = {
      val h = java.util.Arrays.hashCode(a.payload)
      val width = 16 + math.floorMod(h, 16)
      val height = 16 + math.floorMod(h >> 4, 16)
      val features = Array.tabulate(16) { i =>
        val b = if (a.payload.isEmpty) 0 else a.payload(i % a.payload.length) & 0xff
        (b * (i + 1)).toFloat / 255f
      }
      Decoded(a.doc_id, a.mime, width, height, features)
    }
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
      // production: initialize the real codec HERE, once per partition
      it.map(FakeCodec.decode)
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

  /** End-to-end demo pipeline over the fixture documents table. */
  def pipeline(spark: SparkSession, dir: String): Dataset[Decoded] = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    decodeAll(withPayload(docs).as[Asset])
  }
}
