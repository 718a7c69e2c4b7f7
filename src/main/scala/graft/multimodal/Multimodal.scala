package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (training-data-pipeline extension): treat
  * image/audio/video payloads as opaque `BINARY` columns with typed
  * metadata, and run decode / feature-extraction as a partition-wise
  * stage with per-executor decoder init (same O4 pattern as the POS
  * stage).
  *
  * The decoder is a REAL binary parser for the simplest raster format
  * there is — binary PPM (P6: ASCII header `P6 <w> <h> <maxval>`, then
  * w·h RGB byte triples) — chosen because the container ships no codec
  * libraries and PPM needs none. A production deployment swaps in a
  * JPEG/mel-spectrogram decoder behind the same [[MediaDecoder]] trait;
  * everything Spark-side (schema, binary payloads, mapPartitions batch
  * shape, per-executor decoder cache, the `Array[Float]` hand-off to
  * [[graft.operators.EmbeddingOps]]-style ANN) is unchanged by that
  * swap.
  */
object Multimodal {

  /** Pluggable media decoder: bytes → fixed-width feature vector. */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(mediaType: String, content: Array[Byte]): Array[Float]
  }

  trait MediaDecoderFactory extends Serializable {
    def create(): MediaDecoder
  }

  /** Real decoder for binary PPM (P6): parses the ASCII header
    * (magic, width, height, maxval — whitespace-delimited, the format's
    * entire metadata surface) and computes strided pixel statistics over
    * the RGB payload. Features (all integer-valued, so float32 carries
    * them exactly and an oracle can reproduce them bit-for-bit):
    * [w, h, maxval, ΣR, ΣG, ΣB, min byte, max byte], the channel sums
    * and extrema taken over pixels 0, stride, 2·stride, … — the
    * subsampling a 100 TB ingest uses to keep per-image decode cost
    * bounded regardless of resolution. Malformed input fails loudly
    * (corrupt payloads must surface, not silently zero-fill). */
  /** Parsed P6 header: dimensions, maxval, and the byte offset where
    * pixel data begins. Shared by [[PpmDecoder]] (strided stats) and
    * [[ppmThumbnails]] (box-filter downsample) so the two consumers of
    * the format cannot drift on header semantics. All the guards fail
    * loudly: corrupt payloads must surface, not silently zero-fill or
    * mis-parse. */
  private[graft] final case class PpmHeader(
      w: Int, h: Int, maxval: Int, dataOffset: Int)

  /** Per-dimension ceiling (2^14): keeps w·h·3 far from Int overflow
    * while admitting any realistic raster. */
  private val MaxPpmDim = 1 << 14

  private[graft] def parsePpm(content: Array[Byte]): PpmHeader = {
    var pos = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"bad PPM: $msg at byte $pos")
    def skipWs(): Unit = {
      while (pos < content.length &&
        Character.isWhitespace(content(pos).toChar)) pos += 1
    }
    def ascInt(): Int = {
      skipWs()
      if (pos >= content.length || content(pos) < '0' || content(pos) > '9')
        fail("expected ASCII integer")
      var v = 0
      while (pos < content.length &&
        content(pos) >= '0' && content(pos) <= '9') {
        v = v * 10 + (content(pos) - '0'); pos += 1
        // cap during accumulation: a hostile digit run must fail here,
        // not overflow into a plausible-looking value
        if (v > MaxPpmDim) fail("integer field too large")
      }
      v
    }
    if (content.length < 2 || content(0) != 'P' || content(1) != '6')
      fail("missing P6 magic")
    pos = 2
    val w = ascInt(); val h = ascInt(); val maxval = ascInt()
    // dimension sanity BEFORE any arithmetic: w*h*3 must stay far from
    // Int overflow, zero-pixel images must not emit the 256/-1 min/max
    // sentinels as features, and only 1-byte-per-channel payloads are
    // this decoder's format (maxval > 255 means 2-byte samples)
    if (w <= 0 || h <= 0) fail(s"degenerate dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // the header ends in EXACTLY one whitespace byte before pixel
    // data; anything else (CR LF, comments, junk) would silently shift
    // every RGB read — fail loudly instead of mis-parsing
    if (pos >= content.length ||
      !Character.isWhitespace(content(pos).toChar))
      fail("header must terminate in one whitespace byte")
    pos += 1
    if (content.length - pos < w * h * 3)
      fail(s"payload short of ${w * h} pixels")
    PpmHeader(w, h, maxval, pos)
  }

  final class PpmDecoder(val stride: Int = 1) extends MediaDecoder {
    override val featureDim: Int = 8
    override def decode(mediaType: String, content: Array[Byte]): Array[Float] = {
      val hdr = parsePpm(content)
      val w = hdr.w; val h = hdr.h; val maxval = hdr.maxval
      val pos = hdr.dataOffset
      val nPx = w * h
      var sr = 0L; var sg = 0L; var sb = 0L
      var lo = 256; var hi = -1
      var p = 0
      while (p < nPx) {
        val base = pos + p * 3
        val r = content(base) & 0xFF
        val g = content(base + 1) & 0xFF
        val b = content(base + 2) & 0xFF
        sr += r; sg += g; sb += b
        lo = math.min(lo, math.min(r, math.min(g, b)))
        hi = math.max(hi, math.max(r, math.max(g, b)))
        p += stride
      }
      Array(w.toFloat, h.toFloat, maxval.toFloat,
        sr.toFloat, sg.toFloat, sb.toFloat, lo.toFloat, hi.toFloat)
    }
  }

  /** Case class: the per-JVM decoder cache is keyed by factory, and each
    * task deserializes its own copy — structural equality maps every copy
    * (same stride) to one shared decoder; a different stride gets its own. */
  final case class PpmDecoderFactory(stride: Int = 1) extends MediaDecoderFactory {
    override def create(): MediaDecoder = new PpmDecoder(stride)
  }

  /** Real decoder for RIFF/WAVE audio, PCM16 mono: walks the chunk list
    * (id + little-endian size, word-aligned — unknown chunks like LIST
    * or fact are SKIPPED, the property that makes this a real RIFF
    * parser rather than a fixed-offset reader), validates the `fmt `
    * contract (PCM format 1, 1 channel, 16-bit, coherent block/byte
    * rates), then computes amplitude statistics over the `data` payload.
    * Features (integer-valued, so float32 carries the planted corpus
    * exactly): [channels, sample rate, bits, n samples, Σ amplitude,
    * min, max, strict zero crossings]. Malformed input — bad magic,
    * truncated payload, stereo, 8/24-bit, float PCM, odd data size,
    * missing chunks — fails loudly (corrupt audio must surface, not
    * zero-fill). */
  final class WavDecoder extends MediaDecoder {
    override val featureDim: Int = 8
    override def decode(mediaType: String, content: Array[Byte]): Array[Float] = {
      var pos = 0
      def fail(msg: String) =
        throw new IllegalArgumentException(s"bad WAV: $msg at byte $pos")
      def need(n: Int): Unit =
        if (pos + n > content.length) fail(s"truncated ($n bytes needed)")
      def u16(): Int = {
        need(2)
        val v = (content(pos) & 0xFF) | ((content(pos + 1) & 0xFF) << 8)
        pos += 2; v
      }
      def u32(): Long = {
        need(4)
        val v = (content(pos) & 0xFFL) | ((content(pos + 1) & 0xFFL) << 8) |
          ((content(pos + 2) & 0xFFL) << 16) | ((content(pos + 3) & 0xFFL) << 24)
        pos += 4; v
      }
      def tag(): String = {
        need(4)
        val t = new String(content, pos, 4, "US-ASCII"); pos += 4; t
      }
      if (tag() != "RIFF") fail("missing RIFF magic")
      val riffSize = u32()
      if (riffSize != content.length - 8L)
        fail(s"RIFF size $riffSize != payload ${content.length - 8}")
      if (tag() != "WAVE") fail("missing WAVE form type")
      var sampleRate = 0L; var haveFmt = false
      var dataAt = -1; var dataSize = 0L
      while (dataAt < 0 && pos + 8 <= content.length) {
        val id = tag(); val size = u32()
        if (pos + size > content.length) fail(s"chunk $id overruns payload")
        id match {
          case "fmt " =>
            if (size < 16) fail(s"fmt chunk too small ($size)")
            val end = pos + size.toInt
            val audioFormat = u16()
            if (audioFormat != 1) fail(s"not integer PCM (format $audioFormat)")
            val channels = u16()
            if (channels != 1) fail(s"mono only (got $channels channels)")
            sampleRate = u32()
            if (sampleRate <= 0 || sampleRate > 192000)
              fail(s"implausible sample rate $sampleRate")
            val byteRate = u32(); val blockAlign = u16(); val bits = u16()
            if (bits != 16) fail(s"16-bit only (got $bits)")
            if (blockAlign != 2) fail(s"block align $blockAlign != 2")
            if (byteRate != sampleRate * 2)
              fail(s"byte rate $byteRate != rate*2")
            pos = end // skip any fmt extension bytes
            haveFmt = true
          case "data" =>
            if (!haveFmt) fail("data chunk before fmt")
            if (size % 2 != 0) fail(s"odd data size $size for 16-bit samples")
            dataAt = pos; dataSize = size
          case _ =>
            pos += size.toInt + (size.toInt & 1) // RIFF chunks word-align
        }
      }
      if (dataAt < 0) fail("no data chunk")
      val n = (dataSize / 2).toInt
      var sum = 0L; var lo = 32768; var hi = -32769
      var zc = 0L; var prev = 0
      var i = 0
      while (i < n) {
        val base = dataAt + i * 2
        val s = (((content(base + 1) & 0xFF) << 8) | (content(base) & 0xFF)).toShort.toInt
        sum += s
        if (s < lo) lo = s
        if (s > hi) hi = s
        if (i > 0 && prev * s < 0) zc += 1
        prev = s
        i += 1
      }
      if (n == 0) { lo = 0; hi = 0 } // no 32768/-32769 sentinels on empty audio
      Array(1f, sampleRate.toFloat, 16f, n.toFloat,
        sum.toFloat, lo.toFloat, hi.toFloat, zc.toFloat)
    }
  }

  final case class WavDecoderFactory() extends MediaDecoderFactory {
    override def create(): MediaDecoder = new WavDecoder()
  }

  // per-executor-JVM cache keyed by factory (two pipelines with
  // different decoder parameterizations — e.g. sampling strides — must
  // not share one decoder)
  @transient private lazy val cachedDecoders =
    new java.util.concurrent.ConcurrentHashMap[MediaDecoderFactory, MediaDecoder]()
  private def decoder(factory: MediaDecoderFactory): MediaDecoder =
    cachedDecoders.computeIfAbsent(factory, f => f.create())

  /** Deterministic planted P6 image for a doc id: fixed 8×6 geometry,
    * channel bytes closed-form in (id, pixel index) — so the REAL
    * header-parse + pixel-stat decode path ([[PpmDecoder]]) becomes
    * oracle-able: DuckDB reproduces the expected stats from the same
    * arithmetic without ever touching bytes (the m11
    * planted-corpus-through-real-path pattern). */
  private[graft] def ppmBytes(docId: Long, w: Int = 8, h: Int = 6): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = 0
    while (p < w * h) {
      val base = header.length + p * 3
      out(base) = ((docId * 7 + p * 13) % 256).toByte
      out(base + 1) = ((docId * 11 + p * 17) % 256).toByte
      out(base + 2) = ((docId * 3 + p * 19) % 256).toByte
      p += 1
    }
    out
  }

  /** Planted-PPM media table: one synthetic 8×6 image per document.
    * The generator UDF is FIXTURE code (stands in for a binary scan of
    * real image files — the corpus ships none), not pipeline code: the
    * operator under test is the partition-wise decode that consumes it. */
  def ppmTable(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) => ppmBytes(id))
    docs.select(col("doc_id"), gen(col("doc_id")).as("content"),
      lit("image").as("media_type"))
  }

  /** Deterministic planted PCM16 mono WAV for a doc id: canonical
    * 44-byte header, 240 samples closed-form in (id, sample index) with
    * amplitudes in [−200, 200] — every [[WavDecoder]] feature (sums,
    * extrema, strict zero crossings) reproduces relationally in DuckDB,
    * and all values stay far inside float32's exact-integer range. */
  private[graft] def wavBytes(docId: Long, n: Int = 240,
      rate: Int = 8000): Array[Byte] = {
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    def put4(off: Int, s: String): Unit = {
      val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, out, off, 4)
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xFF).toByte; out(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      le16(off, v & 0xFFFF); le16(off + 2, (v >> 16) & 0xFFFF)
    }
    put4(0, "RIFF"); le32(4, 36 + dataSize); put4(8, "WAVE")
    put4(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1)
    le32(24, rate); le32(28, rate * 2); le16(32, 2); le16(34, 16)
    put4(36, "data"); le32(40, dataSize)
    var i = 0
    while (i < n) {
      val v = ((docId * 31 + i * 17) % 401).toInt - 200
      le16(44 + i * 2, v & 0xFFFF)
      i += 1
    }
    out
  }

  /** Planted-WAV media table: one synthetic 240-sample clip per
    * document (fixture generator, same stance as [[ppmTable]]). */
  def wavTable(docs: DataFrame): DataFrame = {
    val gen = udf((id: Long) => wavBytes(id))
    docs.select(col("doc_id"), gen(col("doc_id")).as("content"),
      lit("audio").as("media_type"))
  }

  /** Synthetic media table derived from the documents corpus (the test
    * corpus ships no binary column): payload = UTF-8 bytes of the text,
    * media_type from a deterministic id rotation. Stands in for a real
    * `binaryFile`/parquet-binary scan. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3).cast("int") + 1).as("media_type"),
      struct(col("source"), col("lang"),
        length(col("text")).as("n_chars")).as("meta"))

  /** Deterministic frame sampling over a payload column: up to
    * `maxFrames` evenly-strided fixed-width slices per payload, one
    * output row per frame — the video-ingestion shape (decode keyframes,
    * embed each, aggregate per clip). The slicing arithmetic
    * (stride = len div k, k = clamp(len div width, 1, maxFrames)) is
    * pure integer Column expressions, so the whole fanout stays in
    * WholeStageCodegen; a real deployment would replace the digest with
    * a per-frame decoder call through [[extractFeatures]]'s
    * per-executor-cached codec. Payload is the string stand-in (the
    * corpus's UTF-8 text — ASCII, so char offsets equal byte offsets).
    * Emits (doc_id, frame_idx, frame_hash). */
  def frameSample(payloads: DataFrame, frameWidth: Int = 32,
                  maxFrames: Int = 8): DataFrame =
    payloads
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("n"))
      .withColumn("k",
        greatest(lit(1L), least(lit(maxFrames.toLong),
          expr(s"n div $frameWidth"))))
      .select(col("doc_id"), col("text"), col("n"), col("k"),
        explode(sequence(lit(0L), col("k") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        md5(col("text")
          .substr((col("frame_idx") * expr("n div k") + 1).cast("int"),
            lit(frameWidth))
          .cast("binary")).as("frame_hash"))

  /** Partition-wise box-filter downsample of P6 images → one row per
    * THUMBNAIL pixel: (doc_id, ty, tx, r, g, b), each output channel the
    * truncated mean (sum div factor²) of its factor×factor source
    * block. This is the image-resize preprocessing step of a multimodal
    * ingest (thumbnail for dedup/embedding at bounded cost); the byte
    * work happens executor-side through the SAME [[parsePpm]] header
    * contract as the stats decoder, and only the small thumbnail rows
    * ever ride a shuffle — payload bytes stay inside the map task.
    * Trailing rows/columns that don't fill a whole block are dropped
    * (floor geometry), the standard pooling convention. */
  def ppmThumbnails(media: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"downsample factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, Array[Byte])] =
      media.select(col("doc_id").cast("long"), col("content"))
        .as[(Long, Array[Byte])]
    in.flatMap { case (id, bytes) =>
      val hdr = parsePpm(bytes)
      val tw = hdr.w / factor; val th = hdr.h / factor
      val area = factor * factor
      for {
        ty <- 0 until th
        tx <- 0 until tw
      } yield {
        var sr = 0L; var sg = 0L; var sb = 0L
        var dy = 0
        while (dy < factor) {
          var dx = 0
          while (dx < factor) {
            val p = (ty * factor + dy) * hdr.w + (tx * factor + dx)
            val base = hdr.dataOffset + p * 3
            sr += bytes(base) & 0xFF
            sg += bytes(base + 1) & 0xFF
            sb += bytes(base + 2) & 0xFF
            dx += 1
          }
          dy += 1
        }
        (id, ty.toLong, tx.toLong, sr / area, sg / area, sb / area)
      }
    }.toDF("doc_id", "ty", "tx", "r", "g", "b")
  }

  /** Partition-wise decode → (doc_id, media_type, n_bytes, features).
    * One decoder per executor JVM; rows stream through without
    * collecting a partition in memory. */
  def extractFeatures(media: DataFrame, factory: MediaDecoderFactory): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val in: Dataset[(Long, String, Array[Byte])] =
      media.select(col("doc_id").cast("long"), col("media_type"), col("content"))
        .as[(Long, String, Array[Byte])]
    in.mapPartitions { it =>
      val d = decoder(factory)
      it.map { case (id, mt, bytes) =>
        (id, mt, bytes.length.toLong, d.decode(mt, bytes))
      }
    }.toDF("doc_id", "media_type", "n_bytes", "features")
  }
}
