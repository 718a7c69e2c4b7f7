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
  final class PpmDecoder(val stride: Int = 1) extends MediaDecoder {
    override val featureDim: Int = 8
    /** Per-dimension ceiling (2^14): keeps w·h·3 far from Int overflow
      * while admitting any realistic raster. */
    private val MaxDim = 1 << 14
    override def decode(mediaType: String, content: Array[Byte]): Array[Float] = {
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
          if (v > MaxDim) fail("integer field too large")
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
      val nPx = w * h
      if (content.length - pos < nPx * 3) fail(s"payload short of $nPx pixels")
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
