package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (training-data-pipeline extension): treat
  * image/audio/video payloads as opaque `BINARY` columns with typed
  * metadata, and run decode / feature-extraction as a partition-wise
  * stage with per-executor decoder init (same O4 pattern as the POS
  * stage).
  *
  * The decode step itself is a clearly-marked STUB — this container has
  * no image/audio codecs — but everything Spark-side is real and tested:
  * the schema, the binary payload handling, the mapPartitions batch
  * shape, and the downstream embedding hand-off (the produced
  * `Array[Float]` column feeds [[graft.operators.EmbeddingOps]]-style
  * ANN directly).
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

  /** STUB decoder — a real implementation would wrap a codec library
    * (JPEG decode, mel spectrogram, frame sampling) loaded once per
    * executor; offline here, so features are a deterministic hash mix of
    * the payload bytes. Shape and determinism are what the pipeline
    * tests exercise. */
  final class FakeDecoder(val featureDim: Int = 16) extends MediaDecoder {
    override def decode(mediaType: String, content: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var h = 1125899906842597L ^ mediaType.hashCode.toLong
      var i = 0
      while (i < content.length) { h = 31 * h + content(i); i += 1 }
      var j = 0
      while (j < featureDim) {
        h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
        out(j) = ((h & 0xFFFF).toFloat / 65535.0f) - 0.5f
        j += 1
      }
      out
    }
  }

  /** Case class: the per-JVM decoder cache is keyed by factory, and each
    * task deserializes its own copy — structural equality maps every copy
    * (same dim) to one shared decoder, while a different dim gets its own. */
  final case class FakeDecoderFactory(dim: Int = 16) extends MediaDecoderFactory {
    override def create(): MediaDecoder = new FakeDecoder(dim)
  }

  // per-executor-JVM cache keyed by factory (two pipelines with
  // different featureDims must not share one decoder)
  @transient private lazy val cachedDecoders =
    new java.util.concurrent.ConcurrentHashMap[MediaDecoderFactory, MediaDecoder]()
  private def decoder(factory: MediaDecoderFactory): MediaDecoder =
    cachedDecoders.computeIfAbsent(factory, f => f.create())

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
