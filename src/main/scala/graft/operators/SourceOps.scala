package graft.operators

import graft.QueryDef
import graft.multimodal.Multimodal
import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sample + multimodal-column queries (SURVEY §2.1 S3 + the
  * multimodal extension). The chunk sinks S4-S6 are write-side operators
  * — exercised by SinksSpec round-trips, not the read-only query
  * harness. */
object SourceOps {

  /** s01 — S3b systematic sample: exact, partition-independent residue
    * sample (the oracle-checkable form of the reference's dry-run
    * sampling; the seeded Bernoulli variant is [[Sinks.sample]]). */
  def systematicSample(s: SparkSession, d: String): DataFrame =
    Sinks.sampleByMod(Tables.documents(s, d), "doc_id", 10, 3)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val systematicSampleSql =
    """SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id % 10 = 3 ORDER BY doc_id""".stripMargin

  /** b01 — multimodal table plumbing: binary payload + typed metadata
    * (schema-level contract is oracle-checked; the payload itself is the
    * documents text as UTF-8 bytes — the corpus ships no true binary
    * column). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(Tables.documents(s, d))
      .select(col("doc_id"), col("media_type"),
        length(col("content")).cast("long").as("n_bytes"),
        col("meta.n_chars").cast("long").as("n_chars"))
      .orderBy(col("doc_id"))

  private val mediaTableSql =
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][(doc_id % 3) + 1] AS media_type,
      |  octet_length(encode(text)) AS n_bytes,
      |  length(text) AS n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** b02 — partition-wise media decode (stub codec, real plumbing):
    * binary → per-executor decoder → feature vector → norm. Rows-only:
    * the fake decoder's hash mix is not SQL-expressible. */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeatures(
        Multimodal.mediaTable(Tables.documents(s, d)),
        new Multimodal.FakeDecoderFactory(16))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        round(graft.expressions.VectorExpressions.arrayNorm(col("features")), 6)
          .as("feat_norm"))
      .orderBy(col("doc_id"))

  def defs: Seq[QueryDef] = Seq(
    QueryDef("s01_systematic_sample", systematicSample, Some(systematicSampleSql)),
    QueryDef("b01_media_table", mediaTable, Some(mediaTableSql)),
    QueryDef("b02_media_features", mediaFeatures, None))
}
