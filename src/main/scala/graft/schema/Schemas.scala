package graft.schema

/** Typed core entities (SURVEY §1.3/M0): case-class encoders give
  * compile-time column safety on the pipeline's stable relations, while
  * dynamic-schema stages (featurization intermediates, oracle outputs)
  * stay DataFrame. Field names/types mirror the driver corpus
  * (FIXTURES.md §B) exactly so `.as[T]` works on the raw scans. */
final case class Document(
    doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

final case class Event(
    event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

/** Per-doc cluster assignment (≙ the reference kmeans$cluster vector,
  * 02_build_models.R:780). */
final case class Assignment(doc_id: Long, cluster: Int)

/** Per-cluster model metadata row (≙ size/withinss/labels fields of the
  * persisted R model object, 02_build_models.R:775-787). */
final case class ClusterInfo(
    cluster: Int, n_docs: Long, withinss: Double, label: String)

/** Coherence report row (ref 02_build_models.R:842-852). */
final case class CoherenceRow(cluster: Int, coherence: Double, n_docs: Long)
