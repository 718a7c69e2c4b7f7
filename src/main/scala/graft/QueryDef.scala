package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark DataFrame implementation plus an
  * optional DuckDB-oracle SQL equivalent over the same parquet tables.
  * Queries without an oracle get the driver's weaker rows-only check
  * (non-SQL-expressible ops: ML fits, approximate algorithms).
  *
  * Contract notes (driver compare):
  *  - column names must match the oracle exactly (driver sorts columns by
  *    name before hashing) — every computed column is aliased identically
  *    on both sides;
  *  - every query ends in a total deterministic ORDER BY, with explicit
  *    NULLS FIRST in the DuckDB SQL where sort keys are nullable (Spark
  *    ASC defaults to nulls-first, DuckDB to nulls-last);
  *  - doubles are rounded (money sums → 2dp, ratios/idf/cosine → 6dp) so
  *    summation-order ulp drift cannot flip the hash;
  *  - DuckDB integer sums are CAST to BIGINT (DuckDB yields HUGEINT,
  *    Spark yields LongType).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  def all: Seq[QueryDef] =
    graft.operators.Relational.defs ++
      graft.operators.TemporalOps.defs ++
      graft.operators.TextOps.defs ++
      graft.operators.BpeOps.defs ++
      graft.operators.EmbeddingOps.defs ++
      graft.operators.DedupOps.defs ++
      graft.operators.GraphOps.defs ++
      graft.operators.PackOps.defs ++
      graft.ml.MlQueries.defs ++
      graft.operators.EnrichOps.defs ++
      graft.operators.SourceOps.defs ++
      graft.operators.SkewOps.defs ++
      graft.streaming.EventStreams.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
