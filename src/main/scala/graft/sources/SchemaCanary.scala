package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Corpus-drift canary (SURVEY §1.3 fail-fast schema): asserts the
  * post-normalization types every operator in the engine assumes, so a
  * regenerated corpus fails HERE with a named `table.column: expected X,
  * got Y` diff instead of operator-deep in the sweep.
  *
  * Motivating incident: the r8 corpus silently flipped `events.ts` from
  * TIMESTAMP(NANOS)-as-long to tz-less timestamp[us] (Spark
  * TIMESTAMP_NTZ), which surfaced as nine opaque AnalysisExceptions in
  * `unix_micros`/`withWatermark` far from the reader. The reference's
  * only schema enforcement is assert-on-required-column
  * (ref 01_extract_features.R:261-263); this is the engine's stronger
  * form — run by Verify and Bench before any query.
  *
  * Cost: parquet footer reads only, no data jobs.
  */
object SchemaCanary {

  /** Temporal columns the corpus has historically shipped as TIMESTAMP,
    * tz-less TIMESTAMP_NTZ, or DATE — operators compare/extract on them
    * without epoch conversion, so any of the three is acceptable. */
  private def isTemporal(dt: DataType): Boolean =
    dt == TimestampType || dt.isInstanceOf[TimestampNTZType] || dt == DateType

  private final case class Want(col: String, ok: DataType => Boolean, desc: String)
  private def exact(c: String, t: DataType) = Want(c, _ == t, t.simpleString)
  private def temporal(c: String) = Want(c, isTemporal, "timestamp|timestamp_ntz|date")

  def check(spark: SparkSession, dir: String): Unit = {
    val drift = scala.collection.mutable.ListBuffer.empty[String]

    // schema is by-name: a table that cannot be READ (missing file, an
    // encoding normalizeEventTime rejects) becomes a named drift line
    // too — the canary's single exception is the one failure surface
    def audit(table: String, schema: => StructType, wants: Seq[Want]): Unit =
      scala.util.Try(schema) match {
        case scala.util.Failure(e) =>
          drift += s"$table: unreadable — ${
            Option(e.getMessage).flatMap(_.linesIterator.toSeq.headOption)
              .getOrElse(e.getClass.getName)}"
        case scala.util.Success(sch) => wants.foreach { w =>
          sch.find(_.name == w.col) match {
            case None => drift += s"$table.${w.col}: MISSING (expected ${w.desc})"
            case Some(f) if !w.ok(f.dataType) =>
              drift += s"$table.${w.col}: expected ${w.desc}, got ${f.dataType.simpleString}"
            case _ => ()
          }
        }
      }

    // events is audited POST-normalization: the reader owns encoding
    // drift (nanos-long / NTZ / TIMESTAMP all normalize to TIMESTAMP);
    // this asserts the contract every watermark and unix_micros call
    // downstream relies on.
    audit("events", Tables.events(spark, dir).schema, Seq(
      exact("event_id", LongType), exact("ts", TimestampType),
      exact("user_id", LongType), exact("event_type", StringType),
      exact("value", DoubleType), exact("props", StringType)))

    audit("documents", Tables.documents(spark, dir).schema, Seq(
      exact("doc_id", LongType), exact("text", StringType),
      exact("lang", StringType), exact("source", StringType),
      exact("n_chars", LongType)))

    audit("embeddings", Tables.embeddings(spark, dir).schema, Seq(
      exact("vec_id", LongType),
      Want("embedding", _ == ArrayType(FloatType), "array<float>"),
      exact("label", IntegerType)))

    audit("lineitem", Tables.lineitem(spark, dir).schema, Seq(
      exact("l_orderkey", LongType), exact("l_partkey", LongType),
      exact("l_suppkey", LongType), exact("l_linenumber", IntegerType),
      exact("l_quantity", DoubleType), exact("l_extendedprice", DoubleType),
      exact("l_discount", DoubleType), exact("l_returnflag", StringType),
      exact("l_linestatus", StringType), temporal("l_shipdate")))

    audit("orders", Tables.orders(spark, dir).schema, Seq(
      exact("o_orderkey", LongType), exact("o_custkey", LongType),
      exact("o_orderstatus", StringType), exact("o_totalprice", DoubleType),
      temporal("o_orderdate"), exact("o_orderpriority", StringType)))

    audit("region", Tables.region(spark, dir).schema, Seq(
      exact("r_regionkey", IntegerType), exact("r_name", StringType)))

    audit("nation", Tables.nation(spark, dir).schema, Seq(
      exact("n_nationkey", IntegerType), exact("n_name", StringType),
      exact("n_regionkey", IntegerType)))

    audit("customer", Tables.customer(spark, dir).schema, Seq(
      exact("c_custkey", LongType), exact("c_name", StringType),
      exact("c_nationkey", IntegerType), exact("c_acctbal", DoubleType),
      exact("c_mktsegment", StringType)))

    audit("supplier", Tables.supplier(spark, dir).schema, Seq(
      exact("s_suppkey", LongType), exact("s_name", StringType),
      exact("s_nationkey", IntegerType), exact("s_acctbal", DoubleType)))

    audit("part", Tables.part(spark, dir).schema, Seq(
      exact("p_partkey", LongType), exact("p_name", StringType),
      exact("p_brand", StringType), exact("p_type", StringType),
      exact("p_size", IntegerType), exact("p_retailprice", DoubleType)))

    if (drift.nonEmpty) throw new IllegalStateException(
      s"""corpus drift detected in $dir — the test corpus no longer matches
         |the engine's normalized schema contract (${drift.size} mismatch(es)):
         |  ${drift.mkString("\n  ")}
         |If the driver regenerated the corpus with a new encoding, extend
         |graft.sources.Tables' normalization (see Tables.normalizeEventTime)
         |rather than patching individual operators.""".stripMargin)
  }

  /** Harness-preamble form: name the drift LOUDLY on stderr but let the
    * sweep continue — queries on unaffected tables still produce green
    * rows, and affected ones fail as explicit per-query errors (Verify's
    * `__graft_err` sentinel) with this message as the root-cause banner.
    * Returns the drift message, if any, for the harness's error ledger. */
  def warn(spark: SparkSession, dir: String): Option[String] =
    try { check(spark, dir); None }
    catch { case e: Exception =>
      System.err.println(s"[schema-canary] ${e.getMessage}")
      Some(e.getMessage)
    }
}
