package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable POS tagging (SURVEY §2.8 V8 + §2.2 P3) — the reference's
  * UDPipe annotation stage (ref 02_build_models.R:69-85) behind a trait:
  * the environment is zero-egress, so the default implementation is a
  * deterministic suffix-heuristic rule tagger; a real UDPipe/SparkNLP
  * tagger plugs in via the same trait without touching the pipeline.
  */
trait PosTagger extends Serializable {
  /** UPOS tag for one (already cleaned, lowercase) token. */
  def tag(token: String): String
}

/** Factory indirection so heavyweight taggers (model files) are
  * constructed ON THE EXECUTOR, once per JVM — the O4 per-worker-init
  * pattern (ref 02_test.R:44-58 reloads the UDPipe model per worker). */
trait PosTaggerFactory extends Serializable {
  def create(): PosTagger
}

/** Deterministic suffix-rule tagger. The SAME rule set exists in three
  * forms that must agree token-for-token (tested in PosStageSpec):
  * scala ([[RulePosTagger.tag]]), Catalyst Column ([[RulePosTagger.tagCol]],
  * codegen'd — the hot path), and DuckDB SQL ([[RulePosTagger.tagSql]],
  * the oracle). */
object RulePosTagger extends PosTagger {
  // anchored suffix alternations — identical regex strings on all sides.
  // able/ible need a higher length floor ("table" is a noun).
  private val VerbSuffix = "(ing|ed|ise|ize|ify)$"
  private val AdvSuffix = "ly$"
  private val AdjSuffix = "(ous|ful|ive|ic|ish)$"
  private val AdjLongSuffix = "(able|ible)$"

  override def tag(token: String): String =
    if (token.length > 4 && VerbSuffix.r.findFirstIn(token).isDefined) "VERB"
    else if (token.length > 3 && AdvSuffix.r.findFirstIn(token).isDefined) "ADV"
    else if (token.length > 4 && AdjSuffix.r.findFirstIn(token).isDefined) "ADJ"
    else if (token.length > 5 && AdjLongSuffix.r.findFirstIn(token).isDefined) "ADJ"
    else "NOUN"

  /** Column form — pure codegen'd CASE chain, no UDF. */
  def tagCol(t: Column): Column =
    when(length(t) > 4 && t.rlike(VerbSuffix), "VERB")
      .when(length(t) > 3 && t.rlike(AdvSuffix), "ADV")
      .when(length(t) > 4 && t.rlike(AdjSuffix), "ADJ")
      .when(length(t) > 5 && t.rlike(AdjLongSuffix), "ADJ")
      .otherwise("NOUN")

  /** DuckDB CASE form over a token expression. */
  def tagSql(t: String): String =
    s"""CASE WHEN length($t) > 4 AND regexp_matches($t, '$VerbSuffix') THEN 'VERB'
       |     WHEN length($t) > 3 AND regexp_matches($t, '$AdvSuffix') THEN 'ADV'
       |     WHEN length($t) > 4 AND regexp_matches($t, '$AdjSuffix') THEN 'ADJ'
       |     WHEN length($t) > 5 AND regexp_matches($t, '$AdjLongSuffix') THEN 'ADJ'
       |     ELSE 'NOUN' END""".stripMargin
}

/** Factory for the rule tagger; counts instantiations so the
  * once-per-executor guarantee is testable. A case class: the per-JVM
  * cache in [[PosStage]] is keyed by factory, and each task deserializes
  * its own factory copy — structural equality makes those copies hit the
  * same cache entry (identity equality would create one tagger per TASK). */
case class RulePosTaggerFactory() extends PosTaggerFactory {
  override def create(): PosTagger = {
    RulePosTaggerFactory.created.incrementAndGet()
    RulePosTagger
  }
}
object RulePosTaggerFactory {
  val created = new java.util.concurrent.atomic.AtomicInteger(0)
}
