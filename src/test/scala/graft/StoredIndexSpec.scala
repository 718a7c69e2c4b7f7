package graft

import graft.api.LshIndexStore
import graft.operators.{BpeOps, DedupOps}
import org.apache.spark.sql.functions._

/** d20 (stored LSH band index) and t22 (retrain-drift card): artifact
  * round-trip fidelity and the cards' cross-foot invariants. */
class StoredIndexSpec extends SparkSpec {
  import spark.implicits._

  test("LshIndexStore round-trips a band index exactly; loud on an absent store") {
    val idx = Seq((1L, 0, 11L), (1L, 1, 12L), (2L, 0, 11L))
      .toDF("doc_id", "band", "bucket")
    val dir = LshIndexStore.versionedDir(
      java.nio.file.Files.createTempDirectory("lsh").toString,
      8, java.time.LocalDate.ofEpochDay(0))
    LshIndexStore.save(dir, idx)
    val got = LshIndexStore.load(spark, dir)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 0, 11L), (1L, 1, 12L), (2L, 0, 11L)))
    intercept[Exception] {
      LshIndexStore.load(spark,
        java.nio.file.Files.createTempDirectory("lsh2").toString + "/none")
    }
  }

  test("d20 stored-index probe equals the in-session d11 probe row-for-row") {
    val a = DedupOps.incrementalNeardup(spark, sfTiny).collect().toSeq
    val b = DedupOps.incrementalNeardupStored(spark, sfTiny).collect().toSeq
    assert(a.nonEmpty)
    assert(b === a)
  }

  test("t22 cross-foots with t18 and its ratios are sane") {
    val card = BpeOps.bpeRetrainDrift(spark, sfTiny).cache()
    assert(card.count() > 0)
    // shipped-side totals must equal t18's corpus totals (same
    // tokenizer, same pieces relation)
    val shipped = card.agg(sum(col("tokens_shipped"))).head().getLong(0)
    val t18 = BpeOps.bpeRetokenize(spark, sfTiny)
      .agg(sum(col("n_bpe_tokens"))).head().getLong(0)
    assert(shipped === t18)
    // every word yields >= 1 piece under both vocabularies
    assert(card.filter(col("ppw_shipped") < 1.0 ||
      col("ppw_retrain") < 1.0).count() === 0)
    // two slices of one corpus train similar tokenizers — drift is a
    // ratio near 1, not a degenerate collapse
    assert(card.filter(col("retrain_drift") < 0.5 ||
      col("retrain_drift") > 2.0).count() === 0)
  }
}
