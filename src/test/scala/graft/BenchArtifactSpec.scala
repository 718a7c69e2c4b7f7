package graft

/** The bench artifact's self-diagnosis sections (r17 verdict ask #5):
  * the r17 driver sweep showed a 12× m-family anomaly that could not
  * be adjudicated from bench_out.json because memo behavior and
  * family-boundary footprints lived on stderr. The artifact now
  * carries both — these specs pin the schema so a refactor can't
  * silently drop the diagnosing fields again. */
class BenchArtifactSpec extends SparkSpec {

  test("renderLine emits memo + footprints sections as valid JSON (r17 verdict ask #5)") {
    val results: Seq[Bench.QueryStats] = Seq(
      ("m07_lda", 1.5, 1.0, 15.0, 15.0, 0, 2L, 3L),
      ("t01_clean", 0.2, 0.1, 0.3, 0.3, 1, 0L, 0L))
    val fps = Seq(
      ("m", "done", Map("cached_rdds" -> 4L, "storage_mem_mb" -> 100L,
        "storage_disk_mb" -> 0L, "heap_used_mb" -> 900L)),
      ("t", "start", Map("cached_rdds" -> 0L, "storage_mem_mb" -> 0L,
        "storage_disk_mb" -> 0L, "heap_used_mb" -> 400L)))
    val line = Bench.renderLine(results, fps, runsPerQuery = 3,
      compiled = 50L, cacheMax = 8192L, sfDir = "/x/sf0.1")
    // the line parses as ONE json object with every section present
    import spark.implicits._
    val df = spark.read
      .option("columnNameOfCorruptRecord", "_corrupt").json(Seq(line).toDS())
    val fields = df.schema.fieldNames.toSet
    assert(!fields.contains("_corrupt"), s"artifact line is not JSON: $line")
    for (f <- Seq("metric", "value", "queries", "spread", "first_total",
        "flaky", "failed", "memo", "footprints", "codegen_cache_canary",
        "sf"))
      assert(fields.contains(f), s"artifact lost the '$f' section")
    // the memo section attributes builds to the query that paid them —
    // the m-family rebuild signature the r17 adjudication needed —
    // and zero-memo queries don't bloat a 213-row artifact
    assert(line.contains(""""memo":{"m07_lda":{"hit":2,"miss":3}}"""))
    assert(!line.contains(""""t01_clean":{"hit""""))
    // footprints carry (family, boundary, the four metrics)
    assert(line.contains(
      """"footprints":[{"family":"m","at":"done","cached_rdds":4"""))
    assert(line.contains(""""heap_used_mb":400"""))
    // aggregates unchanged by the new sections
    assert(line.contains(""""failed":[]"""))
    assert(line.contains(""""flaky":{"t01_clean":1}"""))
  }

  test("Intermediates.stats counts misses on build, hits on reuse") {
    val (h0, m0) = graft.api.Intermediates.stats()
    val key = s"bench_artifact_spec|${System.nanoTime()}"
    graft.api.Intermediates.memo(spark, key)(42)
    val (h1, m1) = graft.api.Intermediates.stats()
    assert(m1 - m0 >= 1, "a fresh build did not count as a miss")
    graft.api.Intermediates.memo(spark, key)(sys.error("must not rebuild"))
    val (h2, m2) = graft.api.Intermediates.stats()
    assert(h2 - h1 >= 1, "a memo hit did not count as a hit")
    assert(m2 === m1, "a memo hit counted as a miss")
  }
}
