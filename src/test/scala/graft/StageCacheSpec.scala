package graft

/** Per-JVM stage cache lifecycle: build → cleanup (always-run) → rebuild. */
class StageCacheSpec extends SparkSpec {

  test("cleanupStages deletes every materialized stage dir and the next query rebuilds") {
    // force at least one staged artifact into existence
    val before = SparkEntry.queries("q_dedup_minhash")(spark, sf001).count()
    val stageRoot = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_stage")
    assert(stageRoot.exists() && stageRoot.listFiles().nonEmpty,
      "expected stage dirs on disk after a staged query")
    SparkEntry.cleanupStages()
    assert(!stageRoot.exists(),
      "cleanup must remove the stage root, stale prior-JVM dirs included")
    // cache memo cleared → the same query transparently rebuilds
    assert(SparkEntry.queries("q_dedup_minhash")(spark, sf001).count() === before)
  }
}
