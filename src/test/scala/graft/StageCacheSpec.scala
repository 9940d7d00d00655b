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

  test("a stage dir without its _SUCCESS marker is rebuilt, not reused") {
    val before = SparkEntry.queries("q_dedup_minhash")(spark, sf001).count()
    val stageRoot = new java.io.File(s"${sys.props("java.io.tmpdir")}/graft_stage")
    val markers = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(stageRoot).filter(_.getName == "_SUCCESS")
    }
    assert(markers.nonEmpty, "committed parquet stages must carry _SUCCESS")
    // simulate a truncated/in-flight overwrite: the commit marker is
    // gone but the dir (and the JVM memo entry) remain
    markers.foreach(m => assert(m.delete()))
    assert(SparkEntry.queries("q_dedup_minhash")(spark, sf001).count() === before,
      "incomplete stage dirs must transparently rebuild")
    val rewritten = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(stageRoot).count(_.getName == "_SUCCESS")
    }
    assert(rewritten === markers.size, "rebuild must recommit every stage")
  }
}
