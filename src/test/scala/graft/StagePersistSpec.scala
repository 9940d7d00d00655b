package graft

import org.apache.commons.io.FileUtils

/** The durable cross-run stage store: with `graft.stage.root` set to
  * a persistent directory, staged index artifacts survive the JVM and
  * a later application DELTAS against them instead of rebuilding —
  * the cross-run analogue of the reference's staging+merge load
  * (/root/reference/src/load.py:30-43). `SparkEntry.resetJvmMemos()`
  * simulates the fresh JVM (all in-memory memos gone, disk intact);
  * the manifest fingerprint is what vouches for the reused artifacts,
  * so the spec also proves a CHANGED input wipes and rebuilds. */
class StagePersistSpec extends SparkSpec {

  test("persistent stage root: a fresh JVM reuses yesterday's staged index " +
    "byte-for-byte; a changed input fingerprint wipes and rebuilds") {
    val root = java.nio.file.Files.createTempDirectory("graft_persist").toFile
    // dataset COPY: the invalidation leg touches an input file's
    // mtime, which must never happen to the shared read-only testdata
    val data = java.nio.file.Files.createTempDirectory("graft_persist_data").toFile
    FileUtils.copyDirectory(new java.io.File(sf001), data)
    val d = data.getAbsolutePath
    val run = SparkEntry.queries("q_ann_ivf_delta")
    sys.props("graft.stage.root") = root.getAbsolutePath
    // drop memos accumulated by other suites on the tmp tier so the
    // first run below builds cleanly under the persistent root
    SparkEntry.resetJvmMemos()
    try {
      val r1 = run(spark, d).collect().map(_.toString).sorted.toSeq
      assert(r1.nonEmpty)
      val statsSucc = new java.io.File(
        s"${root.getAbsolutePath}/graft_stage/${d.hashCode.toHexString}/ivfd_stats/_SUCCESS")
      assert(statsSucc.exists(), "staged index must land under the persistent root")
      val manifest = new java.io.File(
        s"${root.getAbsolutePath}/graft_stage/${d.hashCode.toHexString}/_manifest.json")
      assert(manifest.exists(), "the dataset manifest must be written")
      val builtAt = statsSucc.lastModified()

      // "yesterday's run ended": a fresh JVM knows nothing in memory
      SparkEntry.resetJvmMemos()
      val r2 = run(spark, d).collect().map(_.toString).sorted.toSeq
      assert(r2 === r1, "cross-JVM delta must equal the original build")
      assert(statsSucc.lastModified() === builtAt,
        "a valid manifest must let the fresh JVM ADOPT the staged index, not rebuild it")

      // input change: same content would be a lie here — the
      // fingerprint hashes (path, length, mtime), so bumping an
      // mtime is exactly the upstream-rewrite signal
      val anyInput = new java.io.File(data, "embeddings.parquet")
      assert(anyInput.exists())
      assert(anyInput.setLastModified(anyInput.lastModified() + 2000))
      SparkEntry.resetJvmMemos()
      val r3 = run(spark, d).collect().map(_.toString).sorted.toSeq
      assert(r3 === r1, "rebuild from identical content must reproduce the result")
      assert(statsSucc.lastModified() > builtAt,
        "a changed input fingerprint must wipe the stage dir and rebuild")
    } finally {
      sys.props.remove("graft.stage.root")
      SparkEntry.resetJvmMemos()
      SparkEntry.cleanupStages()
      try FileUtils.deleteDirectory(root) catch { case _: Throwable => () }
      try FileUtils.deleteDirectory(data) catch { case _: Throwable => () }
    }
  }
}
