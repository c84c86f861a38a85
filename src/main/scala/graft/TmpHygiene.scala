package graft

/** The ONE temp-dir hygiene implementation (review r15: the first cut
  * of VERDICT r14 item 2 grew three parallel copies — a recursive
  * delete in StreamQueries, and two exit-hook registries in
  * InfraQueries and the test scaffolding — whose deletion semantics
  * could silently drift). Everything that creates a transient
  * directory routes through here:
  *
  *   - [[rmTree]]: depth-first recursive delete, exists-guarded and
  *     idempotent (scoped gate cleanup calls it again in `finally`
  *     after an early reclaim);
  *   - [[deleteAtExit]]: register a path for deletion when THIS JVM
  *     exits — for dirs that must outlive a single query (pid-keyed
  *     layout copies reused across bench reps, spec scaffolding) but
  *     not the process. One shutdown hook, one registry.
  */
object TmpHygiene {

  /** Base directory for TRANSIENT engine scratch (chain-artifact faces,
    * format round-trip copies, stream sink outputs): the fastest
    * writable local volume. Order: `SPARK_GRAFT_SCRATCH` (production —
    * point at a LOCAL fast-SSD path; created on first use if absent;
    * java.nio, so not a DFS URI), else /dev/shm when writable (tmpfs:
    * these dirs hold kilobytes-to-megabytes of per-gate faces whose
    * write/rename/fsync latency on a journaled disk FS is pure harness
    * overhead — the same rationale as the streaming checkpoint
    * placement, guide §6), else `java.io.tmpdir`. Scratch here is
    * always transient: every consumer deletes via [[rmTree]] scopes or
    * [[deleteAtExit]], so tmpfs residency is bounded by a session's
    * live gates. */
  lazy val scratchBase: String =
    sys.env.get("SPARK_GRAFT_SCRATCH")
      .orElse {
        val shm = java.nio.file.Paths.get("/dev/shm")
        if (java.nio.file.Files.isWritable(shm)) Some("/dev/shm") else None
      }
      .getOrElse(System.getProperty("java.io.tmpdir"))

  /** Fresh transient dir under [[scratchBase]] (callers own deletion,
    * via scope cleanup or [[deleteAtExit]]). Creates the base first:
    * an operator-supplied SPARK_GRAFT_SCRATCH that does not exist yet
    * must not turn the first gate query into a NoSuchFileException. */
  def scratchDir(prefix: String): String = {
    val base = java.nio.file.Paths.get(scratchBase)
    java.nio.file.Files.createDirectories(base)
    java.nio.file.Files.createTempDirectory(base, prefix).toString
  }

  def rmTree(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private val exitDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      exitDirs.forEach(rmTree(_))
    }))
  }

  def deleteAtExit(dir: String): String = { exitDirs.add(dir); dir }

  /** Paths currently registered for exit deletion — lets a hygiene
    * spec distinguish "leaked" from "dies with the JVM by contract". */
  def registered: Set[String] = {
    import scala.jdk.CollectionConverters._
    exitDirs.asScala.toSet
  }
}
