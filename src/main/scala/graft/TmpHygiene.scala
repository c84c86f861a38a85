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
