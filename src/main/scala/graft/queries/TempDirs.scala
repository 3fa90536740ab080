package graft.queries

/** Temp-dir management for the per-scale-dir query caches. */
private[queries] object TempDirs {

  /** A temp dir registered for recursive deletion at JVM shutdown — the
    * ONE spelling of the walk-and-delete hook. Three verbatim hook
    * copies had drifted from six cache sites with no hook at all, which
    * leaked corpus-sized index/store artifacts into the system temp dir
    * on every battery run. */
  def managed(prefix: String): java.nio.file.Path = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(tmp))
        java.nio.file.Files.walk(tmp)
          .sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }))
    tmp
  }
}
