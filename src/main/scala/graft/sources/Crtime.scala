package graft.sources

import java.nio.file.{Files, Path}
import java.nio.file.attribute.BasicFileAttributes

/** File creation time in epoch ms — the `--start crtime` CLI shorthand
  * (`client/datalake/crtime.py:24-61`, `cli.py:153-158`). The reference
  * needs a setuid helper binary to read btime on Linux; the JVM exposes it
  * through BasicFileAttributes (falling back to mtime where the filesystem
  * does not track creation time, which Linux ext4 reports as such).
  */
object Crtime {
  def apply(path: Path): Long = {
    val attrs = Files.readAttributes(path, classOf[BasicFileAttributes])
    val created = attrs.creationTime.toMillis
    if (created > 0) created else attrs.lastModifiedTime.toMillis
  }
}
