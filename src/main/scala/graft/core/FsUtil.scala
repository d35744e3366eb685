package graft.core

import java.nio.file.{Files, Path, Paths}

/** Local-filesystem helpers for fixture/test zones (driver-side only —
  * never used inside a distributed operator).
  */
object FsUtil {
  def deleteRecursively(dir: String): Unit = {
    val root: Path = Paths.get(dir)
    if (Files.exists(root)) {
      import scala.jdk.CollectionConverters._
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
