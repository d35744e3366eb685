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
      import scala.util.Using
      // Files.walk holds directory handles until closed — Using guarantees
      // release even when a delete throws (this runs per-query in Verify).
      val paths = Using.resource(Files.walk(root))(_.iterator().asScala.toSeq)
      paths.reverse.foreach(p => Files.deleteIfExists(p))
    }
  }
}
