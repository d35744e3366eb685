package graft.streaming

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Shared machinery for multi-batch file-replay specs: the file stream
  * source processes oldest-mtime first, so a zone of single-file parquets
  * with staggered modification times + `maxFilesPerTrigger=1` forces a
  * deterministic micro-batch split.
  */
object ReplayFixtures {

  /** Write `df` as a single parquet FILE at dst with the given mtime. */
  def writeOne(df: DataFrame, dst: String, mtime: Long): Unit = {
    val stage = dst + "_stage"
    df.coalesce(1).write.parquet(stage)
    val part = new File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, Paths.get(dst))
    graft.core.FsUtil.deleteRecursively(stage)
    new File(dst).setLastModified(mtime)
  }
}
