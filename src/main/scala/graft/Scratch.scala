package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Process-lifetime scratch directories for explicit parquet
  * checkpoints ([[graft.ext.Curation.curatedDocs]]) and stress
  * harness corpora. Each dir is unique per call (concurrent gate /
  * bench invocations never collide) and recursively deleted by a JVM
  * shutdown hook, so repeated runs don't accumulate dead checkpoint
  * dirs in the temp filesystem.
  */
object Scratch {

  def tempDir(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    deleteOnExit(dir)
    dir.toString
  }

  private def deleteOnExit(dir: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      if (Files.exists(dir)) {
        Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }))
}
