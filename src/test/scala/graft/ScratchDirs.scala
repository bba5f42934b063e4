package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Shared test helpers for inspecting the layouts sink/source queries
  * write into the Tables scratch root.
  */
object ScratchDirs {

  /** Directory listing with the stream closed (the JDK leaks a directory
    * fd otherwise — same guard GraftCatalog uses).
    */
  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  /** The scratch directory a just-run query created for `prefix` — the
    * highest sequence number (scratchDir zero-pads, so name order is
    * creation order).
    */
  def latestScratch(prefix: String): Path =
    listDir(Tables.scratchRootForTest)
      .filter(_.getFileName.toString.startsWith(prefix)).max
}
