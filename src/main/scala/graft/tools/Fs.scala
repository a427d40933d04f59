package graft.tools

/** Tiny shared fs helper for the bench mains (GBs of temp parquet at
  * soak scale on a shared VM — never leave them behind, and close the
  * walk stream: its directory handles otherwise stay open until GC).
  */
object Fs {
  def deleteRecursively(dir: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(dir)
    try walk.iterator().asScala.toSeq
      .sortBy(-_.getNameCount)
      .foreach(java.nio.file.Files.deleteIfExists(_))
    finally walk.close()
  }
}
