package graft.util

/** Temp directories deleted at JVM exit — the ONE copy of the
  * createTempDirectory + shutdown-hook + recursive-delete logic (Bench,
  * Prof and the test harness all stage multi-hundred-MB corpora/indexes;
  * bare temp dirs leaked ~48 GB of /tmp across rounds of runs before
  * this existed).
  */
object Tmp {
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(): Unit
  }

  /** A fresh temp dir, removed when this JVM exits. */
  def dir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(tag)
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree(p.toFile)))
    p.toString
  }
}
