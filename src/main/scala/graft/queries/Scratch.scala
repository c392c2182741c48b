package graft.queries

/** Scratch roots for queries that run a standing-table lifecycle
  * in-query (qe10's index build, ql13's view refreshes). Each invocation
  * needs a FRESH directory — reusing one would hit the snapshot pointers'
  * replay no-op and serve stale state — so per-invocation temp dirs are
  * correct; this helper just makes them leave nothing behind (one
  * recursive-delete shutdown hook per dir, trivially sized).
  */
private[graft] object Scratch {
  def dir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }
}
