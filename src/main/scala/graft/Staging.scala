package graft

/** Per-JVM unique scratch space for queries that stage intermediate
  * files (CSV/JSON round-trips, file-source streams). Rooted under
  * `java.io.tmpdir`, so concurrent Verify/Bench runs in separate JVMs
  * never collide and nothing depends on this checkout's layout. */
object Staging {
  lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_stage_")
    // staged copies of the test tables are hundreds of MB per run at
    // sf0.1 — clean the whole tree up when the JVM exits
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      } catch { case _: Throwable => () }))
    p.toString
  }

  def dir(name: String): String = s"$root/$name"
}
