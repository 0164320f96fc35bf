package graft

/** Per-JVM unique scratch space for queries that stage intermediate
  * files (CSV/JSON round-trips, file-source streams). Rooted under
  * `java.io.tmpdir`, so concurrent Verify/Bench runs in separate JVMs
  * never collide and nothing depends on this checkout's layout. */
object Staging {
  lazy val root: String =
    java.nio.file.Files.createTempDirectory("graft_stage_").toString

  def dir(name: String): String = s"$root/$name"
}
