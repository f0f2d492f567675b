package graft

/** Shared helpers for the benchmark mains (Bench / ScaleBench /
  * KneeBench). */
object BenchUtil {

  /** The git commit the benchmark binary was measured on, embedded in
    * every artifact JSON (VERDICT r8 item 3: SCALE_r8.json was labeled
    * "final code" but predated two code commits — an artifact must
    * carry the SHA it measured so `tools/check_artifacts.py` can
    * reject any that no longer matches HEAD at round end). Appends
    * `-dirty` when the working tree has uncommitted changes, so a
    * measurement over unpublished code is visibly unciteable. Returns
    * "unknown" outside a git checkout rather than failing the bench. */
  def gitHead(): String =
    try {
      def run(args: String*): String = {
        val p = new ProcessBuilder(args: _*)
          .redirectErrorStream(false).start()
        val out = new String(p.getInputStream.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        p.waitFor()
        out
      }
      val sha = run("git", "rev-parse", "HEAD")
      // -uno: untracked files (log drafts, scratch artifacts) cannot
      // change what a compiled bench binary measures — only TRACKED
      // modifications mark the measurement dirty
      if (sha.isEmpty || sha.contains(" ")) "unknown"
      else if (run("git", "status", "--porcelain", "-uno").nonEmpty)
        s"$sha-dirty"
      else sha
    } catch { case _: Exception => "unknown" }
}
