package graft

import scala.sys.process._

/** Same-session A/B bench (VERDICT r8 missing #2): every round since r6 has
  * re-litigated whether streaming-median movement between rounds was a code
  * regression or box noise, because the two rounds' numbers came from
  * different sessions on a shared machine. This main makes the comparison a
  * COMMITTED ARTIFACT: it checks out two commits into scratch worktrees,
  * runs each one's own `graft.Bench` back-to-back on the same box, and
  * writes both series (verbatim child JSON) to `bench_ab.json`.
  *
  * Both sides run as identical cold sbt-launched JVMs — the same warmup
  * query, the same reps/medians — so JVM-warmup asymmetry does not favor
  * either commit. Scale sections are skipped (`SCALEUP_FACTOR=1`, scale
  * dir = primary dir): the A/B question is per-query medians at the
  * primary SF, not slopes.
  *
  * Usage: `sbt "runMain graft.BenchAB <baseCommit> [headCommit]"`
  * (headCommit defaults to HEAD). Env honored: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_REPS (default 3), SPARK_GRAFT_ONLY (forwarded to a head
  * side that supports it; base sides predating the filter run the full
  * registry), SPARK_GRAFT_AB_OUT (default bench_ab.json).
  */
object BenchAB {

  private def sh(cmd: Seq[String], cwd: Option[java.io.File] = None,
                 env: Seq[(String, String)] = Seq.empty): Int =
    Process(cmd, cwd, env: _*).!(ProcessLogger(_ => (), e => System.err.println(e)))

  private def shOut(cmd: Seq[String]): String =
    Process(cmd).!!.trim

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchAB <baseCommit> [headCommit]")
    val base = shOut(Seq("git", "rev-parse", args(0)))
    val head = shOut(Seq("git", "rev-parse", if (args.length > 1) args(1) else "HEAD"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_AB_OUT", "bench_ab.json")

    def run(commit: String): String = {
      val wt = java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), s"graft_ab_$commit").toString
      sh(Seq("git", "worktree", "remove", "--force", wt))
      require(sh(Seq("git", "worktree", "add", "--force", "--detach", wt, commit)) == 0,
        s"worktree add failed for $commit")
      val childOut = s"$wt/ab_out.json"
      val env = Seq(
        "SPARK_GRAFT_SF_DIR" -> sfDir,
        "SPARK_GRAFT_REPS" -> reps,
        // Skip both scale sections: secondary dir == primary is a no-op,
        // factor 1 disables the derived 10x build.
        "SPARK_GRAFT_SCALE_DIR" -> sfDir,
        "SPARK_GRAFT_SCALEUP_FACTOR" -> "1",
        "SPARK_GRAFT_BENCH_OUT" -> childOut) ++
        sys.env.get("SPARK_GRAFT_ONLY").map("SPARK_GRAFT_ONLY" -> _) ++
        sys.env.get("SPARK_GRAFT_CPUS").map("SPARK_GRAFT_CPUS" -> _)
      val rc = sh(Seq("sbt", "-batch", "runMain graft.Bench"),
        Some(new java.io.File(wt)), env)
      val json =
        if (rc == 0 && java.nio.file.Files.exists(java.nio.file.Paths.get(childOut)))
          java.nio.file.Files.readString(java.nio.file.Paths.get(childOut)).trim
        else s"""{"err":"bench rc=$rc for $commit"}"""
      sh(Seq("git", "worktree", "remove", "--force", wt))
      json
    }

    // Base first, head second, back-to-back on the same box — the ordering
    // is fixed so artifacts are comparable across rounds.
    val baseJson = run(base)
    val headJson = run(head)
    val out =
      s"""{"sf":"$sfDir","reps":$reps,"base":{"commit":"$base","bench":$baseJson},"head":{"commit":"$head","bench":$headJson}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $outFile (base=$base head=$head)")
  }
}
