package graft.tools

/** SIGKILL orchestrator for the crash-recovery rehearsal: runs
  * [[StreamRehearsal]] as forked child JVMs against one shared workdir
  * and, for each streaming leg in turn, destroys the child with SIGKILL
  * (`Process.destroyForcibly`) the moment the leg prints its
  * `READY_TO_KILL` marker mid-run — a genuinely dead JVM (no shutdown
  * hooks, no stop() cleanup, temp/state files left on disk), not an
  * in-process `query.stop()`. The next child run resumes the killed
  * leg from its checkpoint, must replay ≥1 data batch (asserted in the
  * child), re-runs the leg's conservation/equality requires, and only
  * then marks it done; a final clean run completes the last leg and
  * writes the ledger with `"kill":"fork_sigkill"`.
  *
  * Child launch: same `java` binary, same JVM args (add-opens, -Xmx),
  * same classpath as this process — which is why this main must itself
  * run forked (`run / fork := true` in build.sbt makes
  * `java.class.path` the real application classpath).
  *
  *   SPARK_GRAFT_STATE=rocksdb sbt "runMain
  *     graft.tools.StreamRehearsalForked /tmp/sf10
  *     bench/rehearsal_recovery_forked.json 4"
  */
object StreamRehearsalForked {
  private val Legs = Seq(
    "partitioned_sink", "latest_state", "windowed_stats", "interval_join")

  def main(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val wd = java.nio.file.Files
      .createTempDirectory("graft-rehearsal-fork-").toString
    val javaBin = ProcessHandle.current().info().command()
      .orElse("java")
    val jvmArgs = java.lang.management.ManagementFactory
      .getRuntimeMXBean.getInputArguments.asScala.toSeq
    val cp = System.getProperty("java.class.path")

    def launch(extraEnv: Map[String, String]): Process = {
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", cp, "graft.tools.StreamRehearsal") ++ args.toSeq
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      val env = pb.environment()
      // never inherit a stale arming from this process's own env
      env.remove("SPARK_GRAFT_KILL")
      env.remove("SPARK_GRAFT_KILL_LEG")
      env.put("SPARK_GRAFT_WORKDIR", wd)
      extraEnv.foreach { case (k, v) => env.put(k, v) }
      pb.start()
    }

    /** Stream child stdout through ours; if `killOn` is set, SIGKILL the
      * child at the marker line and return true. Returns whether the
      * kill fired.
      */
    def drive(p: Process, killOn: Option[String]): Boolean = {
      val rd = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var killed = false
      var line = rd.readLine()
      while (line != null) {
        println(s"[child] $line")
        if (!killed && killOn.exists(line.contains)) {
          p.destroyForcibly()
          killed = true
        }
        line = try rd.readLine() catch { case _: java.io.IOException => null }
      }
      p.waitFor()
      killed
    }

    for (leg <- Legs) {
      println(s"[fork] launching child armed to die mid-$leg (workdir=$wd)")
      val p = launch(Map(
        "SPARK_GRAFT_KILL" -> sys.env.getOrElse("SPARK_GRAFT_KILL", "mid"),
        "SPARK_GRAFT_KILL_LEG" -> leg))
      val killed = drive(p, Some(s"READY_TO_KILL leg=$leg"))
      require(killed,
        s"child exited (code ${p.exitValue()}) before reaching the kill " +
          s"point for $leg — no SIGKILL was delivered")
      println(s"[fork] SIGKILLed child pid=${p.pid()} mid-$leg " +
        s"(exit ${p.exitValue()})")
    }

    println("[fork] final clean run: resume last killed leg, write ledger")
    val fin = launch(Map.empty)
    drive(fin, None)
    require(fin.exitValue() == 0,
      s"final recovery run failed with exit ${fin.exitValue()}")
    // recovery proven and the ledger written — release the workdir
    // (kept on failure above for post-mortem)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(wd))
    println(s"[fork] done — ${Legs.size} SIGKILL+resume cycles green")
  }
}
