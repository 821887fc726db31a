package graft

/** Per-JVM scratch directories for derived state (IVF index layouts,
  * format round-trip spool dirs). One shared implementation — Similarity
  * and Formats used to carry verbatim copies of the nonce + shutdown-hook
  * logic, two places to keep the deletion rules in sync.
  *
  * Why per-JVM paths at all: a layout keyed by input alone races across
  * PROCESSES — a second JVM's overwrite deletes the exact files a first
  * JVM's lazy parquet snapshot still references (observed as
  * FAILED_READ_FILE when a probe run started beside a full verify). The
  * derived state is per-JVM (the memo is per-JVM; nothing reuses another
  * process's layout), so the path carries a per-JVM nonce.
  *
  * Cleanup has two layers:
  *  - a shutdown hook removes THIS JVM's dirs — matched by the full
  *    `graft-` prefix AND the nonce, never by the bare nonce (an 8-hex
  *    substring alone could match an unrelated /tmp entry);
  *  - a startup sweep GCs `graft-*` dirs from DEAD JVMs (SIGKILL/OOM in
  *    bench loops never runs the hook). Age-gated at [[StaleAfterMs]]:
  *    generous enough that no live JVM in this harness approaches it
  *    (bench + test JVMs live minutes), small enough that the next
  *    round's first JVM reclaims the previous round's leaks.
  */
object Scratch {

  /** A dir untouched this long is assumed to belong to a dead JVM. */
  val StaleAfterMs: Long = 3L * 60 * 60 * 1000

  private def rmTree(f: java.io.File): Unit = {
    val c = f.listFiles(); if (c != null) c.foreach(rmTree)
    f.delete(); ()
  }

  private def tmpRoot = new java.io.File(sys.props("java.io.tmpdir"))

  /** Pid embedded in a scratch dir name (`p<pid>x` inside the tag). */
  private val PidInTag = """-p(\d+)x""".r

  /** True iff the pid named in the dir's tag is still running AND still
    * looks like the JVM that created the dir (Linux /proc probe; the
    * only platform this harness targets). Bare /proc existence is not
    * enough: after PID reuse, an unrelated long-lived process with the
    * recycled pid would keep a dead JVM's scratch exempt from the sweep
    * forever (this gate is AND'd with the age gate, so the age gate
    * could never reclaim it). The cmdline probe shrinks that to the
    * conscious residual: a recycled pid that IS another java process —
    * rare enough, and bounded, because that JVM's own exit re-arms the
    * age gate. An unreadable cmdline (permissions, kernel thread) is
    * treated as alive — when in doubt, never delete: a wrongly swept
    * live dir reintroduces the cross-process FAILED_READ_FILE race this
    * object exists to prevent, while a wrongly kept dead dir is only a
    * bounded /tmp leak. Dirs from the pre-pid naming scheme have no
    * match and fall back to the age gate alone. */
  private def ownerAlive(name: String): Boolean =
    PidInTag.findFirstMatchIn(name).exists { m =>
      val pid = m.group(1)
      new java.io.File(s"/proc/$pid").exists() && {
        try {
          val cmd = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/$pid/cmdline")), "UTF-8")
          // argv entries are NUL-separated; argv[0] of every JVM this
          // harness spawns is "java" or a path ending in "/java".
          cmd.split('\u0000').headOption
            .exists(a => a == "java" || a.endsWith("/java"))
        } catch { case _: Exception => true }
      }
    }

  /** Remove graft-* scratch from dead JVMs. Age-gated on lastModified of
    * the top-level dir, AND pid-gated: a dir whose embedded owner pid is
    * still alive is never touched, however old — a long scale-stress JVM
    * (hours) must not lose its scratch to a freshly started sweeper,
    * which would reintroduce the cross-process FAILED_READ_FILE race
    * this object exists to prevent. */
  private def sweepStale(exceptTag: String): Unit = {
    val now = System.currentTimeMillis()
    val entries = tmpRoot.listFiles()
    if (entries != null) entries
      .filter(f => f.getName.startsWith("graft-") &&
        !f.getName.contains(s"-$exceptTag-") &&
        now - f.lastModified() > StaleAfterMs &&
        !ownerAlive(f.getName))
      .foreach(rmTree)
  }

  /** Per-JVM nonce carrying the owning pid (`p<pid>x<uuid8>`), so the
    * stale-sweep can check /proc liveness; first touch installs the
    * shutdown hook and sweeps stale dirs left by killed JVMs. */
  lazy val jvmTag: String = {
    val t = s"p${ProcessHandle.current().pid()}x" +
      java.util.UUID.randomUUID().toString.take(8)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      val entries = tmpRoot.listFiles()
      if (entries != null) entries
        .filter(f => f.getName.startsWith("graft-") &&
          f.getName.contains(s"-$t-"))
        .foreach(rmTree)
    }))
    try sweepStale(t) catch { case _: Exception => () }
    t
  }

  /** Scratch path `<tmp>/<prefix>-<jvmTag>-<tag>`. `prefix` must start
    * with "graft" so both cleanup layers can find it. */
  def dir(prefix: String, tag: String): String = {
    require(prefix.startsWith("graft"),
      s"scratch prefix must start with 'graft' for cleanup: $prefix")
    new java.io.File(tmpRoot, s"$prefix-$jvmTag-$tag").toString
  }
}
