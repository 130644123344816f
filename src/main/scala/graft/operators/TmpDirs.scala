package graft.operators

/** /tmp hygiene for per-pid scratch and index directories.
  *
  * The naming convention `..._<pid>` gives each JVM its own dir — two
  * JVMs sharing one dir could race rebuild-vs-serve — and this reaper
  * keeps the scheme bounded: children of `root` owned by DEAD pids (or
  * in a legacy layout with no parseable pid) are deleted; live pids keep
  * theirs, except where `reapSamePid` opts specific own dirs in (e.g.
  * run dirs several generations old, whose consumers have finished).
  *
  * OWNERSHIP ASSUMPTION: `root` must be a namespace this library owns
  * exclusively (`/tmp/graft_ivf`, `/tmp/graft_ivf2`, `/tmp/graft_lsh`,
  * `/tmp/graft_shards`)
  * — a child whose name doesn't parse is treated as OUR legacy layout
  * and reaped. Never point this at a shared directory. */
object TmpDirs {

  /** Owner pid per the `<anything>_<pid>` suffix convention. */
  def pidSuffix(name: String): Option[Long] =
    name.split('_').lastOption.flatMap(_.toLongOption)

  /** Owner pid per the `run_<pid>_<runOrNanos>` convention — THE parser
    * for every per-run root (`/tmp/graft_shards`, `/tmp/graft_annleg`,
    * `/tmp/graft_compact`); one definition so a layout rename cannot
    * silently break reaping at a subset of call sites. */
  def runPrefixPid(name: String): Option[Long] =
    name.stripPrefix("run_").split('_').headOption.flatMap(_.toLongOption)

  /** Age floor for cross-pid reaps: a dir younger than this is never
    * deleted on the dead-pid / legacy paths, even if its recorded owner
    * looks dead — guards against pid recycling (a long-lived system
    * process re-using a crashed builder's pid would otherwise keep that
    * dir alive forever, and conversely a *young* dir whose owner briefly
    * looks absent mid-fork must not be reaped under it). Same-pid
    * opt-ins (`reapSamePid`) are exempt: the caller knows those dirs. */
  val ageFloorMs: Long = 2L * 60 * 60 * 1000

  def reap(root: String, pid: Long, pidOf: String => Option[Long],
      reapSamePid: String => Boolean = _ => false,
      nowMs: () => Long = () => System.currentTimeMillis()): Unit =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .filter { f =>
        def oldEnough = nowMs() - f.lastModified() >= ageFloorMs
        pidOf(f.getName) match {
          case Some(p) if p == pid => reapSamePid(f.getName)
          case Some(p)             => !ProcessHandle.of(p).isPresent && oldEnough
          case None                => oldEnough // legacy un-suffixed layout
        }
      }
      .foreach(f => org.apache.commons.io.FileUtils.deleteQuietly(f))
}
