package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Guard-rails on the /tmp reaper — a deletion routine with a parse
  * heuristic deserves exact pins: live-pid dirs survive, dead-pid and
  * legacy (unparseable) dirs go, and the reapSamePid hook only ever
  * applies to THIS pid's dirs. One root per naming scheme, matching the
  * production call sites (pidSuffix for `<fp>_<pid>` index dirs, the
  * middle-token parser for `run_<pid>_<counter>` shard dirs). */
class TmpDirsSpec extends AnyFunSuite {

  private val pid = ProcessHandle.current().pid()
  // a pid that cannot be alive: far beyond pid_max on any Linux
  private val deadPid = 4999999L

  private def mk(root: java.io.File, name: String): java.io.File = {
    val f = new java.io.File(root, name)
    assert(f.mkdir()); f
  }

  test("index-dir scheme: dead and legacy reaped, own and live kept") {
    val root = Files.createTempDirectory("graft_tmpdirs_ivf").toFile
    try {
      val mine = mk(root, s"0a1b2c3d4e5f6a7b_$pid")
      val dead = mk(root, s"0a1b2c3d4e5f6a7b_$deadPid")
      val legacy = mk(root, "_root_testdata_sf0.001")
      // fresh dirs: the age floor protects even dead/legacy ones
      TmpDirs.reap(root.getAbsolutePath, pid, TmpDirs.pidSuffix)
      assert(dead.exists(), "young dead-pid dir survives the age floor")
      assert(legacy.exists(), "young legacy dir survives the age floor")
      // same dirs seen past the floor (injected clock): reaped
      val later = () => System.currentTimeMillis() + TmpDirs.ageFloorMs + 1000
      TmpDirs.reap(root.getAbsolutePath, pid, TmpDirs.pidSuffix, nowMs = later)
      assert(mine.exists(), "own index dir must survive")
      assert(!dead.exists(), "dead-pid index dir must be reaped")
      assert(!legacy.exists(), "legacy unparseable dir must be reaped")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(root)
    }
  }

  test("run-dir scheme: reapSamePid applies only to own dirs, by predicate") {
    val root = Files.createTempDirectory("graft_tmpdirs_run").toFile
    try {
      def runPid(n: String): Option[Long] =
        n.stripPrefix("run_").split('_').headOption.flatMap(_.toLongOption)
      val mineOld = mk(root, s"run_${pid}_1")
      val mineNew = mk(root, s"run_${pid}_9")
      val deadRun = mk(root, s"run_${deadPid}_7")
      val later = () => System.currentTimeMillis() + TmpDirs.ageFloorMs + 1000

      TmpDirs.reap(root.getAbsolutePath, pid, runPid, nowMs = later)
      assert(mineOld.exists(), "own dirs survive without a reapSamePid opt-in")
      assert(mineNew.exists())
      assert(!deadRun.exists(), "dead-pid run dir must be reaped")

      // same-pid opt-ins are exempt from the age floor (real clock here)
      TmpDirs.reap(root.getAbsolutePath, pid, runPid,
        reapSamePid = n =>
          n.split('_').lastOption.flatMap(_.toLongOption).exists(_ <= 1))
      assert(!mineOld.exists(), "opted-in own dir must be reaped")
      assert(mineNew.exists(), "non-opted own dir must survive")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(root)
    }
  }
}
