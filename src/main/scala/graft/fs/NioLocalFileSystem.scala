package graft.fs

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with fork-free permission syscalls — the mkdir/
  * create twin of the link(2) publish fast path (guide §1 empirical
  * finding, round 14): without libhadoop's native bindings,
  * `RawLocalFileSystem.setPermission` shells out to `/bin/chmod` via
  * `Shell.execCommand`, so EVERY directory Hadoop creates (and every
  * permissioned create) forks a process — `mkOneDirWithMode` calls
  * `setPermission` once per new directory. A hidden-partitioning
  * insert creating ~150 partition dirs paid ~150 serial forks in the
  * driver-side promote loop alone (thread-dump sampling attributed
  * ~15% of q138's wall time to `ProcessImpl.forkAndExec` + reading the
  * chmod output), and the Spark stage write pays the same tax per
  * task-side dir.
  *
  * This subclass keeps LocalFileSystem semantics bit-for-bit —
  * checksums, rename behavior, permission VALUES — and only replaces
  * the permission mechanism with `Files.setPosixFilePermissions`, a
  * single fchmodat(2) syscall. Wire up with
  * `spark.hadoop.fs.file.impl=graft.fs.NioLocalFileSystem`; clusters
  * with native libhadoop (or non-posix local mounts) simply omit the
  * setting. Sticky/setuid bits are outside PosixFilePermission's
  * domain — Hadoop's own default dir/file permissions never carry
  * them, and such bits fall back to the shell path.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit =
    if (permission == null) ()
    else if ((permission.toShort & 0x3E00) != 0) {
      // sticky/setuid/setgid: PosixFilePermission cannot express them —
      // take Hadoop's shell path for this (never-on-the-hot-path) case
      super.setPermission(p, permission)
    } else {
      val f = pathToFile(p)
      try java.nio.file.Files.setPosixFilePermissions(
        f.toPath, NioRawLocalFileSystem.posixOf(permission.toShort))
      catch {
        case _: UnsupportedOperationException =>
          // non-posix store (unlikely for scheme file): shell fallback
          super.setPermission(p, permission)
        case e: java.io.IOException =>
          throw new java.io.IOException(
            s"setPermission($p, $permission) failed", e)
      }
    }
}

object NioRawLocalFileSystem {
  private[fs] def posixOf(mode: Short): java.util.Set[PosixFilePermission] = {
    val s = new java.util.HashSet[PosixFilePermission]()
    def bit(m: Int, perm: PosixFilePermission): Unit =
      if ((mode & m) != 0) { s.add(perm); () }
    bit(0x100, OWNER_READ); bit(0x80, OWNER_WRITE); bit(0x40, OWNER_EXECUTE)
    bit(0x20, GROUP_READ); bit(0x10, GROUP_WRITE); bit(0x8, GROUP_EXECUTE)
    bit(0x4, OTHERS_READ); bit(0x2, OTHERS_WRITE); bit(0x1, OTHERS_EXECUTE)
    s
  }
}
