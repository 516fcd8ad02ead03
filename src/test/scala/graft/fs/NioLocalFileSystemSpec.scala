package graft.fs

import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

/** The fork-free local fs must be PERMISSION-equivalent to stock
  * Hadoop: same bits on created dirs/files, same explicit
  * setPermission results — only the mechanism (one NIO syscall vs a
  * forked /bin/chmod) differs. */
class NioLocalFileSystemSpec extends AnyFunSuite {

  test("posixOf maps every rwx bit of the mode word") {
    assert(NioRawLocalFileSystem.posixOf(Integer.parseInt("755", 8).toShort)
      == java.util.Set.of(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
        GROUP_READ, GROUP_EXECUTE, OTHERS_READ, OTHERS_EXECUTE))
    assert(NioRawLocalFileSystem.posixOf(Integer.parseInt("640", 8).toShort)
      == java.util.Set.of(OWNER_READ, OWNER_WRITE, GROUP_READ))
    assert(NioRawLocalFileSystem.posixOf(0) == java.util.Set.of())
    assert(NioRawLocalFileSystem.posixOf(Integer.parseInt("777", 8).toShort)
      .size() == 9)
  }

  test("mkdirs + setPermission land the same bits as stock Hadoop") {
    val conf = new Configuration()
    val nio = new NioLocalFileSystem
    nio.initialize(java.net.URI.create("file:///"), conf)
    val stock = new org.apache.hadoop.fs.LocalFileSystem
    stock.initialize(java.net.URI.create("file:///"), conf)

    val base = java.nio.file.Files.createTempDirectory("nio_fs_spec_").toString
    val a = new Path(s"$base/nio/x/y")
    val b = new Path(s"$base/stock/x/y")
    assert(nio.mkdirs(a))
    assert(stock.mkdirs(b))
    def bits(p: Path, fs: org.apache.hadoop.fs.FileSystem): Short =
      fs.getFileStatus(p).getPermission.toShort
    assert(bits(a, stock) == bits(b, stock),
      "mkdirs permissions must match stock Hadoop's")

    // explicit setPermission round-trips through getFileStatus
    for (mode <- Seq("700", "755", "640")) {
      val perm = new FsPermission(Integer.parseInt(mode, 8).toShort)
      nio.setPermission(a, perm)
      assert(bits(a, stock) == perm.toShort, s"mode $mode")
    }
    nio.close(); stock.close()
  }
}
