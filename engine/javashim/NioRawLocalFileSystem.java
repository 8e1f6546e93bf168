package sparkgraft;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem whose setPermission uses java.nio instead of forking
 * a `chmod` subprocess.
 *
 * Without libhadoop native IO, Hadoop's RawLocalFileSystem shells out
 * (Shell.execCommand -> fork+exec chmod) on EVERY local file/dir create
 * (RawLocalFileSystem.java:1179 in hadoop 3.4).  A 48-partition snapshot
 * write is ~150 files x 2 chmods each; at 16 concurrent executor threads
 * in one large-RSS JVM the fork storm serializes kernel-side (jstack: 8/16
 * executor threads in Shell.runCommand; /proc <jvm> task stime inflation).
 * Real deployments write to HDFS/S3/Iceberg where permissions are an RPC,
 * so this shim only de-noises the single-box proxy's substrate; it changes
 * no semantics (same permission bits end up on disk).
 *
 * Registered via spark.hadoop.fs.file.impl=sparkgraft.NioRawLocalFileSystem
 * (also skips the ChecksumFileSystem .crc shadow files, which a cluster
 * filesystem client does not write either).
 */
public class NioRawLocalFileSystem extends RawLocalFileSystem {

  private static final PosixFilePermission[] BITS = {
    PosixFilePermission.OTHERS_EXECUTE,
    PosixFilePermission.OTHERS_WRITE,
    PosixFilePermission.OTHERS_READ,
    PosixFilePermission.GROUP_EXECUTE,
    PosixFilePermission.GROUP_WRITE,
    PosixFilePermission.GROUP_READ,
    PosixFilePermission.OWNER_EXECUTE,
    PosixFilePermission.OWNER_WRITE,
    PosixFilePermission.OWNER_READ,
  };

  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    if (permission == null) {
      return;
    }
    EnumSet<PosixFilePermission> perms = EnumSet.noneOf(PosixFilePermission.class);
    short mode = permission.toShort();
    for (int i = 0; i < 9; i++) {
      if (((mode >> i) & 1) == 1) {
        perms.add(BITS[i]);
      }
    }
    Files.setPosixFilePermissions(pathToFile(p).toPath(), perms);
  }
}
