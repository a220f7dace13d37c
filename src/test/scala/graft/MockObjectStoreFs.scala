package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, RawLocalFileSystem}

/** A local-disk-backed Hadoop filesystem registered under a scheme the
  * store's capability table does NOT know — standing in for an
  * object store (s3a-shaped) whose rename is not an atomic
  * create-no-overwrite. Lets specs prove the store REFUSES
  * concurrent-writer commits on such a root while single-writer mode
  * still works end-to-end.
  */
class MockObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "mockobj"
  override def getUri: URI = URI.create("mockobj:///")
}

/** FileContext binding for the mockobj scheme (the store's atomic
  * pointer swaps go through FileContext).
  */
class MockObjectStoreAbstractFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new MockObjectStoreFs, conf, "mockobj", false)

object FlakyReadFs {
  /** When non-empty, opening any path containing this substring throws
    * an injected IOException (the file is PRESENT but unreadable — the
    * transient-failure shape the store must not conflate with absence).
    */
  @volatile var failSubstring: String = ""
}

/** Local-disk-backed filesystem that injects READ failures on demand —
  * lets specs prove a failed read of a present metadata file fails
  * loudly instead of degrading into "file absent" semantics.
  */
class FlakyReadFs extends RawLocalFileSystem {
  override def getScheme: String = "flaky"
  override def getUri: URI = URI.create("flaky:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    val sub = FlakyReadFs.failSubstring
    if (sub.nonEmpty && f.toString.contains(sub))
      throw new java.io.IOException(s"injected read failure for $f")
    super.open(f, bufferSize)
  }
}

class FlakyReadAbstractFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new FlakyReadFs, conf, "flaky", false)
