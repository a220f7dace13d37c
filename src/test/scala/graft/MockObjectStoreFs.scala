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
