package graft.tools

import java.util.concurrent.atomic.AtomicInteger

/** A local filesystem under its own scheme (`cntfs:`) that counts data-
  * file opens. Registered via `fs.cntfs.impl`, it defeats Spark's
  * local-parquet fast path (which bypasses Hadoop FS statistics), so a
  * spec can assert how many times a table's files were actually opened —
  * the read-once guarantee of the composed cleaning pipeline. */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "cntfs"
  override def getUri: java.net.URI = java.net.URI.create("cntfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    if (f.getName.endsWith(".parquet")) CountingLocalFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object CountingLocalFs {
  private val opens = new AtomicInteger
  def reset(): Unit = opens.set(0)
  def parquetOpens(): Int = opens.get()
}
