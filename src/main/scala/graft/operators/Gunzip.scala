package graft.operators

/** Prefix-keeping gzip inflate, shared by the archive readers
  * ([[Warc]], [[TarArchive]]): a truncated `.gz` tail makes
  * `GZIPInputStream` throw EOF/ZipException AFTER it has already
  * yielded the inflated prefix — and truncated tails are routine in
  * crawl archives and shard uploads, so the prefix IS the good data.
  * Discarding it on exception (the naive catch-to-null) silently
  * turns a mostly-recoverable archive into zero records; this helper
  * returns whatever inflated cleanly (possibly empty for a
  * fully-corrupt stream), and the record/entry walkers' own
  * truncation handling takes it from there. Reads concatenated
  * members (the per-record-gzip WARC convention).
  */
private[operators] object Gunzip {
  def prefix(b: Array[Byte]): Array[Byte] = {
    if (b == null) return Array.empty
    val out = new java.io.ByteArrayOutputStream(math.max(64, b.length * 4))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch { case _: Exception => () }
    out.toByteArray
  }
}
