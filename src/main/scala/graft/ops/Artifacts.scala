package graft.ops

/** Shared cache keying for the fit-once on-disk corpus artifacts
  * ([[Dedup.BandIndex]], Dedup.PairArtifact, Similarity.IvfArtifact,
  * Sketches.SketchArtifact).
  *
  * Two properties the old `Integer.toHexString(dir.hashCode)` key
  * lacked:
  *  - **collision-free paths**: the key embeds the FULL sanitized dir,
  *    so two distinct corpus dirs can never share an artifact path the
  *    way colliding 32-bit hashCodes silently could (the second build
  *    overwrote the first's parquet while its cached entry still
  *    pointed there — wrong matches with no error);
  *  - **regeneration detection**: the key folds in a cheap corpus
  *    fingerprint (top-level file names, sizes, mtimes), so testdata
  *    regenerated in place under the SAME dir builds a fresh artifact
  *    instead of serving the stale index.
  *
  * The fingerprint is one directory listing per artifact lookup —
  * driver-side metadata only, no data read. */
private[ops] object Artifacts {

  /** Filesystem-safe, collision-free, regeneration-sensitive key. */
  def key(dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${safe}_${fingerprint(dir)}"
  }

  private def fingerprint(dir: String): String = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val d = Paths.get(dir)
    val parts =
      if (Files.isDirectory(d)) {
        val stream = Files.list(d)
        try stream.iterator().asScala.toSeq.map(_.toString).sorted.map { p =>
          val pp = Paths.get(p)
          s"$p:${Files.size(pp)}:${Files.getLastModifiedTime(pp).toMillis}"
        } finally stream.close()
      } else Seq(s"$d:absent")
    val md5 = java.security.MessageDigest.getInstance("MD5")
    md5.digest(parts.mkString("\n").getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
  }
}
