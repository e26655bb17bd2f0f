package graft.sources

import java.io.InputStream
import java.net.URI
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Remote-source staging (SURVEY.md §2.1 S3): the reference's first act is
  * scanning HTTPS-hosted parquet files (`utils.py:97-105` behavior).
  * HTTP(S) is not a Hadoop filesystem, so the Spark-native equivalent
  * stages payloads to scannable paths first, then reads them with the
  * normal [[Scan]] surface. Skip-if-present mirrors the reference's
  * idempotence gate (`extract_data.py:8-14`, `main.py:11-12`).
  *
  * Scale note: this is a driver-side convenience for a handful of source
  * URLs (exactly the reference's shape — 4 files). A 100 TB ingest stages
  * through a distributed copy (the data already lives on a cluster FS /
  * object store Spark reads natively); this utility is the local-parity
  * path, not the bulk path.
  */
object Stage {

  /** Download each URL to `dir/<basename>`, skipping names already
    * present (V2 gate — re-runs are free). Returns local paths in input
    * order. Any JVM-openable URL scheme works (file://, https://, …).
    *
    * Downloads land in a `.part` temp name and move into place only on
    * success, so an interrupted fetch never leaves a truncated file that
    * the skip gate would treat as complete. URLs sharing a basename map
    * to the same target — rejected rather than silently aliased. */
  def fetchToLocal(urls: Seq[String], dir: String,
                   skipIfPresent: Boolean = true): Seq[Path] = {
    val names = urls.map(u => Paths.get(new URI(u).getPath).getFileName.toString)
    require(names.distinct.size == names.size,
      s"URL basenames collide: ${names.diff(names.distinct).distinct.mkString(", ")}")
    val d = Files.createDirectories(Paths.get(dir))
    urls.zip(names).map { case (u, name) =>
      val target = d.resolve(name)
      if (!(skipIfPresent && Files.exists(target))) {
        val tmp = d.resolve(name + ".part")
        val in: InputStream = new URI(u).toURL.openStream()
        try {
          Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
          Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
        } finally {
          in.close()
          Files.deleteIfExists(tmp)
        }
      }
      target
    }
  }
}
