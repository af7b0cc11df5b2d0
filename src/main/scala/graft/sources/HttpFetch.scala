package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.Duration

/** Driver-side HTTP fetch for the ingest boundary — the S1 task the
  * reference DAG runs before anything touches the engine (reference:
  * src/thrive_cash_processing_dag.py:77-92: `requests.get` with a 60 s
  * timeout and fail-fast on any error status).
  *
  * Deliberately a driver-side utility, not a distributed read: the feed is
  * ONE unsplittable xlsx from an operational endpoint, so a cluster-wide
  * fetch would add coordination for zero parallelism. Semantics mirrored
  * from the reference: 60 s connect+request timeout, any non-2xx status is
  * an immediate exception (the DAG task fails, nothing downstream runs),
  * and the download lands atomically (temp file + move) so a killed fetch
  * can never leave a half-written file where the xlsx staging would read
  * it.
  *
  * Usage: `runMain graft.sources.HttpFetch <url> <dest.xlsx> [<stageDir>]`
  * — with `stageDir` the fetched workbook is immediately staged to parquet
  * via [[XlsxToParquet]], reproducing the DAG's fetch→stage chain.
  */
object HttpFetch {

  /** Download `url` to `dest`, failing fast like the reference task.
    * Returns `dest`. */
  def fetch(url: String, dest: Path, timeoutSeconds: Int = 60): Path = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val request = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET().build()
    val parent = Option(dest.toAbsolutePath.getParent).getOrElse(Paths.get("."))
    Files.createDirectories(parent)
    val tmp = Files.createTempFile(parent, ".fetch_", ".part")
    try {
      val resp = client.send(request, HttpResponse.BodyHandlers.ofFile(tmp))
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(
          s"fetch failed fast: HTTP ${resp.statusCode()} from $url")
      Files.move(tmp, dest.toAbsolutePath,
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
      dest
    } finally Files.deleteIfExists(tmp)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: HttpFetch <url> <dest.xlsx> [<stageDir>]")
    fetch(args(0), Paths.get(args(1)))
    println(s"fetched ${args(0)} -> ${args(1)}")
    if (args.length >= 3) XlsxToParquet.main(Array(args(1), args(2)))
  }
}
