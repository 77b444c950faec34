package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Bronze layer: land the raw NeoWs feed document unmodified.
  *
  * Mirrors `/root/reference/src/etl/bronze_ingest.py` (S1/S2 in SURVEY §2.1):
  * a driver-side HTTP GET of the public feed endpoint and a raw-bytes PUT at
  * `bronze/JSON/nasa-asteroid-data-{date}.json`. The document is a few
  * hundred KB — this is correctly NOT a distributed read; Spark enters at
  * silver. The sink goes through the Hadoop FileSystem API, so the same code
  * lands to `file://`, `hdfs://` or `s3a://` (the reference's MinIO endpoint
  * config, `bronze_to_silver.py:24-28`, becomes standard `fs.s3a.*` Hadoop
  * conf on the session).
  */
object BronzeIngest {

  /** Public NeoWs feed URL (reference: `bronze_ingest.py:19-26`). */
  def feedUrl(startDate: String, endDate: String, apiKey: String): String =
    s"https://api.nasa.gov/neo/rest/v1/feed?start_date=$startDate&end_date=$endDate&api_key=$apiKey"

  /** Driver-side GET; returns the raw JSON body. */
  def fetch(url: String): String = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"NeoWs GET failed: HTTP ${resp.statusCode()}")
    resp.body()
  }

  /** Bronze object key for a feed date (reference: `bronze_ingest.py:43`). */
  def bronzeKey(bronzeDir: String, date: String): String =
    s"$bronzeDir/JSON/nasa-asteroid-data-$date.json"

  /** Land raw JSON bytes at the bronze path (overwrite, idempotent like the
    * reference's put_object).
    *
    * The Hadoop conf defaults to the ACTIVE session's `newHadoopConf()`, so
    * session-level `fs.*` options (S3 credentials, endpoint overrides — the
    * reference's MinIO config) reach the filesystem without every caller
    * having to plumb them; a bare `new Configuration()` would silently drop
    * them. Falls back to a fresh Configuration only when no session exists
    * (pure driver-side utility use). */
  def land(json: String, destPath: String,
           hadoopConf: Configuration = sessionHadoopConf()): Unit = {
    val path = new Path(destPath)
    val fs = path.getFileSystem(hadoopConf)
    val out = fs.create(path, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Full ingest for one feed day: GET → land. */
  def ingest(date: String, apiKey: String, bronzeDir: String): String = {
    val dest = bronzeKey(bronzeDir, date)
    land(fetch(feedUrl(date, date, apiKey)), dest)
    dest
  }
}
