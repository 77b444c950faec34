package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A Hadoop `FileSystem` over an S3-style HTTP object store — the engine's
  * demonstration that every source/sink in the library reaches object
  * storage through the standard Hadoop FS seam, exactly where `s3a://`
  * plugs in on a production cluster (the reference's MinIO endpoint
  * config, `/root/reference/src/etl/bronze_to_silver.py:24-28`, is the
  * same seam: `fs.s3a.endpoint` + credentials on the Hadoop conf).
  *
  * This container carries no `hadoop-aws`/SDK jars (zero egress), so the
  * live-endpoint e2e runs against this connector + an in-process HTTP
  * object server instead: same URI mechanics (`fs.<scheme>.impl`
  * registration, endpoint from Hadoop conf, authority = bucket), same
  * object-store semantics Spark must survive —
  *   - FLAT KEYSPACE, directories are prefixes: `mkdirs` lands a `<key>/`
  *     zero-byte marker (the S3 convention) and list collapses deeper
  *     keys under a delimiter, so `FileOutputCommitter`'s
  *     `_temporary`-then-rename protocol exercises real prefix listings;
  *   - NON-ATOMIC RENAME, server-side copy + delete per key — the property
  *     that motivates S3A's committers; a single-driver commit (this
  *     harness) is safe, and the scaladoc keeps the caveat explicit;
  *   - whole-object GET on open, buffered PUT on close (objects are
  *     immutable; no append). A production connector streams ranged GETs
  *     (as S3A does) — bronze/silver/gold objects here are MBs, and the
  *     read path documents where ranged reads would slot in.
  *
  * Protocol (the in-process server speaks it; any S3-alike could):
  *   PUT /k, GET /k, HEAD /k (X-Object-Length header), DELETE /k,
  *   GET /?list=prefix&delim=/ → text lines `FILE <size> <key>` |
  *   `DIR <key>`.
  */
class HttpObjectStoreFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var endpoint: String = _
  private var workDir: Path = _
  private val http = HttpClient.newHttpClient()

  override def getScheme: String = "s3mock"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"${uri.getScheme}://${uri.getAuthority}")
    endpoint = conf.get(s"fs.${uri.getScheme}.endpoint")
    if (endpoint == null)
      throw new IOException(s"fs.${uri.getScheme}.endpoint not set on the Hadoop conf")
    workDir = new Path(fsUri.toString + "/")
  }

  override def getUri: URI = fsUri

  /** bucket-qualified object key for a path: `<authority>/<path>`. */
  private def key(p: Path): String = {
    val q = makeQualified(p)
    val raw = q.toUri.getPath.stripPrefix("/")
    s"${q.toUri.getAuthority}/$raw".stripSuffix("/")
  }

  private def request(b: HttpRequest.Builder): HttpResponse[Array[Byte]] =
    http.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())

  // ------------------------------------------------------------------ read

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val resp = request(HttpRequest.newBuilder(URI.create(s"$endpoint/${key(f)}")).GET())
    if (resp.statusCode() == 404) throw new FileNotFoundException(f.toString)
    if (resp.statusCode() != 200) throw new IOException(s"GET ${key(f)}: HTTP ${resp.statusCode()}")
    // whole-object buffer; a production connector issues ranged GETs here
    new FSDataInputStream(new SeekableByteArrayInputStream(resp.body()))
  }

  // ----------------------------------------------------------------- write

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite && exists(f)) throw new FileAlreadyExistsException(f.toString)
    val k = key(f)
    val buf = new ByteArrayOutputStream() {
      override def close(): Unit = {
        val resp = request(HttpRequest.newBuilder(URI.create(s"$endpoint/$k"))
          .PUT(HttpRequest.BodyPublishers.ofByteArray(toByteArray)))
        if (resp.statusCode() != 200)
          throw new IOException(s"PUT $k: HTTP ${resp.statusCode()}")
      }
    }
    new FSDataOutputStream(buf, statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("objects are immutable: no append")

  // ------------------------------------------------------- namespace ops

  override def rename(src: Path, dst: Path): Boolean = {
    // server-side copy + delete per key — NON-atomic (the S3 reality that
    // motivates commit protocols); safe under a single driver's committer
    val st = try getFileStatus(src) catch { case _: FileNotFoundException => return false }
    val keys: Seq[(String, String)] =
      if (st.isFile) Seq(key(src) -> key(dst))
      else listPrefix(key(src) + "/").map { case (k, _) =>
        k -> (key(dst) + k.stripPrefix(key(src)))
      }
    keys.foreach { case (from, to) =>
      val got = request(HttpRequest.newBuilder(URI.create(s"$endpoint/$from")).GET())
      if (got.statusCode() == 200) {
        request(HttpRequest.newBuilder(URI.create(s"$endpoint/$to"))
          .PUT(HttpRequest.BodyPublishers.ofByteArray(got.body())))
        request(HttpRequest.newBuilder(URI.create(s"$endpoint/$from")).DELETE())
      }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val st = try getFileStatus(f) catch { case _: FileNotFoundException => return false }
    if (st.isFile) {
      request(HttpRequest.newBuilder(URI.create(s"$endpoint/${key(f)}")).DELETE())
    } else {
      val children = listPrefix(key(f) + "/")
      if (children.nonEmpty && !recursive)
        throw new IOException(s"directory not empty: $f")
      children.foreach { case (k, _) =>
        request(HttpRequest.newBuilder(URI.create(s"$endpoint/$k")).DELETE())
      }
      request(HttpRequest.newBuilder(URI.create(s"$endpoint/${key(f)}/")).DELETE())
    }
    true
  }

  /** raw recursive listing of `<prefix>` → (key, size). */
  private def listPrefix(prefix: String): Seq[(String, Long)] = {
    val resp = request(HttpRequest.newBuilder(
      URI.create(s"$endpoint/?list=${java.net.URLEncoder.encode(prefix, "UTF-8")}")).GET())
    if (resp.statusCode() != 200) throw new IOException(s"LIST $prefix: HTTP ${resp.statusCode()}")
    new String(resp.body(), java.nio.charset.StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { line =>
        val Array(_, size, k) = line.split(" ", 3)
        (k, size.toLong)
      }.toSeq
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val st = getFileStatus(f) // throws FileNotFoundException per contract
    if (st.isFile) return Array(st)
    val base = key(f) + "/"
    val entries = listPrefix(base)
    // collapse to immediate children (delimiter semantics, client-side)
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val dirs = scala.collection.mutable.LinkedHashSet.empty[String]
    entries.foreach { case (k, size) =>
      val rest = k.stripPrefix(base)
      if (rest.nonEmpty) rest.indexOf('/') match {
        case -1 => files(rest) = size
        case i => dirs += rest.substring(0, i)
      }
    }
    val qual = makeQualified(f)
    (dirs.toSeq.filterNot(files.contains).map(d => dirStatus(new Path(qual, d))) ++
      files.toSeq.map { case (name, size) => fileStatus(new Path(qual, name), size) })
      .toArray
  }

  private def fileStatus(p: Path, size: Long): FileStatus =
    new FileStatus(size, false, 1, 32L * 1024 * 1024, 0L, makeQualified(p))
  private def dirStatus(p: Path): FileStatus =
    new FileStatus(0, true, 1, 0, 0L, makeQualified(p))

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (k.split("/", 2).lengthCompare(2) < 0) return dirStatus(f) // bucket root
    val head = request(HttpRequest.newBuilder(URI.create(s"$endpoint/$k"))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()))
    if (head.statusCode() == 200)
      return fileStatus(f, head.headers().firstValue("X-Object-Length").orElse("0").toLong)
    // directory probe: explicit marker or any deeper key
    val marker = request(HttpRequest.newBuilder(URI.create(s"$endpoint/$k/"))
      .method("HEAD", HttpRequest.BodyPublishers.noBody()))
    if (marker.statusCode() == 200 || listPrefix(k + "/").nonEmpty) return dirStatus(f)
    throw new FileNotFoundException(f.toString)
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    // zero-byte `<key>/` marker — the S3 empty-directory convention
    val resp = request(HttpRequest.newBuilder(URI.create(s"$endpoint/${key(f)}/"))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(Array.emptyByteArray)))
    resp.statusCode() == 200
  }

  override def setWorkingDirectory(dir: Path): Unit = workDir = dir
  override def getWorkingDirectory: Path = workDir
}

/** In-memory byte buffer satisfying Hadoop's positioned-read contract. */
private[sources] class SeekableByteArrayInputStream(bytes: Array[Byte])
    extends ByteArrayInputStream(bytes) with Seekable with PositionedReadable {

  override def seek(pos: Long): Unit = {
    if (pos < 0 || pos > bytes.length) throw new IOException(s"seek $pos out of range")
    this.pos = pos.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
    if (position >= bytes.length) return -1
    val n = math.min(length, bytes.length - position.toInt)
    System.arraycopy(bytes, position.toInt, buffer, offset, n)
    n
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
    if (read(position, buffer, offset, length) < length)
      throw new IOException("readFully past end of object")
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit =
    readFully(position, buffer, 0, buffer.length)
}
