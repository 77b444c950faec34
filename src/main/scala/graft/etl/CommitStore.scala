package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

/** The ATOMIC-PUBLISH seam of the TxLog format (round-14, VERDICT r13
  * #3): everything the commit protocol needs from storage, as three
  * operations over named log objects (`<v>.json` version files and
  * `<v>.checkpoint.json` checkpoints). The whole OCC story rests on
  * [[tryPut]] being put-if-absent — exactly one writer wins a name.
  *
  * Two implementations:
  *   - [[PosixCommitStore]] (default): `link(2)` CAS on the table's
  *     `_graft_log/` directory — atomic and exclusive on any POSIX
  *     filesystem, the deployment this sandbox runs;
  *   - [[HttpCommitStore]]: conditional PUT (`If-None-Match: *` → 412 on
  *     loss) against an S3-style HTTP object store — the semantics S3
  *     itself has offered publicly since 2024, which is what makes a
  *     coordinator-free Delta-style log possible on object storage. Data
  *     files stay wherever the table path points; only the LOG rides the
  *     store (the commit-coordinator split).
  *
  * Selection is PER TABLE and CROSS-PROCESS: a table declared with
  * [[CommitStore.declareHttp]] carries a `_graft_log.store` marker file
  * next to its data, so every writer JVM — including forked storm
  * processes — resolves the same store from the path alone. No marker =
  * POSIX, which keeps every existing table reading byte-identically. */
trait CommitStore {
  /** Basenames of the log objects currently published for `table`. */
  def list(table: String): Seq[String]
  /** Lines of a published log object. */
  def read(table: String, name: String): Seq[String]
  /** PUT-IF-ABSENT: publish `name` with `body`; false when some other
    * writer already published that name (the CAS loss signal). */
  def tryPut(table: String, name: String, body: String): Boolean
}

/** link(2)-based store — the original TxLog commit path, unchanged:
  * write a hidden tmp file, hard-link it to the target name (atomic,
  * EEXIST on loss), delete the tmp. */
object PosixCommitStore extends CommitStore {
  private def dir(table: String) = Paths.get(table, "_graft_log")

  override def list(table: String): Seq[String] = {
    val d = dir(table)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  override def read(table: String, name: String): Seq[String] =
    Files.readAllLines(dir(table).resolve(name), StandardCharsets.UTF_8)
      .asScala.toSeq

  override def tryPut(table: String, name: String, body: String): Boolean = {
    val d = dir(table)
    Files.createDirectories(d)
    val tmp = d.resolve(s".tmp-${UUID.randomUUID()}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      Files.createLink(d.resolve(name), tmp) // atomic, EEXIST on loss
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }
}

/** Conditional-PUT store over the same S3-style HTTP protocol the
  * engine's object-store filesystem speaks
  * ([[graft.sources.HttpObjectStoreFileSystem]]), plus the one verb a
  * commit log needs that a filesystem API cannot express: `If-None-Match:
  * *` on PUT, answered 412 when the key exists. Keys embed the table's
  * absolute path (`txlog<abs-path>/<name>`), so distinct tables never
  * collide on one store. Listing is one prefix GET — O(log objects),
  * strongly consistent on S3 since 2020 (and on the in-process test
  * server by construction). */
final class HttpCommitStore(val endpoint: String) extends CommitStore {
  private val http = HttpClient.newHttpClient()

  private def keyPrefix(table: String): String =
    s"txlog${Paths.get(table).toAbsolutePath}/"

  private def uri(key: String): URI =
    URI.create(s"$endpoint/$key")

  override def list(table: String): Seq[String] = {
    val prefix = keyPrefix(table)
    val q = java.net.URLEncoder.encode(prefix, "UTF-8")
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"$endpoint/?list=$q")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"list $prefix: HTTP ${resp.statusCode()}")
    resp.body().linesIterator.filter(_.nonEmpty).map { line =>
      // `FILE <size> <key>`
      line.split(" ", 3)(2).stripPrefix(prefix)
    }.toSeq
  }

  override def read(table: String, name: String): Seq[String] = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(keyPrefix(table) + name)).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() == 404)
      throw new java.io.FileNotFoundException(s"$table/$name")
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"read $name: HTTP ${resp.statusCode()}")
    resp.body().linesIterator.toSeq
  }

  override def tryPut(table: String, name: String, body: String): Boolean = {
    val resp = http.send(
      HttpRequest.newBuilder(uri(keyPrefix(table) + name))
        .header("If-None-Match", "*")
        .PUT(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 | 201 => true
      case 412       => false // precondition failed: another writer won
      case other => throw new java.io.IOException(
        s"conditional PUT $name: HTTP $other")
    }
  }
}

object CommitStore {
  /** Marker file next to the table's data: `http <endpoint>`. Absent =
    * POSIX. Read at most once per (JVM, endpoint) — the marker is
    * immutable after declaration. */
  private val MarkerName = "_graft_log.store"
  private val httpMemo =
    new java.util.concurrent.ConcurrentHashMap[String, HttpCommitStore]()

  def of(table: String): CommitStore = {
    val marker = Paths.get(table, MarkerName)
    if (!Files.exists(marker)) PosixCommitStore
    else {
      val parts = new String(Files.readAllBytes(marker),
        StandardCharsets.UTF_8).trim.split("\\s+")
      parts(0) match {
        case "http" =>
          httpMemo.computeIfAbsent(parts(1), e => new HttpCommitStore(e))
        case other => throw new IllegalStateException(
          s"$table declares unknown commit store kind '$other' " +
            s"(supported: http); refusing to guess")
      }
    }
  }

  /** Declare that `table`'s LOG lives on the HTTP object store at
    * `endpoint`. Must run before the first commit (the declaration is a
    * creation-time choice, like partitioning); idempotent for the same
    * endpoint, loud for a different one. */
  def declareHttp(table: String, endpoint: String): Unit = {
    // the store is a creation-time choice: flipping a table with POSIX
    // history would make its committed versions invisible, not migrated
    require(PosixCommitStore.list(table)
      .forall(n => !n.endsWith(".json")),
      s"$table already has POSIX commits; a commit store cannot change mid-history")
    val marker = Paths.get(table, MarkerName)
    Files.createDirectories(marker.getParent)
    val body = s"http $endpoint"
    try Files.write(marker, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val existing = new String(Files.readAllBytes(marker),
          StandardCharsets.UTF_8).trim
        require(existing == body,
          s"$table already declares a different commit store: $existing")
    }
  }
}
