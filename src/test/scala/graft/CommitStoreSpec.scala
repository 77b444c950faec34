package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.{CommitStore, HttpCommitStore, PosixCommitStore, TxLog}

/** Round 14 (VERDICT r13 #3): the pluggable commit seam. The POSIX
  * link(2) CAS keeps every existing behavior (the whole TxLog suite runs
  * through it); this spec proves the SAME protocol — OCC storms included,
  * in-process and cross-process — over the conditional-PUT
  * [[HttpCommitStore]], i.e. a Delta-style log whose atomic publish is an
  * object-store `If-None-Match: *` PUT instead of a filesystem link. */
class CommitStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val objectServer = new TestObjectServer
  lazy val spark: SparkSession = GraftSession.local("commit-store-spec", cores = 4)

  override def beforeAll(): Unit = { objectServer.start(); () }
  override def afterAll(): Unit = { spark.stop(); objectServer.stop() }

  private def httpTable(): String = {
    val t = Files.createTempDirectory("graft-cstore").resolve("t").toString
    CommitStore.declareHttp(t, objectServer.endpoint)
    t
  }

  private def ids(t: String, asOf: Option[Long] = None): Seq[Long] =
    TxLog.read(spark, t, asOf).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq

  test("tryPut is put-if-absent on both stores") {
    val posixT = Files.createTempDirectory("graft-cs-posix").resolve("t").toString
    assert(PosixCommitStore.tryPut(posixT, "x.json", "a"))
    assert(!PosixCommitStore.tryPut(posixT, "x.json", "b"))
    assert(PosixCommitStore.read(posixT, "x.json") == Seq("a"))

    val h = new HttpCommitStore(objectServer.endpoint)
    val httpT = Files.createTempDirectory("graft-cs-http").resolve("t").toString
    assert(h.tryPut(httpT, "x.json", "a"))
    assert(!h.tryPut(httpT, "x.json", "b"), "second conditional PUT must 412")
    assert(h.read(httpT, "x.json") == Seq("a"))
    assert(h.list(httpT) == Seq("x.json"))
  }

  test("full table lifecycle over the HTTP store: append, DML, travel, checkpoint, vacuum") {
    import spark.implicits._
    val t = httpTable()
    val v1 = TxLog.append(spark, t, (1L to 6L).map(i => (i, i % 2)).toDF("id", "par").coalesce(1))
    TxLog.append(spark, t, (10L to 12L).map(i => (i, i % 2)).toDF("id", "par").coalesce(1))
    assert(TxLog.versions(t) == Seq(1L, 2L))
    // no posix log objects exist — the log genuinely lives on the store
    assert(PosixCommitStore.list(t).forall(!_.endsWith(".json")))
    assert(ids(t, Some(v1)) == (1L to 6L))
    TxLog.deleteWhere(spark, t, col("id") % 2 === 0)
    assert(ids(t) == Seq(1L, 3L, 5L, 11L))
    TxLog.deleteWhereMerge(spark, t, col("id") === 11L) // DV path
    assert(ids(t) == Seq(1L, 3L, 5L))
    TxLog.checkpoint(t)
    assert(TxLog.checkpoints(t).nonEmpty)
    // replay-from-checkpoint reads the checkpoint object off the store
    assert(ids(t) == Seq(1L, 3L, 5L))
    TxLog.optimize(spark, t, targetFiles = 1)
    TxLog.vacuum(t, retainVersions = 1, minAgeMillis = 0)
    assert(ids(t) == Seq(1L, 3L, 5L))
  }

  test("in-process OCC storm over the HTTP store: racing appends serialize gaplessly") {
    import spark.implicits._
    val t = httpTable()
    val writers = 4
    val perWriter = 4
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val futs = (1 to writers).map { w =>
      pool.submit(new Runnable { def run(): Unit = { start.await()
        (0 until perWriter).foreach { i =>
          TxLog.append(spark, t,
            Seq(w * 1000L + i).toDF("id").coalesce(1))
        } } })
    }
    start.countDown()
    futs.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    val vs = TxLog.versions(t)
    assert(vs == (1L to (writers * perWriter)),
      s"gapless serialized history expected, got $vs")
    val expect = (for (w <- 1 to writers; i <- 0 until perWriter)
      yield w * 1000L + i).sorted
    assert(ids(t) == expect, "every committed row exactly once")
  }

  test("cross-process OCC storm over the HTTP store: two JVMs race appends + optimize + vacuum") {
    val t = httpTable()
    val nPer = 4
    val (p1, l1) = spawn(t, 1L, nPer, "append")
    val (p2, l2) = spawn(t, 2L, nPer, "mixed")
    awaitOk(p1, l1, "append writer process (http store)")
    awaitOk(p2, l2, "mixed writer process (http store)")
    val vs = TxLog.versions(t)
    assert(vs == (1L to vs.size), s"gapless serialized history, got $vs")
    val expect = (for (w <- 1L to 2L; i <- 0 until nPer)
      yield w * 1000L + i).sorted
    assert(ids(t) == expect, "every committed row exactly once across JVMs")
  }

  test("store declaration is creation-time only and endpoint-pinned") {
    import spark.implicits._
    // declaring over posix history refuses
    val posixT = Files.createTempDirectory("graft-cs-mix").resolve("t").toString
    TxLog.append(spark, posixT, Seq(1L).toDF("id").coalesce(1))
    intercept[IllegalArgumentException] {
      CommitStore.declareHttp(posixT, objectServer.endpoint)
    }
    // re-declaring the same endpoint is idempotent; a different one refuses
    val t = httpTable()
    CommitStore.declareHttp(t, objectServer.endpoint)
    intercept[IllegalArgumentException] {
      CommitStore.declareHttp(t, "http://127.0.0.1:1")
    }
  }

  // ---- forked-JVM plumbing (the TxLogProcessStormSpec pattern) -------- //

  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private def spawn(table: String, writerId: Long, n: Int,
                    mode: String): (Process, java.io.File) = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cmd = (Seq(java) ++ addOpens ++ Seq(
      "-Xmx2g",
      "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.TxLogStormProc", table, writerId.toString, n.toString, mode))
    val log = Files.createTempFile("cstore-storm", ".log").toFile
    (new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start(), log)
  }

  private def awaitOk(p: Process, log: java.io.File, what: String): Unit = {
    val rc = p.waitFor()
    if (rc != 0) {
      val tail = scala.util.Try(
        new String(Files.readAllBytes(log.toPath)).takeRight(4000))
        .getOrElse("<child log unreadable>")
      fail(s"$what exited $rc; child log tail:\n$tail")
    }
  }
}
