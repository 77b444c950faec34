package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** Cross-process OCC storm (round-12 VERDICT #6): every prior storm spec
  * raced writers as THREADS of one JVM, which shares everything above the
  * filesystem — this one spawns two REAL java processes (each with its own
  * SparkSession) racing appends, optimize, and a retention-windowed vacuum
  * on one table. What it pins: the link(2) CAS serializes across process
  * boundaries (contiguous version history, no lost commit), the rebase
  * loops converge under real contention, vacuum's mtime window protects a
  * concurrent writer's staged-but-uncommitted files, and the final log
  * replays cleanly — every appended row exactly once. */
class TxLogProcessStormSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-proc-storm", cores = 4)
  override def afterAll(): Unit = spark.stop()

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
    val log = Files.createTempFile("storm-out", ".log").toFile
    (new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start(), log)
  }

  /** Child exit must be 0; on failure the child's log tail IS the
    * diagnosis (an opaque "process failed" hid an entire round's only
    * red test), so surface it in the assertion message. */
  private def awaitOk(p: Process, log: java.io.File, what: String): Unit = {
    val rc = p.waitFor()
    if (rc != 0) {
      val tail = scala.util.Try(
        new String(Files.readAllBytes(log.toPath)).takeRight(4000))
        .getOrElse("<child log unreadable>")
      fail(s"$what exited $rc; child log tail:\n$tail")
    }
  }

  test("two real JVMs racing appends + optimize + vacuum serialize cleanly") {
    val table = Files.createTempDirectory("graft-proc-storm")
      .resolve("t").toString
    val nPer = 5
    val (p1, l1) = spawn(table, 1L, nPer, "append")
    val (p2, l2) = spawn(table, 2L, nPer, "mixed")
    awaitOk(p1, l1, "append writer process")
    awaitOk(p2, l2, "mixed writer process")
    // serialized, gapless history: the CAS admitted exactly one winner per
    // version number across process boundaries
    val vs = TxLog.versions(table)
    assert(vs == (1L to vs.size))
    // no lost commit, no duplicate, no resurrection: every appended row
    // exactly once (optimize only rearranges; vacuum's retention window
    // never touched a young staged file)
    val got = TxLog.read(spark, table).select(col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val expect = ((0 until nPer).map(i => 1000L + i) ++
      (0 until nPer).map(i => 2000L + i)).sorted
    assert(got == expect)
    // the log replays without error through a checkpoint too
    TxLog.checkpoint(table)
    assert(TxLog.read(spark, table).count() == expect.size.toLong)
  }

  test("two real JVMs racing PARTITIONED appends + scoped optimize + vacuum") {
    val table = Files.createTempDirectory("graft-proc-storm-part")
      .resolve("t").toString
    val nPer = 5
    val (p1, l1) = spawn(table, 1L, nPer, "part-append")
    val (p2, l2) = spawn(table, 2L, nPer, "part-mixed")
    awaitOk(p1, l1, "partitioned append writer process")
    awaitOk(p2, l2, "partitioned mixed writer process")
    val vs = TxLog.versions(table)
    assert(vs == (1L to vs.size))
    // every appended row exactly once, and every live file still
    // carries a single-valued partition tuple after the storm
    val got = TxLog.read(spark, table).select(col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq
    val expect = ((0 until nPer).map(i => 1000L + i) ++
      (0 until nPer).map(i => 2000L + i)).sorted
    assert(got == expect)
    assert(TxLog.snapshotAdds(table).forall(_.part.isDefined))
    assert(TxLog.partColsOf(table) == Seq("part"))
    // partition listing still exact post-storm
    assert(TxLog.partitions(table).map(_.numRows.getOrElse(-1L)).sum ==
      expect.size.toLong)
  }
}
