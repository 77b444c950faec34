package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GraftSession
import graft.etl.TxLog

/** TxLog — the r10 VERDICT #7 stretch: concurrent-writer isolation and
  * time-travel read == historical snapshot, over the minimal
  * commit-log protocol (atomic version publish + snapshot replay). */
class TxLogSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("txlog-spec", cores = 4)
  override def afterAll(): Unit = spark.stop()

  private def tmp(): String =
    Files.createTempDirectory("graft-txlog").resolve("t").toString

  test("append/overwrite version the table; time travel reads history") {
    import spark.implicits._
    val t = tmp()
    val v1 = TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val v2 = TxLog.overwrite(spark, t, Seq((10L, "x")).toDF("id", "s"))
    val v3 = TxLog.append(spark, t, Seq((11L, "y")).toDF("id", "s"))
    assert(Seq(v1, v2, v3) == Seq(1L, 2L, 3L))
    assert(TxLog.versions(t) == Seq(1L, 2L, 3L))
    // latest = overwrite + append
    assert(TxLog.read(spark, t).select(col("id")).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(10L, 11L))
    // as-of v1 = the original rows, untouched by the later overwrite
    assert(TxLog.read(spark, t, asOf = Some(1L))
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    // as-of v2 sees only the overwrite
    assert(TxLog.read(spark, t, asOf = Some(2L))
      .select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("concurrent appenders serialize: no lost commits, sequential versions") {
    import spark.implicits._
    val t = tmp()
    val writers = 4; val commitsEach = 5
    val pool = Executors.newFixedThreadPool(writers)
    val start = new CountDownLatch(1)
    val futures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          (0 until commitsEach).foreach { i =>
            TxLog.append(spark, t,
              Seq((w * 100L + i, s"w$w-$i")).toDF("id", "s"))
          }
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    // every commit made it, versions are gapless 1..N
    assert(TxLog.versions(t) == (1L to (writers * commitsEach)).toSeq)
    val ids = TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = (for (w <- 0 until writers; i <- 0 until commitsEach)
      yield w * 100L + i).sorted
    assert(ids == want, "no append lost under contention")
  }

  test("overwrite racing appends never resurrects removed files or drops adds") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "seed")).toDF("id", "s"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fo = pool.submit(new Runnable { def run(): Unit = {
      start.await(); TxLog.overwrite(spark, t, Seq((100L, "ow")).toDF("id", "s")) } })
    val fa = pool.submit(new Runnable { def run(): Unit = {
      start.await(); TxLog.append(spark, t, Seq((200L, "ap")).toDF("id", "s")) } })
    start.countDown()
    fo.get(120, TimeUnit.SECONDS); fa.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val ids = TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    // serializable outcomes only: append-then-overwrite -> {100};
    // overwrite-then-append -> {100, 200}. Never {1,...} (resurrected
    // seed) and never {} / {200} alone (lost overwrite add).
    assert(ids == Seq(100L) || ids == Seq(100L, 200L), s"got $ids")
  }

  test("streaming ingest is exactly-once: crash replay of a committed batch is a no-op") {
    import spark.implicits._
    val t = tmp()
    val root = Files.createTempDirectory("graft-txstream")
    val (in, cp) = (root.resolve("in").toString, root.resolve("cp").toString)
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(in)
    val stream = spark.readStream
      .schema(Seq((0L, "")).toDF("id", "s").schema).parquet(in)
    graft.streaming.TxLogStream.ingest(spark, stream, t, cp)
    val after1 = TxLog.read(spark, t).count()
    assert(after1 == 2L)
    // crash replay: checkpoint lost the last commit -> the sink re-runs
    // batch 0 with the same rows; the txn marker makes it a no-op
    graft.streaming.TxLogStream.processBatch(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), t, "graft-ingest", 0L)
    assert(TxLog.read(spark, t).count() == 2L, "replayed batch duplicated rows")
    // new data in a later batch still appends (marker is per batch id)
    Seq((3L, "c")).toDF("id", "s").write.mode("append").parquet(in)
    val stream2 = spark.readStream
      .schema(Seq((0L, "")).toDF("id", "s").schema).parquet(in)
    graft.streaming.TxLogStream.ingest(spark, stream2, t, cp)
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("incremental changes() unions to the full append-only table") {
    import spark.implicits._
    val t = tmp()
    val v1 = TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    val v2 = TxLog.append(spark, t, Seq((2L, "b"), (3L, "c")).toDF("id", "s"))
    val v3 = TxLog.append(spark, t, Seq((4L, "d")).toDF("id", "s"))
    // consumer checkpoints: from 0 -> v1, then v1 -> v3
    val inc1 = TxLog.changes(spark, t, 0L, Some(v1))
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    val inc2 = TxLog.changes(spark, t, v1, Some(v3))
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(inc1 == Seq(1L))
    assert(inc2 == Seq(2L, 3L, 4L))
    // union of increments == full table (exactly-once increments)
    val full = TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert((inc1 ++ inc2).sorted == full)
    assert(v2 == 2L)
  }

  test("checkpoint compacts replay without changing any snapshot, past or future") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.overwrite(spark, t, Seq((2L, "b")).toDF("id", "s"))
    val preCp = TxLog.snapshot(t)
    val cv = TxLog.checkpoint(t)
    assert(cv == 2L && TxLog.checkpoints(t) == Seq(2L))
    // checkpointed snapshot identical; checkpoint is idempotent
    assert(TxLog.snapshot(t) == preCp)
    assert(TxLog.checkpoint(t) == 2L)
    // commits after the checkpoint replay on top of it
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s"))
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // time travel BEFORE the checkpoint still works (version files kept)
    assert(TxLog.read(spark, t, asOf = Some(1L)).select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // exactly-once markers survive checkpointing
    TxLog.appendOnce(spark, t, Seq((9L, "z")).toDF("id", "s"), "app/0")
    TxLog.checkpoint(t)
    assert(TxLog.appendOnce(spark, t, Seq((9L, "z")).toDF("id", "s"), "app/0").isEmpty)
  }

  test("optimize compacts files without changing content; concurrent appends survive") {
    import spark.implicits._
    val t = tmp()
    (1 to 4).foreach(i => TxLog.append(spark, t,
      Seq((i.toLong, s"r$i")).toDF("id", "s")))
    assert(TxLog.snapshot(t).size >= 4)
    // racing append while optimize runs: its files must never be removed
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fo = pool.submit(new Runnable { def run(): Unit = {
      start.await(); TxLog.optimize(spark, t, targetFiles = 1) } })
    val fa = pool.submit(new Runnable { def run(): Unit = {
      start.await(); TxLog.append(spark, t, Seq((99L, "late")).toDF("id", "s")) } })
    start.countDown()
    fo.get(120, TimeUnit.SECONDS); fa.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val ids = TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L, 4L, 99L), s"content changed: $ids")
  }

  test("deleteWhere removes matching rows only; unaffected files untouched") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, "keep"), (2L, "purge")).toDF("id", "s").coalesce(1)) // v1
    TxLog.append(spark, t,
      Seq((10L, "keep"), (11L, "keep")).toDF("id", "s").coalesce(1)) // v2
    val before = TxLog.snapshot(t)
    val v = TxLog.deleteWhere(spark, t, col("s") === "purge")
    assert(v.contains(3L))
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 10L, 11L))
    // copy-on-write: the file with no matching rows is still live at its
    // original path — only the affected file was rewritten
    val after = TxLog.snapshot(t).toSet
    assert(before.count(after) == 1, s"before=$before after=$after")
    // time travel before the delete still reads the purged row; erasure
    // completes at vacuum, not at delete
    assert(TxLog.read(spark, t, asOf = Some(2L))
      .filter(col("s") === "purge").count() == 1)
  }

  test("deleteWhere: no match commits nothing; NULL-predicate rows survive") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t,
      Seq((1L, Some("a")), (2L, None: Option[String])).toDF("id", "s"))
    assert(TxLog.deleteWhere(spark, t, col("s") === "zzz").isEmpty)
    assert(TxLog.versions(t) == Seq(1L), "a no-op delete published a version")
    // cond is NULL on the null row: it must survive (TRUE deletes only)
    assert(TxLog.deleteWhere(spark, t, col("s") === "a").contains(2L))
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("deleteWhere drops a wholly-deleted file without staging a rewrite") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "x")).toDF("id", "s").coalesce(1))
    TxLog.append(spark, t, Seq((2L, "y")).toDF("id", "s").coalesce(1))
    assert(TxLog.deleteWhere(spark, t, col("s") === "x").contains(3L))
    assert(TxLog.snapshot(t).size == 1, "emptied file should not be replaced")
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("deleteWhere racing an append never loses the appended rows") {
    import spark.implicits._
    val t = tmp()
    (1 to 3).foreach(i => TxLog.append(spark, t,
      Seq((i.toLong, if (i == 2) "purge" else "keep")).toDF("id", "s")))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fd = pool.submit(new Runnable { def run(): Unit = {
      start.await(); TxLog.deleteWhere(spark, t, col("s") === "purge") } })
    val fa = pool.submit(new Runnable { def run(): Unit = {
      start.await(); TxLog.append(spark, t, Seq((99L, "late")).toDF("id", "s")) } })
    start.countDown()
    fd.get(120, TimeUnit.SECONDS); fa.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // serializable outcomes only: the delete removes id=2 and NOTHING
    // else; the racing append's row always survives (rebase semantics)
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 99L))
  }

  test("mixed append/optimize/delete storm serializes to exact final content") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((0L, 0L)).toDF("id", "grp"))
    // 3 appenders (disjoint id ranges, grp = appender), 1 compactor,
    // 1 deleter (grp === 2 only) — all racing from a common latch
    val pool = Executors.newFixedThreadPool(5)
    val start = new CountDownLatch(1)
    val futs = (1 to 3).map { a =>
      pool.submit(new Runnable { def run(): Unit = {
        start.await()
        (0 until 4).foreach { i =>
          TxLog.append(spark, t,
            Seq((a * 100L + i, a.toLong)).toDF("id", "grp")) }
      } })
    } :+ pool.submit(new Runnable { def run(): Unit = {
      start.await()
      (0 until 3).foreach(_ => TxLog.optimize(spark, t, targetFiles = 2))
    } }) :+ pool.submit(new Runnable { def run(): Unit = {
      start.await()
      (0 until 3).foreach(_ => TxLog.deleteWhere(spark, t, col("grp") === 2L))
    } })
    start.countDown()
    futs.foreach(_.get(300, TimeUnit.SECONDS))
    pool.shutdown()
    // a final delete after the storm: NOTHING of grp 2 survives, and
    // every other row appended by anyone is present exactly once
    TxLog.deleteWhere(spark, t, col("grp") === 2L)
    val ids = TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(ids == (Seq(0L) ++ (0 until 4).flatMap(i =>
      Seq(100L + i, 300L + i))).sorted)
    // the log replays cleanly at EVERY committed version (no torn state)
    TxLog.versions(t).foreach(v => TxLog.snapshot(t, Some(v)))
    // vacuum to latest-2 still reads the final snapshot
    TxLog.vacuum(t, retainVersions = 2, minAgeMillis = 0)
    assert(TxLog.read(spark, t).count() == ids.size)
  }

  test("CDC tail: replays before ack, delivers deltas after, exactly-once downstream") {
    import spark.implicits._
    import graft.streaming.TxLogStream
    val src = tmp(); val dst = tmp()
    val ckpt = Files.createTempDirectory("graft-tail").toString
    TxLog.append(spark, src, Seq((1L, "a")).toDF("id", "s"))
    TxLog.append(spark, src, Seq((2L, "b")).toDF("id", "s"))
    // first poll sees the whole backlog (0, 2]
    val inc1 = TxLogStream.Tail.poll(spark, src, ckpt).get
    assert((inc1.fromV, inc1.toV) == (0L, 2L))
    assert(inc1.df.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
    // crash between process and ack: a fresh poll replays the SAME increment
    val replay = TxLogStream.Tail.poll(spark, src, ckpt).get
    assert((replay.fromV, replay.toV) == (0L, 2L))
    // downstream writes with the tail marker: the replayed delivery is a
    // no-op in dst, and the duplicate ack is idempotent
    def deliver(i: TxLogStream.Increment): Unit = {
      TxLog.appendOnce(spark, dst, i.df, s"tail:${i.toV}"); i.ack()
    }
    deliver(inc1); deliver(replay)
    assert(TxLog.read(spark, dst).count() == 2)
    // caught up → None; a new commit → only the delta
    assert(TxLogStream.Tail.poll(spark, src, ckpt).isEmpty)
    TxLog.append(spark, src, Seq((3L, "c")).toDF("id", "s"))
    val inc2 = TxLogStream.Tail.poll(spark, src, ckpt).get
    assert((inc2.fromV, inc2.toV) == (2L, 3L))
    deliver(inc2)
    assert(TxLog.read(spark, dst).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("schema-on-write: new column refused without mergeSchema; evolution binds reads") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    // undeclared new column → refused, nothing published
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((2L, "b", 1.5)).toDF("id", "s", "score"))
    }
    assert(TxLog.versions(t) == Seq(1L), "refused append published a version")
    // a column changing type is refused even with mergeSchema
    intercept[IllegalArgumentException] {
      TxLog.append(spark, t, Seq((3, 9L)).toDF("id", "s"), mergeSchema = true)
    }
    // evolution: union schema declared in the SAME commit as the data
    TxLog.append(spark, t,
      Seq((2L, "b", 1.5)).toDF("id", "s", "score"), mergeSchema = true)
    val out = TxLog.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    // the pre-evolution file surfaces null in the new column (schema
    // binds from the log, not from whichever footer gets sampled)
    assert(out.filter(col("id") === 1L).select(col("score")).head().isNullAt(0))
    // time travel BEFORE the evolution binds the contemporary declaration
    assert(TxLog.read(spark, t, asOf = Some(1L)).schema.fieldNames.toSeq
      == Seq("id", "s"))
    // a SUBSET append is fine as-is: its rows read with the missing
    // column as null
    TxLog.append(spark, t, Seq(Tuple1(5L)).toDF("id"))
    assert(TxLog.read(spark, t).filter(col("id") === 5L)
      .select(col("s"), col("score")).head().anyNull)
  }

  test("optimize and deleteWhere bind the declared schema on evolved tables") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    TxLog.append(spark, t,
      Seq((3L, "c", 1.5)).toDF("id", "s", "score"), mergeSchema = true)
    // compaction must not take the pre-evolution footer and drop `score`
    TxLog.optimize(spark, t, targetFiles = 1)
    val out = TxLog.read(spark, t)
    assert(out.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    assert(out.filter(col("id") === 3L)
      .select(col("score")).head().getDouble(0) == 1.5)
    assert(out.filter(col("id") === 1L).select(col("score")).head().isNullAt(0))
    // delete on the EVOLVED column: pre-evolution rows evaluate it as
    // null (predicate not TRUE) and must survive with full width
    TxLog.deleteWhere(spark, t, col("score") > 1.0)
    val left = TxLog.read(spark, t)
    assert(left.schema.fieldNames.toSeq == Seq("id", "s", "score"))
    assert(left.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L))
  }

  test("overwrite redefines the declared schema; old snapshots keep theirs") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))
    TxLog.overwrite(spark, t, Seq((9L, true)).toDF("k", "flag"))
    assert(TxLog.read(spark, t).schema.fieldNames.toSeq == Seq("k", "flag"))
    val old = TxLog.read(spark, t, asOf = Some(1L))
    assert(old.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(old.select(col("id")).head().getLong(0) == 1L)
  }

  test("vacuum deletes only out-of-retention files; recent time travel intact") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))     // v1
    TxLog.overwrite(spark, t, Seq((2L, "b")).toDF("id", "s"))  // v2 removes v1's file
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s"))     // v3
    val deleted = TxLog.vacuum(t, retainVersions = 2, minAgeMillis = 0)          // keep v2, v3 views
    assert(deleted.nonEmpty, "v1's overwritten file should be vacuumed")
    // v2 and v3 snapshots still read
    assert(TxLog.read(spark, t, asOf = Some(2L)).select(col("id"))
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(TxLog.read(spark, t).select(col("id")).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    // v1 time travel is out of retention: its file is gone
    val v1Files = TxLog.snapshot(t, Some(1L))
    assert(v1Files.exists(p => !java.nio.file.Files.exists(
      java.nio.file.Paths.get(t, p))), "out-of-retention file still on disk")
  }

  test("vacuum retention window spares files younger than minAgeMillis") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"))     // v1
    TxLog.overwrite(spark, t, Seq((2L, "b")).toDF("id", "s"))  // v2 orphans v1's file
    // default window: v1's file is unreferenced by retained snapshots but
    // SECONDS old — exactly what a racing writer's staged-not-yet-committed
    // file looks like, so it must survive (round-12, ADVICE medium)
    assert(TxLog.vacuum(t, retainVersions = 1).isEmpty)
    TxLog.snapshot(t, Some(1L)).foreach(p => assert(java.nio.file.Files
      .exists(java.nio.file.Paths.get(t, p)), s"young file $p deleted"))
    // quiescence asserted by the caller: age 0 reclaims it
    assert(TxLog.vacuum(t, retainVersions = 1, minAgeMillis = 0).nonEmpty)
  }

  test("txn markers and log fields reject quote/backslash/control chars") {
    import spark.implicits._
    val t = tmp()
    val df = Seq((1L, "a")).toDF("id", "s")
    // one bad marker would poison every later snapshot replay — refuse it
    // at the API boundary, BEFORE any data stages (round-12, ADVICE)
    Seq("app\"x/1", "app\\x/2", "app\nx/3").foreach { bad =>
      intercept[IllegalArgumentException](TxLog.appendOnce(spark, t, df, bad))
    }
    assert(TxLog.versions(t).isEmpty, "a refused marker still committed")
    assert(TxLog.appendOnce(spark, t, df, "app-x/1").contains(1L))
  }

  test("CHECK constraints gate writes; NULL passes; drop restores") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, Some("a"))).toDF("id", "s"))
    TxLog.addConstraint(spark, t, "pos_id", "id > 0")
    // a constraint born violated is refused with no commit
    intercept[IllegalArgumentException](
      TxLog.addConstraint(spark, t, "impossible", "id > 100"))
    assert(!TxLog.constraintsOf(t).contains("impossible"))
    // violating append rejected BEFORE committing anything
    intercept[IllegalArgumentException](TxLog.append(spark, t,
      Seq((-5L, Some("bad"))).toDF("id", "s")))
    assert(TxLog.read(spark, t).count() == 1L)
    // NULL predicate result passes (SQL CHECK three-valued logic)
    TxLog.append(spark, t, Seq((null.asInstanceOf[java.lang.Long], Some("n")))
      .toDF("id", "s").selectExpr("CAST(id AS BIGINT) AS id", "s"))
    // merge and overwrite are gated too
    intercept[IllegalArgumentException](TxLog.merge(spark, t,
      Seq((-7L, Some("x"))).toDF("id", "s"), Seq("id")))
    intercept[IllegalArgumentException](TxLog.overwrite(spark, t,
      Seq((-1L, Some("y"))).toDF("id", "s")))
    // drop the constraint: the same write now lands
    TxLog.dropConstraint(t, "pos_id")
    TxLog.append(spark, t, Seq((-5L, Some("ok"))).toDF("id", "s"))
    assert(TxLog.read(spark, t).filter(col("id") === -5L).count() == 1L)
  }

  test("constraint DDL racing a violating write: never both live (storm)") {
    import spark.implicits._
    // In every interleaving exactly one order exists: either the append
    // serialized first (the DDL's as-of-base validation then sees the
    // violating row and refuses) or the DDL serialized first (the
    // append's claim-target recheck sees the new constraint and
    // refuses). A live constraint coexisting with a visible violating
    // row would mean one of the two validated against a stale snapshot.
    (1 to 6).foreach { trial =>
      val t = tmp()
      TxLog.append(spark, t, Seq((1L, "ok")).toDF("id", "s"))
      val pool = Executors.newFixedThreadPool(2)
      val start = new CountDownLatch(1)
      val ddl = pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { start.await()
          try { TxLog.addConstraint(spark, t, "pos", "id > 0"); true }
          catch { case _: IllegalArgumentException => false } }
      })
      val wr = pool.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { start.await()
          try { TxLog.append(spark, t, Seq((-9L, "bad")).toDF("id", "s")); true }
          catch { case _: IllegalArgumentException => false } }
      })
      start.countDown()
      val ddlLanded = ddl.get(120, TimeUnit.SECONDS)
      val badLanded = wr.get(120, TimeUnit.SECONDS)
      pool.shutdown()
      val constraintLive = TxLog.constraintsOf(t).contains("pos")
      val badVisible = TxLog.read(spark, t).filter(col("id") < 0L).count() > 0
      assert(constraintLive == ddlLanded && badVisible == badLanded,
        s"trial $trial: outcome bookkeeping inconsistent")
      assert(!(constraintLive && badVisible),
        s"trial $trial: constraint live AND violating row visible " +
          s"(ddl=$ddlLanded write=$badLanded) — a stale-snapshot validation slipped through")
    }
  }

  test("AS OF TIMESTAMP resolves versions; boundary reads its commit") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"), commitTs = Some(1000L))
    TxLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"), commitTs = Some(2000L))
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s"), commitTs = Some(3000L))
    assert(TxLog.timestampOf(t, 2L).contains(2000L))
    // strictly between commits → the earlier version
    assert(TxLog.versionAsOf(t, 1500L).contains(1L))
    // EXACTLY at a commit's timestamp → that version (boundary contract)
    assert(TxLog.versionAsOf(t, 2000L).contains(2L))
    // after the head → latest; before the first → none
    assert(TxLog.versionAsOf(t, 99999L).contains(3L))
    assert(TxLog.versionAsOf(t, 999L).isEmpty)
    intercept[IllegalArgumentException](TxLog.readAsOfTimestamp(spark, t, 999L))
    assert(TxLog.readAsOfTimestamp(spark, t, 2500L).select(col("id"))
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("merge: matched rows replaced, unmatched inserted, cold files untouched") {
    import spark.implicits._
    val t = tmp()
    // exactly two files: ids 1-2 and ids 10-11
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1))
    TxLog.append(spark, t, Seq((10L, "x"), (11L, "y")).toDF("id", "s").coalesce(1))
    val before = TxLog.snapshot(t).toSet
    assert(before.size == 2)
    // source touches only the first file's keys (update 2) + inserts 3
    val v = TxLog.merge(spark, t,
      Seq((2L, "B2"), (3L, "c")).toDF("id", "s"), Seq("id"))
    assert(v == 3L)
    assert(TxLog.read(spark, t).collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c"), (10L, "x"), (11L, "y")))
    // copy-on-write: the untouched file is still live at its original path
    val after = TxLog.snapshot(t).toSet
    assert(before.count(after) == 1, s"exactly the cold file should survive")
    // time travel pre-merge still reads the old row
    assert(TxLog.read(spark, t, asOf = Some(2L))
      .filter(col("id") === 2L).head().getString(1) == "b")
  }

  test("merge: empty table inserts everything; duplicate source keys refused") {
    import spark.implicits._
    val t = tmp()
    assert(TxLog.merge(spark, t, Seq((1L, "a")).toDF("id", "s"), Seq("id")) == 1L)
    assert(TxLog.read(spark, t).count() == 1L)
    intercept[IllegalArgumentException](TxLog.merge(spark, t,
      Seq((5L, "x"), (5L, "y")).toDF("id", "s"), Seq("id")))
    assert(TxLog.versions(t) == Seq(1L), "refused merge must not commit")
  }

  test("merge races an append: both serialize, no rows lost") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val f1 = pool.submit(new Runnable { def run(): Unit = { start.await()
      TxLog.merge(spark, t, Seq((2L, "B2"), (3L, "c")).toDF("id", "s"), Seq("id")); () } })
    val f2 = pool.submit(new Runnable { def run(): Unit = { start.await()
      TxLog.append(spark, t, Seq((100L, "z")).toDF("id", "s")); () } })
    start.countDown()
    f1.get(120, TimeUnit.SECONDS); f2.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    val got = TxLog.read(spark, t).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq((1L, "a"), (2L, "B2"), (3L, "c"), (100L, "z")),
      s"merge+append must both land: $got")
  }

  test("AS OF TIMESTAMP monotonizes skewed clocks (running-max rule)") {
    import spark.implicits._
    val t = tmp()
    TxLog.append(spark, t, Seq((1L, "a")).toDF("id", "s"), commitTs = Some(5000L))
    // a skewed writer records an EARLIER wall clock for a LATER version:
    // its effective timestamp is max(5000, 4000) = 5000, so no timestamp
    // can resolve v2 before v1
    TxLog.append(spark, t, Seq((2L, "b")).toDF("id", "s"), commitTs = Some(4000L))
    TxLog.append(spark, t, Seq((3L, "c")).toDF("id", "s"), commitTs = Some(6000L))
    assert(TxLog.versionAsOf(t, 4500L).isEmpty)   // before v1's 5000
    assert(TxLog.versionAsOf(t, 5000L).contains(2L)) // v1 AND skewed v2 at 5000
    assert(TxLog.versionAsOf(t, 5999L).contains(2L))
    assert(TxLog.versionAsOf(t, 6000L).contains(3L))
  }
}
