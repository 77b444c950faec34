package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{GraftSession, Tables}
import graft.operators.TextAnalysis

/** BPE merge learning + encoding contracts (q113/q114).
  *
  * The operator's merge application is a two-pass left-to-right
  * non-overlapping `replace` chain — chosen because Spark, DuckDB and
  * java.lang.String all implement `replace` with identical scan semantics,
  * making the merge reproducible across the engine, the oracle, and this
  * spec's driver-side reference. These tests pin:
  *   1. engine replace-chain == java.lang.String replace-chain on
  *      adversarial same-pair runs (cross-implementation agreement);
  *   2. the EXACT divergence shape vs textbook greedy BPE at long runs
  *      (identical ≤4, count-identical at 5, under-merges at ≥6) so the
  *      documented trade stays true;
  *   3. the full 5-step learn EQUALS an imperative Sennrich reference on
  *      the real corpus (whose max same-char run is 2 — far below the
  *      divergence threshold);
  *   4. parallelism-independence of the learned merge table;
  *   5. q114's per-document token counts == driver-side re-encode.
  */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = GraftSession.local("bpe-spec", cores = 4)
  val sf = "/root/testdata/sf0.001"

  override def afterAll(): Unit = spark.stop()

  // ---- driver-side references ------------------------------------------ //

  /** The operator's merge application, re-expressed on java.lang.String. */
  private def twoPass(sym: String, lhs: String, rhs: String): String = {
    val pat = s" $lhs $rhs "
    val rep = s" $lhs$rhs "
    (" " + sym + " ").replace(pat, rep).replace(pat, rep).trim
  }

  /** Textbook greedy left-to-right BPE merge application. */
  private def greedy(sym: String, lhs: String, rhs: String): String = {
    val t = sym.split(" ")
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < t.length) {
      if (i + 1 < t.length && t(i) == lhs && t(i + 1) == rhs) {
        out += (lhs + rhs); i += 2
      } else { out += t(i); i += 1 }
    }
    out.result().mkString(" ")
  }

  /** Imperative Sennrich learn: word-freq vocab, argmax pair by
    * (freq desc, pair asc), apply with `apply`, repeat. */
  private def learnRef(wordFreq: Map[String, Long], steps: Int,
                       apply: (String, String, String) => String): Seq[(Int, String, String, Long)] = {
    var vocab = wordFreq.toSeq.map { case (w, f) => (w.toCharArray.mkString(" "), f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to steps) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (sym, f) =>
        val t = sym.split(" ")
        var i = 0
        while (i < t.length - 1) {
          counts((t(i), t(i + 1))) = counts.getOrElse((t(i), t(i + 1)), 0L) + f
          i += 1
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), f) = counts.toSeq.minBy { case ((a, b), c) => (-c, s"$a $b") }
        out += ((step, l, r, f))
        vocab = vocab.map { case (sym, wf) => (apply(sym, l, r), wf) }
      }
    }
    out.result()
  }

  private def corpusWordFreq(docs: DataFrame): Map[String, Long] =
    docs.select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Evaluate the engine's replace-chain (same expression shape the
    * operator builds) on literal symbol strings. */
  private def engineTwoPass(sym: String, lhs: String, rhs: String): String = {
    val pat = lit(s" $lhs $rhs ")
    val rep = lit(s" $lhs$rhs ")
    val padded = concat(lit(" "), lit(sym), lit(" "))
    spark.range(1).select(
      trim(call_function("replace",
        call_function("replace", padded, pat, rep), pat, rep)).as("s"))
      .head().getString(0)
  }

  // ---- 1+2: replace-chain semantics on adversarial runs ---------------- //

  test("engine replace-chain == java.lang.String reference on runs 1..9") {
    for (n <- 1 to 9) {
      val sym = Seq.fill(n)("a").mkString(" ")
      assert(engineTwoPass(sym, "a", "a") == twoPass(sym, "a", "a"),
        s"run $n: Spark and java.lang.String replace semantics diverged")
    }
    // mixed-context run flanked by other symbols
    val mixed = "b " + Seq.fill(6)("a").mkString(" ") + " c"
    assert(engineTwoPass(mixed, "a", "a") == twoPass(mixed, "a", "a"))
  }

  test("documented divergence vs greedy: exact <=4, count-equal at 5, under-merge >=6") {
    for (n <- 1 to 4) {
      val sym = Seq.fill(n)("a").mkString(" ")
      assert(twoPass(sym, "a", "a") == greedy(sym, "a", "a"), s"run $n must be exact")
    }
    val r5 = Seq.fill(5)("a").mkString(" ")
    assert(twoPass(r5, "a", "a") != greedy(r5, "a", "a"), "run 5 sequence differs")
    assert(twoPass(r5, "a", "a").split(" ").length == greedy(r5, "a", "a").split(" ").length,
      "run 5 token count still equal")
    val r6 = Seq.fill(6)("a").mkString(" ")
    assert(twoPass(r6, "a", "a") == "aa a aa a", "run 6 pinned under-merge shape")
    assert(greedy(r6, "a", "a") == "aa aa aa")
  }

  // ---- 3: whole learn == Sennrich reference on real text --------------- //

  test("5-step learn equals imperative Sennrich reference on the corpus") {
    val docs = Tables.documents(spark, sf)
    val wf = corpusWordFreq(docs)
    // precondition that makes the coincidence valid: no long same-char runs
    val maxRun = wf.keys.map { w =>
      var best = 0; var cur = 0; var prev = '\u0000'
      w.foreach { c => cur = if (c == prev) cur + 1 else 1; prev = c; best = math.max(best, cur) }
      best
    }.max
    assert(maxRun <= 4, s"corpus grew a same-char run of $maxRun; coincidence proof invalid")

    val ref = learnRef(wf, TextAnalysis.BpeSteps, greedy)
    val got = TextAnalysis.learnBpeMerges(spark, docs)
    assert(got == ref, s"engine merges $got != Sennrich reference $ref")
  }

  // ---- 3b: batched learning == sequential on adversarial fixtures ------ //
  // The round-9 batched learner (selectExactBatch) must stay IDENTICAL to
  // one-merge-at-a-time Sennrich learning, including where batching is
  // dangerous: frequency ties across conflicting pairs, chained-symbol
  // conflicts (a b / b c), and merged-string aliasing (a+bc vs ab+c both
  // producing "abc"). learnRef(greedy) is the sequential reference.

  private def fixtureDocs(words: Seq[(String, Int)]): DataFrame = {
    import spark.implicits._
    words.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, Seq.fill(n)(w).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("batched learn == sequential reference on tie/conflict fixtures") {
    val fixtures = Seq(
      // chained conflicts: (a,b):10 ties (b,c):10 — batch must stop, not skip
      Seq("ab" -> 6, "abc" -> 4, "bc" -> 6),
      // disjoint ties: (a,b):8 and (c,d):8 merge together in one batch
      Seq("ab" -> 8, "cd" -> 8, "ef" -> 3),
      // plateau right below the batch: (a,b):9, (c,d):8, (b,e):8 — the
      // trim must drop (c,d) because it ties the conflicting (b,e)
      Seq("ab" -> 9, "cd" -> 8, "be" -> 8),
      // aliasing: step-1 merge creates "ab"; later (ab,c) vs (a,"bc")
      // decompositions of "abc" must not batch across the alias
      Seq("ab" -> 12, "abc" -> 7, "abd" -> 5),
      // uniform frequencies: everything ties everything
      Seq("ab" -> 5, "bc" -> 5, "cd" -> 5, "de" -> 5),
      // single repeated word: pure run-collapse
      Seq("aaaa" -> 7, "baab" -> 3)
    )
    for ((words, fi) <- fixtures.zipWithIndex; steps <- Seq(3, 5, 8)) {
      val docs = fixtureDocs(words)
      val wf = corpusWordFreq(docs)
      val ref = learnRef(wf, steps, greedy)
      val got = TextAnalysis.learnBpeMerges(spark, docs, steps)
      assert(got == ref,
        s"fixture $fi steps=$steps: batched $got != sequential $ref")
    }
  }

  test("selectExactBatch trims ties against the conflict frequency") {
    // (a,b):10 then (c,d):9 then (b,e):9 — (b,e) conflicts at f=9, so the
    // tied (c,d) must be trimmed out of the batch (sequential could pick a
    // NEW pair that ties 9 before (c,d))
    val sorted = IndexedSeq(("a b", 10L), ("c d", 9L), ("b e", 9L))
    val batch = TextAnalysis.selectExactBatch(sorted, 8, Set.empty[String], sawAllPairs = true)
    assert(batch == Seq(("a b", 10L)))
    // progress guarantee: first pair always survives even when it ties the
    // conflict (a single merge is the sequential argmax by definition)
    val tied = IndexedSeq(("a b", 9L), ("b c", 9L))
    assert(TextAnalysis.selectExactBatch(tied, 8, Set.empty[String], sawAllPairs = true)
      == Seq(("a b", 9L)))
    // a candidate whose SYMBOL is a prior merge product is normal BPE and
    // batches freely — only its MERGED STRING aliasing an existing symbol
    // is the hazard (it would let an existing pair's count increase)
    val okPrior = IndexedSeq(("x y", 10L), ("ab c", 9L), ("p q", 8L))
    assert(TextAnalysis.selectExactBatch(okPrior, 8, Set("ab"), sawAllPairs = true)
      == Seq(("x y", 10L), ("ab c", 9L), ("p q", 8L)))
    // merged-string aliasing a PRIOR merge symbol blocks the batch there:
    // (a,bc) would create "abc" which already exists as a symbol
    val alias = IndexedSeq(("x y", 10L), ("a bc", 9L), ("p q", 8L))
    assert(TextAnalysis.selectExactBatch(alias, 8, Set("abc"), sawAllPairs = true)
      == Seq(("x y", 10L)))
    // first pair itself aliasing still yields a singleton batch (it is the
    // sequential argmax regardless) — the learn loop must never stall
    val alias0 = IndexedSeq(("a bc", 9L), ("p q", 8L))
    assert(TextAnalysis.selectExactBatch(alias0, 8, Set("abc"), sawAllPairs = true)
      == Seq(("a bc", 9L)))
    // same-batch alias: (a,bc) and (ab,c) both produce "abc" — the second
    // must conflict via the batch's own used-set
    val dual = IndexedSeq(("a bc", 10L), ("ab c", 9L), ("p q", 8L))
    assert(TextAnalysis.selectExactBatch(dual, 8, Set.empty[String], sawAllPairs = true)
      == Seq(("a bc", 10L)))
    // truncated collect: the last collected frequency bounds the trim
    val trunc = IndexedSeq(("a b", 10L), ("c d", 9L))
    assert(TextAnalysis.selectExactBatch(trunc, 8, Set.empty[String], sawAllPairs = false)
      == Seq(("a b", 10L)))
    // full walk with no conflict keeps everything
    val free = IndexedSeq(("a b", 10L), ("c d", 9L))
    assert(TextAnalysis.selectExactBatch(free, 8, Set.empty[String], sawAllPairs = true)
      == Seq(("a b", 10L), ("c d", 9L)))
  }

  test("learned merge table is parallelism-independent") {
    val docs = Tables.documents(spark, sf)
    val base = TextAnalysis.learnBpeMerges(spark, docs)
    val repart = TextAnalysis.learnBpeMerges(spark, docs.repartition(7))
    assert(base == repart)
  }

  // ---- 5: encode counts == driver-side re-encode ----------------------- //

  test("q114 per-document BPE token counts match driver-side re-encode") {
    val docs = Tables.documents(spark, sf)
    val merges = TextAnalysis.learnBpeMerges(spark, docs)
    def encode(w: String): Int = {
      var sym = w.toCharArray.mkString(" ")
      merges.foreach { case (_, l, r, _) => sym = twoPass(sym, l, r) }
      sym.split(" ").length
    }
    val expected = docs.select(col("doc_id"), col("text")).collect().map { r =>
      val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
      r.getLong(0) -> toks.map(encode).sum
    }.toMap
    val got = TextAnalysis.bpeEncode(spark, docs).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == expected)
    // compression ratio is derived, n_char_syms positive
    TextAnalysis.bpeEncode(spark, docs).collect().foreach { r =>
      assert(r.getInt(1) > 0 && r.getInt(2) > 0)
      assert(math.abs(r.getDouble(3) - r.getInt(1).toDouble / r.getInt(2)) < 1e-12)
    }
  }
}
