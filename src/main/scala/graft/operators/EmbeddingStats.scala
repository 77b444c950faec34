package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.GramAggregator

/** Embedding-corpus statistics — the moment profile a training pipeline
  * computes before whitening, PCA, or distribution-shift checks: the exact
  * second-moment (Gram) matrix / covariance of the embedding column, and a
  * per-vector standardized outlier score derived from the same moments.
  *
  * Both queries ride ONE corpus scan through [[GramAggregator]] (partial
  * state: a single ~2 KB array per partition — no row inflation, no
  * d²-wide shuffle) and derive everything else from the exact integer
  * sums, so the cross-engine contract is integer-exact up to the final
  * closed-form double arithmetic, which both engines evaluate with the
  * identical IEEE op sequence.
  */
object EmbeddingStats {

  /** Pinned parameters shared by the queries' defaults AND the generated
    * oracle SQL (one source of truth, per the round-5 advice pattern). */
  private[operators] val EmbDim = 64
  private[operators] val ScaleBits = 20
  private val ScaleD = (1L << ScaleBits).toDouble          // 2^20
  private val Pow2s2 = (1L << (2 * ScaleBits)).toDouble    // 2^40
  private val tri = EmbDim * (EmbDim + 1) / 2

  /** floor(x·2^20) quantization — exact in float, double, and DuckDB
    * (power-of-two multiply only shifts the exponent), the same idiom the
    * ANN family uses (Similarity.scala sign sketches). */
  private def quantized(e: Column): Column =
    transform(e, x => floor(x.cast("double") * lit(ScaleD)).cast("long"))

  /** One-pass, single-row moment aggregate: (n, [triangle ++ sums]). */
  private def momentsRow(embs: DataFrame): DataFrame = {
    val gram = udaf(new GramAggregator(EmbDim), ExpressionEncoder[Array[Long]]())
    embs.agg(
      count(lit(1)).cast("long").as("n"),
      gram(quantized(col("embedding"))).as("m"))
  }

  /** q115 — exact Gram matrix + derived covariance, upper triangle.
    *
    * Scale shape: the corpus contributes exactly one scan (the aggregate
    * above); the d(d+1)/2-row output is produced by crossing the bounded
    * single-row aggregate with a driver-built (o,i,j) triangle-index
    * frame — both sides of that join are O(d²), nothing corpus-sized
    * moves. `gram` is the exact integer Σ q_i·q_j (bit-identical at any
    * parallelism, see GramAggregator overflow bound); `cov` is the
    * closed-form population covariance (Σqq - ΣqΣq/n)/n/2^40 evaluated in
    * the same double op order as the oracle SQL. */
  def gramMatrix(spark: SparkSession, embs: DataFrame): DataFrame = {
    import spark.implicits._
    val idx = (for (i <- 0 until EmbDim; j <- i until EmbDim) yield (i, j))
      .zipWithIndex.map { case ((i, j), o) => (o, i, j) }
      .toDF("o", "i", "j")
    val nD = col("n").cast("double")
    val si = element_at(col("m"), lit(tri) + col("i") + lit(1)).cast("double")
    val sj = element_at(col("m"), lit(tri) + col("j") + lit(1)).cast("double")
    idx.crossJoin(broadcast(momentsRow(embs)))
      .select(col("i"), col("j"),
        element_at(col("m"), col("o") + lit(1)).as("gram"),
        ((element_at(col("m"), col("o") + lit(1)).cast("double") - si * sj / nD)
          / nD / lit(Pow2s2)).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** q116 — per-vector standardized outlier score: Mahalanobis-lite
    * m_dist2 = Σ_k (q_k - μ_k)²/σ²_k over the quantized dims (the
    * diagonal-covariance approximation data-cleaning pipelines use; the
    * full-Σ version needs the q115 matrix inverse, a driver-side d×d
    * problem).
    *
    * Scale shape: the moment fit is the one bounded aggregate; the scoring
    * pass folds the d means/inverse-variances in as literals, so it is
    * scan-local — zero shuffles beyond the output sort, no broadcast that
    * grows with the corpus. The bounded single-row collect here is the
    * same class as the IVF centroid collect (k·d doubles).
    *
    * DETERMINISM: μ and 1/σ² derive from exact integer sums with the same
    * IEEE op sequence as the oracle; each score term is then bit-identical
    * cross-engine and only the 64-term summation ORDER is engine-specific
    * (~1e-13 absolute wiggle on an O(64) value) — round(6) on both sides
    * puts the flip probability per value near 1e-8, the same class as the
    * cosine family's accepted risk. */
  def outlierScores(spark: SparkSession, embs: DataFrame): DataFrame = {
    val head: Row = momentsRow(embs).head()
    val n = head.getLong(0)
    val m = head.getSeq[Long](1)
    val nD = n.toDouble
    def diag(k: Int): Int = { // row-major upper-triangle offset of (k,k)
      var o = 0; var i = 0
      while (i < k) { o += EmbDim - i; i += 1 }
      o
    }
    val mu = Array.tabulate(EmbDim)(k => m(tri + k).toDouble / nD)
    val iv = Array.tabulate(EmbDim) { k =>
      val vark = (m(diag(k)).toDouble - m(tri + k).toDouble * m(tri + k).toDouble / nD) / nD
      if (vark > 1e-9) 1.0 / vark else 0.0
    }
    val q = quantized(col("embedding"))
    val score = (0 until EmbDim).map { k =>
      val d = element_at(q, k + 1).cast("double") - lit(mu(k))
      d * d * lit(iv(k))
    }.reduce(_ + _)
    embs.select(col("vec_id"), graft.functions.Pin.grid6(score).as("m_dist2"))
      .orderBy(col("vec_id"))
  }

  /** q120 — per-label embedding mean/variance per dimension: the class
    * distribution profile a labeled-corpus audit runs (are classes
    * separable? did a source shift a class's centroid?).
    *
    * Scale shape: ONE grouped aggregate through GramAggregator — partial
    * state is |labels| x ~2 KB per partition, shuffle carries the same;
    * the 64-row dim expansion happens on the |labels|-row aggregate via a
    * bounded broadcast cross join, never on the corpus. Mean/variance are
    * the same closed-form exact-integer derivations as q115/q116. */
  def labelMoments(spark: SparkSession, embs: DataFrame): DataFrame = {
    import spark.implicits._
    val gram = udaf(new GramAggregator(EmbDim), ExpressionEncoder[Array[Long]]())
    val agg = embs.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        gram(quantized(col("embedding"))).as("m"))
    // (dim, row-major diagonal offset) — driver-built, d rows
    val idx = (0 until EmbDim).map { k =>
      var o = 0; var i = 0
      while (i < k) { o += EmbDim - i; i += 1 }
      (k, o)
    }.toDF("i", "o")
    val nD = col("n").cast("double")
    val sv = element_at(col("m"), lit(tri) + col("i") + lit(1)).cast("double")
    val svv = element_at(col("m"), col("o") + lit(1)).cast("double")
    agg.crossJoin(broadcast(idx))
      .select(col("label"), col("i"), col("n"),
        (sv / nD / lit(ScaleD)).as("mean"),
        ((svv - sv * sv / nD) / nD / lit(Pow2s2)).as("variance"))
      .orderBy(col("label"), col("i"))
  }

  /** q135's pinned projected dimensionality. */
  private[operators] val JlK = 16

  /** ±1 sign for projection row j, input dim i — bit 0 of the cross-engine
    * h60 md5 prefix of "j-i" (the SAME convention as q26's LSH hyperplane
    * signs, so the oracle recomputes the identical matrix). */
  private def jlSign(j: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j-$i".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 1L) 1L else -1L
  }

  /** q135 — Johnson-Lindenstrauss random projection (Achlioptas 2003
    * database-friendly ±1 variant, public): project each d-dim embedding
    * to `k` dims through a deterministic hash-derived ±1 matrix. Distances
    * are preserved within (1±ε) after 1/√k scaling (spec-pinned on real
    * pairs); the k-dim sketch then feeds any downstream ANN/clustering at
    * d/k of the memory and FLOPs.
    *
    * Scale shape: the k×d sign matrix is a PLAN LITERAL (1 KB — computed
    * once driver-side, serialized into the codegen'd expression; nothing
    * broadcast, nothing joined); projection is one scan-local
    * zip_with/aggregate chain per output dim — zero shuffles beyond the
    * output sort. Integer-exact: inputs are floor(e·2^20) longs (the
    * module's quantization idiom), signs are ±1, so every projected
    * coordinate is an exact long both engines compute identically. */
  def jlProject(embs: DataFrame, k: Int = JlK): DataFrame = {
    val q = quantized(col("embedding"))
    val projections = (0 until k).map { j =>
      val signs = array((0 until EmbDim).map(i => lit(jlSign(j, i))): _*)
      aggregate(zip_with(q, signs, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
    }
    embs.select(col("vec_id"),
        posexplode(array(projections: _*)).as(Seq("j", "proj")))
      .select(col("vec_id"), col("j").cast("int").as("j"), col("proj"))
      .orderBy(col("vec_id"), col("j"))
  }

  // --------------------------------------------------------------------- //

  /** q152 — diagonal whitening of the embedding corpus: every (vector,
    * dim) value standardized by the corpus per-dim mean/std, constant dims
    * (vr ≤ 1e-9, the q116 guard) dropped. The preprocessing step before
    * cosine/PCA work when dims have wildly different scales (whitening =
    * the diagonal-Σ special case of Mahalanobis, same moments as q116).
    *
    * Scale shape: per-dim moments are ONE partial+final aggregate on the
    * dim key (64 keys — map-side combine collapses each partition to d
    * rows before the exchange); the scoring pass joins the 64-row stat
    * frame back broadcast, so the corpus contributes two scans and no
    * corpus-sized shuffle. Sums are the exact quantized-integer moments of
    * the q115/q116 convention (long bound: Σv² overflows past ~8e17/2^40 ≈
    * 1e10·unit-norm rows — the momentCtes contract; decimal38 is the
    * stated fallback). mu/vr/w are the identical IEEE op chain both
    * engines evaluate; no cross-dim summation, so no rounding needed. */
  def whiten(spark: SparkSession, embs: DataFrame): DataFrame = {
    val s = embs.select(col("vec_id"),
      posexplode(quantized(col("embedding"))).as(Seq("i", "v")))
    val d = s.groupBy(col("i")).agg(
      sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"))
    val n = embs.agg(count(lit(1)).cast("long").as("n"))
    val nD = col("n").cast("double")
    val svD = col("sv").cast("double")
    val mu = svD / nD
    val vr = (col("svv").cast("double") - svD * svD / nD) / nD
    val mi = d.crossJoin(broadcast(n))
      .select(col("i"), mu.as("mu"), vr.as("vr"))
      .filter(col("vr") > 1e-9)
    s.join(broadcast(mi), Seq("i"))
      .select(col("vec_id"), col("i"),
        ((col("v").cast("double") - col("mu")) / sqrt(col("vr"))).as("w"))
      .orderBy(col("vec_id"), col("i"))
  }

  // ------------------------------------------------------------------ q210

  /** q210's pinned power-iteration round count (64-dim covariance: 8
    * rounds separate λ₁ comfortably on non-degenerate spectra). */
  private[operators] val PowerRounds = 8

  /** q210 — top principal component of the embedding covariance by
    * BOUNDED power iteration: v₀ = 1/√d uniform,
    * vᵣ = C·vᵣ₋₁ / ‖C·vᵣ₋₁‖; reports the per-dim loading, λ₁ ≈ ‖C·v₇‖,
    * trace(C), and the explained-variance ratio λ₁/tr — the
    * "is this embedding space collapsing onto one direction"
    * anisotropy diagnostic (Ethayarajh 2019; Mu & Viswanath 2018 —
    * dominant-PC removal) a pipeline checks before trusting cosine
    * geometry.
    *
    * Execution (round-10 rewrite of the 8-unrolled-in-plan-rounds
    * version, which spent 36 s of pure fixed overhead on 8 driver-
    * synchronized localCheckpoints of ≤64-row frames): the corpus
    * contributes ONE scan (the q115 GramAggregator moment row); the
    * d(d+1)/2 = 2080-double covariance is then collected once —
    * bounded driver state, the same class as the k-means centroid and
    * q116 moment collects — and the 8 d×d mat-vec rounds run
    * driver-side in microseconds. At 100 TB nothing changes: the scan
    * is the cost, the collect is 2080 doubles regardless of corpus.
    *
    * Determinism: cov derives from exact integer sums with the SAME
    * IEEE op order as the gramMatrix column expression; every mat-vec
    * entry and norm folds as floor(term·1e15) longs (order-free, ≤64
    * terms × |term| ≤ ~1e15 — no overflow), exactly the decimal
    * arithmetic the previous in-plan version and the DuckDB oracle's
    * unrolled CTE chain evaluate — hashes unchanged. The all-positive
    * v₀ pins the eigenvector sign. */
  def topPc(spark: SparkSession, embs: DataFrame): DataFrame = {
    import spark.implicits._
    val head: Row = momentsRow(embs).head()
    val n = head.getLong(0)
    val m = head.getSeq[Long](1)
    val nD = n.toDouble
    // cov(i,j) in gramMatrix's exact op order: (gram - si*sj/n)/n/2^40
    val cov = Array.ofDim[Double](EmbDim, EmbDim)
    var o = 0
    for (i <- 0 until EmbDim; j <- i until EmbDim) {
      val c = (m(o).toDouble -
        m(tri + i).toDouble * m(tri + j).toDouble / nD) / nD / Pow2s2
      cov(i)(j) = c; cov(j)(i) = c
      o += 1
    }
    def fp(x: Double): Long = math.floor(x * 1e15).toLong
    var v = Array.fill(EmbDim)(1.0 / math.sqrt(EmbDim.toDouble))
    var lambda1 = 0.0
    for (_ <- 1 to PowerRounds) {
      val w = Array.tabulate(EmbDim) { i =>
        var s = 0L; var j = 0
        while (j < EmbDim) { s += fp(cov(i)(j) * v(j)); j += 1 }
        s.toDouble / 1e15
      }
      var nsq = 0L
      w.foreach(wi => nsq += fp(wi * wi))
      lambda1 = math.sqrt(nsq.toDouble / 1e15)
      v = w.map(_ / lambda1)
    }
    var trL = 0L
    (0 until EmbDim).foreach(k => trL += fp(cov(k)(k)))
    val trace = trL.toDouble / 1e15
    (0 until EmbDim).map(j =>
        (j.toLong, v(j), lambda1, trace, lambda1 / trace))
      .toDF("dim", "loading", "lambda1", "trace", "explained_ratio")
      .orderBy(col("dim"))
  }

  // ------------------------------------------------ q232 matryoshka CKA

  /** q232's truncation width: CKA compares the full embedding against
    * its first-32-dim prefix (the q215 matryoshka retrieval view). */
  private[operators] val CkaPrefix = 32

  /** q232 — linear CKA (Kornblith et al. 2019) between the full
    * embedding matrix X and its [[CkaPrefix]]-dim matryoshka truncation
    * Y: CKA = ‖ȲᵀX̄‖²_F / (‖X̄ᵀX̄‖_F·‖ȲᵀȲ‖_F). q215 measures what
    * truncation does to a RETRIEVAL metric (recall@k); CKA measures how
    * much of the representation GEOMETRY the prefix preserves — the
    * standard representation-similarity readout. Because Y is a prefix
    * of X, every block norm is a weighted sum over the ONE covariance
    * triangle q115 already computes: no second corpus pass, no d×d
    * cross-join.
    *
    * Exactness: rides q115's moment chain (exact 2^20-grid integers →
    * the pinned cov double); each cov² enters as floor(cov²·1e15) — an
    * exact long (cov² ≤ 0.0625 ⇒ ≤ 6.25e13 < 2^53) — so the three
    * block sums are order-free integers and CKA is one terminal chain.
    *
    * Scale shape: ONE corpus scan through GramAggregator (the q115
    * plan); everything after runs on the 2080-row triangle frame. */
  def ckaMatryoshka(spark: SparkSession, embs: DataFrame): DataFrame = {
    val gm = gramMatrix(spark, embs)
    val c2 = floor(col("cov") * col("cov") * lit(1e15)).cast("long")
    val p = lit(CkaPrefix)
    val wxy = when(col("j") < p, when(col("i") === col("j"), 1L).otherwise(2L))
      .otherwise(when(col("i") < p, 1L).otherwise(0L))
    val wxx = when(col("i") === col("j"), 1L).otherwise(2L)
    val wyy = when(col("j") < p,
      when(col("i") === col("j"), 1L).otherwise(2L)).otherwise(0L)
    gm.select(c2.as("c2"), wxy.as("wxy"), wxx.as("wxx"), wyy.as("wyy"))
      .agg(sum(col("c2") * col("wxy")).as("sxy"),
        sum(col("c2") * col("wxx")).as("sxx"),
        sum(col("c2") * col("wyy")).as("syy"))
      .select(
        (col("sxy").cast("double") /
          sqrt(col("sxx").cast("double") * col("syy").cast("double")))
          .as("cka_linear"),
        (col("sxy").cast("double") / lit(1e15)).as("hsic_xy"),
        (col("sxx").cast("double") / lit(1e15)).as("hsic_xx"),
        (col("syy").cast("double") / lit(1e15)).as("hsic_yy"))
  }

  // -------------------------------------------------------- q230 HBOS

  /** q230's histogram geometry and report size: fixed-width buckets of
    * 1/8 per dimension (embeddings live in [-1, 1] after any sane
    * normalization), top-20 outliers reported. */
  private[operators] val HbosScale = 8.0
  private[operators] val HbosTopK = 20

  /** q230 — HBOS (Histogram-Based Outlier Score, Goldstein & Dengel
    * 2012): score(v) = Σ_d ln(n / count_d(bucket(v_d))) — the sum of
    * per-dimension negative log densities under fixed-width histograms.
    * The linear-time outlier detector that needs no pairwise distances
    * at all (q116's standardized-moment scorer assumes ellipsoidal
    * spread; HBOS catches per-coordinate density holes), so it runs at
    * corpus scale where kNN-based detectors cannot.
    *
    * Exactness: bucket = floor(x·8) on doubles (identical IEEE), counts
    * are exact integers, and the 64-term ln sum is accumulated as
    * floor(term·1e12) integers — order-free, so partial aggregation
    * cannot split engines. Top-k ties break by vec_id.
    *
    * Scale shape: one posexplode scan into a (dim, bucket) count — a
    * few hundred keys, broadcast back onto the same scan — then one
    * vec_id-keyed 64-row aggregate and a TakeOrdered top-k (per-
    * partition heaps, no global sort). Corpus-linear, no pairwise
    * work, histogram mergeable across shards by construction. */
  def hbosOutliers(embs: DataFrame, topK: Int = HbosTopK): DataFrame = {
    val terms = embs
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        floor(col("x").cast("double") * lit(HbosScale)).cast("long").as("b"))
    val hist = terms.groupBy(col("dim"), col("b")).agg(count(lit(1)).as("cnt"))
    val n = embs.agg(count(lit(1)).as("n"))
    terms.join(broadcast(hist), Seq("dim", "b"))
      .crossJoin(broadcast(n))
      .select(col("vec_id"),
        floor(graft.functions.Pin.grid9(
            log(col("n").cast("double") / col("cnt").cast("double"))) * lit(1e12))
          .cast("long").as("t"))
      .groupBy(col("vec_id"))
      .agg((sum(col("t")).cast("double") / lit(1e12)).as("hbos_score"))
      .orderBy(col("hbos_score").desc, col("vec_id"))
      .limit(topK)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q230_hbos" -> ((s, d) => hbosOutliers(Tables.embeddings(s, d))),
    "q232_cka" -> ((s, d) => ckaMatryoshka(s, Tables.embeddings(s, d))),
    "q210_top_pc" -> ((s, d) => topPc(s, Tables.embeddings(s, d))),
    "q152_embedding_whiten" -> ((s, d) => whiten(s, Tables.embeddings(s, d))),
    "q135_jl_project" -> ((s, d) => jlProject(Tables.embeddings(s, d))),
    "q115_embedding_gram" -> ((s, d) => gramMatrix(s, Tables.embeddings(s, d))),
    "q116_embedding_outliers" -> ((s, d) => outlierScores(s, Tables.embeddings(s, d))),
    "q120_label_moments" -> ((s, d) => labelMoments(s, Tables.embeddings(s, d)))
  )

  /** Shared moment CTEs: quantized per-(vec,dim) values, per-dim integer
    * sums, corpus count — the SQL twin of GramAggregator's buffer. */
  private val momentCtes: String =
    s"""WITH s AS (
       |  SELECT vec_id, CAST(r.i AS INT) AS i,
       |    CAST(floor(embedding[CAST(r.i AS INT) + 1] * ${1L << ScaleBits}) AS BIGINT) AS v
       |  FROM embeddings, unnest(range(0, $EmbDim)) AS r(i)),
       |d AS (
       |  SELECT i, CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv
       |  FROM s GROUP BY i),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)""".stripMargin

  /** q210 oracle, GENERATED with one (w, n, v) CTE triple per power
    * round — identical unrolled structure and fixed-point sums. */
  private def topPcOracle: String = {
    val rounds = (1 to PowerRounds).map { r =>
      val prev = if (r == 1) "v0" else s"v${r - 1}"
      s"""w$r AS (
         |  SELECT cf.i,
         |    CAST(sum(CAST(floor(cf.cov * $prev.vj * 1.0e15) AS HUGEINT))
         |      AS DOUBLE) / 1.0e15 AS wi
         |  FROM cf JOIN $prev ON $prev.j = cf.j GROUP BY cf.i),
         |n$r AS (
         |  SELECT sqrt(CAST(sum(CAST(floor(wi * wi * 1.0e15) AS HUGEINT))
         |    AS DOUBLE) / 1.0e15) AS nrm FROM w$r),
         |v$r AS (SELECT w$r.i AS j, wi / n$r.nrm AS vj
         |        FROM w$r CROSS JOIN n$r)""".stripMargin
    }.mkString(",\n")
    s"""$momentCtes,
       |g AS (
       |  SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS gram
       |  FROM s a JOIN s b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY 1, 2),
       |cv AS (
       |  SELECT g.i, g.j,
       |    (CAST(g.gram AS DOUBLE) - CAST(da.sv AS DOUBLE) * CAST(db.sv AS DOUBLE)
       |       / CAST(n.n AS DOUBLE)) / CAST(n.n AS DOUBLE)
       |       / ${1L << (2 * ScaleBits)}.0 AS cov
       |  FROM g
       |  JOIN d da ON da.i = g.i
       |  JOIN d db ON db.i = g.j
       |  CROSS JOIN n),
       |cf AS (
       |  SELECT i, j, cov FROM cv
       |  UNION ALL
       |  SELECT j AS i, i AS j, cov FROM cv WHERE i <> j),
       |v0 AS (SELECT CAST(r.i AS INT) AS j, 1.0 / sqrt(${EmbDim}.0) AS vj
       |       FROM unnest(range(0, $EmbDim)) AS r(i)),
       |$rounds,
       |tr AS (
       |  SELECT CAST(sum(CAST(floor(cov * 1.0e15) AS HUGEINT)) AS DOUBLE)
       |    / 1.0e15 AS trace
       |  FROM cv WHERE i = j)
       |SELECT CAST(v$PowerRounds.j AS BIGINT) AS dim, v$PowerRounds.vj AS loading,
       |  n$PowerRounds.nrm AS lambda1, tr.trace,
       |  n$PowerRounds.nrm / tr.trace AS explained_ratio
       |FROM v$PowerRounds CROSS JOIN n$PowerRounds CROSS JOIN tr
       |ORDER BY dim""".stripMargin
      // MATERIALIZED is load-bearing (round 13): DuckDB inlines plain CTEs
      // per reference, and this chain references each vK 2-3 times across
      // 8 rounds — the whole gram pipeline re-evaluates exponentially
      // (measured 504 s -> 0.16 s at sf0.01, byte-identical result)
      .replaceAll("""(\w+) AS \(""", "$1 AS MATERIALIZED (")
  }

  def oracles: Map[String, String] = Map(
    "q232_cka" ->
      s"""$momentCtes,
         |g AS (
         |  SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS gram
         |  FROM s a JOIN s b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2),
         |cv AS (
         |  SELECT g.i, g.j,
         |    (CAST(g.gram AS DOUBLE) - CAST(da.sv AS DOUBLE) * CAST(db.sv AS DOUBLE)
         |       / CAST(n.n AS DOUBLE)) / CAST(n.n AS DOUBLE)
         |       / ${1L << (2 * ScaleBits)}.0 AS cov
         |  FROM g JOIN d da ON da.i = g.i JOIN d db ON db.i = g.j CROSS JOIN n),
         |t AS (
         |  SELECT i, j, CAST(floor(cov * cov * 1.0e15) AS BIGINT) AS c2 FROM cv),
         |w AS (
         |  SELECT
         |    sum(c2 * (CASE WHEN j < $CkaPrefix THEN
         |                (CASE WHEN i = j THEN 1 ELSE 2 END)
         |              WHEN i < $CkaPrefix THEN 1 ELSE 0 END)) AS sxy,
         |    sum(c2 * (CASE WHEN i = j THEN 1 ELSE 2 END)) AS sxx,
         |    sum(c2 * (CASE WHEN j < $CkaPrefix THEN
         |                (CASE WHEN i = j THEN 1 ELSE 2 END) ELSE 0 END)) AS syy
         |  FROM t)
         |SELECT
         |  CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
         |    AS cka_linear,
         |  CAST(sxy AS DOUBLE) / 1.0e15 AS hsic_xy,
         |  CAST(sxx AS DOUBLE) / 1.0e15 AS hsic_xx,
         |  CAST(syy AS DOUBLE) / 1.0e15 AS hsic_yy
         |FROM w""".stripMargin,
    "q230_hbos" ->
      s"""WITH t AS (
         |  SELECT vec_id, u.i AS dim,
         |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * $HbosScale) AS BIGINT) AS b
         |  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)),
         |h AS (SELECT dim, b, CAST(count(*) AS BIGINT) AS cnt
         |      FROM t GROUP BY dim, b),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
         |s AS (
         |  SELECT vec_id,
         |    CAST(sum(CAST(floor(
         |      (floor(ln(CAST(n.n AS DOUBLE) / CAST(h.cnt AS DOUBLE))
         |        * 1.0e9 + 0.5) / 1.0e9)
         |      * 1.0e12) AS BIGINT)) AS DOUBLE) / 1.0e12 AS hbos_score
         |  FROM t JOIN h USING (dim, b) CROSS JOIN n
         |  GROUP BY vec_id)
         |SELECT vec_id, hbos_score FROM s
         |ORDER BY hbos_score DESC, vec_id LIMIT $HbosTopK""".stripMargin,
    "q210_top_pc" -> topPcOracle,
    // q116's moment/variance chain, applied per value instead of summed
    "q152_embedding_whiten" ->
      s"""$momentCtes,
         |m AS (
         |  SELECT d.i,
         |    CAST(d.sv AS DOUBLE) / CAST(n.n AS DOUBLE) AS mu,
         |    (CAST(d.svv AS DOUBLE) - CAST(d.sv AS DOUBLE) * CAST(d.sv AS DOUBLE)
         |       / CAST(n.n AS DOUBLE)) / CAST(n.n AS DOUBLE) AS vr
         |  FROM d CROSS JOIN n),
         |mi AS (SELECT i, mu, vr FROM m WHERE vr > 1e-9)
         |SELECT s.vec_id, s.i,
         |  (CAST(s.v AS DOUBLE) - mi.mu) / sqrt(mi.vr) AS w
         |FROM s JOIN mi ON mi.i = s.i
         |ORDER BY s.vec_id, s.i""".stripMargin,
    "q135_jl_project" ->
      s"""WITH v AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |sl AS (
         |  SELECT CAST(j AS INT) AS j,
         |    [CASE WHEN (CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || '-' ||
         |        CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) & 1) = 1
         |      THEN 1 ELSE -1 END for i in range($EmbDim)] AS signs
         |  FROM range($JlK) r(j))
         |SELECT v.vec_id, sl.j,
         |  CAST(list_sum(
         |    [CAST(floor(e[CAST(i AS INT)+1] * ${1L << ScaleBits}) AS BIGINT)
         |       * signs[CAST(i AS INT)+1]
         |     for i in range($EmbDim)]) AS BIGINT) AS proj
         |FROM v CROSS JOIN sl
         |ORDER BY vec_id, j""".stripMargin,
    "q115_embedding_gram" ->
      s"""$momentCtes,
         |g AS (
         |  SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS gram
         |  FROM s a JOIN s b ON a.vec_id = b.vec_id AND a.i <= b.i
         |  GROUP BY 1, 2)
         |SELECT g.i, g.j, g.gram,
         |  (CAST(g.gram AS DOUBLE) - CAST(da.sv AS DOUBLE) * CAST(db.sv AS DOUBLE)
         |     / CAST(n.n AS DOUBLE)) / CAST(n.n AS DOUBLE) / ${1L << (2 * ScaleBits)}.0 AS cov
         |FROM g
         |JOIN d da ON da.i = g.i
         |JOIN d db ON db.i = g.j
         |CROSS JOIN n
         |ORDER BY g.i, g.j""".stripMargin,
    "q116_embedding_outliers" ->
      s"""$momentCtes,
         |m AS (
         |  SELECT d.i,
         |    CAST(d.sv AS DOUBLE) / CAST(n.n AS DOUBLE) AS mu,
         |    (CAST(d.svv AS DOUBLE) - CAST(d.sv AS DOUBLE) * CAST(d.sv AS DOUBLE)
         |       / CAST(n.n AS DOUBLE)) / CAST(n.n AS DOUBLE) AS vr
         |  FROM d CROSS JOIN n),
         |mi AS (
         |  SELECT i, mu, CASE WHEN vr > 1e-9 THEN 1.0 / vr ELSE 0.0 END AS iv
         |  FROM m)
         |SELECT s.vec_id,
         |  floor(sum((CAST(s.v AS DOUBLE) - mi.mu) * (CAST(s.v AS DOUBLE) - mi.mu)
         |    * mi.iv) * 1.0e6 + 0.5) / 1.0e6 AS m_dist2
         |FROM s JOIN mi ON mi.i = s.i
         |GROUP BY s.vec_id
         |ORDER BY s.vec_id""".stripMargin,
    "q120_label_moments" ->
      s"""WITH s AS (
         |  SELECT label, CAST(r.i AS INT) AS i,
         |    CAST(floor(embedding[CAST(r.i AS INT) + 1] * ${1L << ScaleBits}) AS BIGINT) AS v
         |  FROM embeddings, unnest(range(0, $EmbDim)) AS r(i)),
         |d AS (
         |  SELECT label, i, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv
         |  FROM s GROUP BY label, i)
         |SELECT label, i, n,
         |  CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) / ${1L << ScaleBits}.0 AS mean,
         |  (CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
         |     / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / ${1L << (2 * ScaleBits)}.0 AS variance
         |FROM d ORDER BY label, i""".stripMargin
  )
}
