package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.functions.VectorFunctions

/** Embedding-space clustering: deterministic Lloyd k-means and the
  * SemDeDup-style semantic dedup built on it (Abbas et al. 2023, public:
  * cluster the embedding space, then near-dup only WITHIN clusters — the
  * cluster bound turns the quadratic pair stage into per-cluster blocks).
  *
  * Everything is deterministic and cross-engine reproducible, so both
  * operators carry full DuckDB oracles:
  *   - init: centroids = the k smallest vec_ids' embeddings (no RNG);
  *   - assignment: max cosine (native codegen'd CosineSimilarity — the
  *     same left-to-right double accumulation DuckDB's
  *     list_cosine_similarity produces, proven by the q25 gate), ties to
  *     the smallest cluster id via one max(struct(cos, -cluster))
  *     aggregate — partial+final, NO window over the n×k frame;
  *   - update: per-dim mean with exact decimal accumulation (q44's
  *     formula), so the mean is partition-order independent; empty
  *     clusters keep their previous centroid.
  *
  * Scale shape per iteration: one broadcast of k×dim doubles against a
  * corpus scan (k rows — bounded by construction, the BNLJ whitelist case),
  * one n-row shuffle for the argmax aggregate, one (k×dim)-group aggregate
  * for the means, and a k×dim driver collect (bounded like the IVF probe
  * set). Iterations are a driver loop over materialized centroids —
  * re-broadcast per round, plan size constant in `iters`.
  */
object Clustering {

  /** q108's pinned parameters — shared by `pqTopK`'s defaults AND the
    * generated `pqOracle` SQL, so the two cannot silently diverge (a
    * non-default `pqTopK` call is a different query and needs its own
    * oracle; the registered q108 uses exactly these). */
  private[operators] val PqNSub = 4
  private[operators] val PqCodes = 16
  private[operators] val PqIters = 1
  private[operators] val PqQueryMax = 10L
  private[operators] val PqK = 10
  private[operators] val PqDim = 64
  private[operators] val PqSubDim: Int = PqDim / PqNSub

  /** Run `iters` Lloyd rounds; returns the final centroids as driver rows
    * (cluster -> dim array). Bounded: k×dim doubles.
    *
    * The embeddings projection is cached for the fit's lifetime: every
    * Lloyd round runs 1 + `iters`×2 scans of it (init collect, per-round
    * assignment and means), and without the cache each action re-reads the
    * corpus from parquet — invisible at sf0.1, avoidable extra corpus
    * scans per round at 100 TB. Unpersisted before returning (the fit's
    * result is a driver-side Seq; nothing downstream holds the frame). */
  private def fitCentroids(s: SparkSession, embs: DataFrame,
                           k: Int, iters: Int): Seq[(Int, Seq[Double])] = {
    VectorFunctions.register(s)
    val e = graft.core.CacheScope.cached(embs.select(col("vec_id"), col("embedding")))
    try {
      var cents: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < k)
        .orderBy(col("vec_id"))
        .collect()
        .map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).map(_.toDouble).toSeq)).toSeq
      var round = 0
      while (round < iters) {
        val assigned = assignTo(s, e, cents).select(col("vec_id"), col("cluster"))
        val means = assigned.join(e, "vec_id")
          .select(col("cluster"), posexplode(col("embedding")).as(Seq("dim_idx", "v")))
          .groupBy(col("cluster"), col("dim_idx"))
          // q44's exact decimal mean: order-independent, DuckDB-identical
          .agg((sum(floor(col("v").cast("double") * lit(1e12) + lit(0.5))
              .cast("decimal(30,0)")).cast("double") / lit(1e12) /
            count(lit(1)).cast("double")).as("c"))
          .groupBy(col("cluster"))
          .agg(transform(array_sort(collect_list(struct(col("dim_idx"), col("c")))),
            x => x.getField("c")).as("centroid"))
          .collect()
          .map(r => (r.getInt(0), r.getSeq[Double](1).toSeq)).toMap
        // empty clusters keep their previous centroid (deterministic)
        cents = cents.map { case (cl, prev) => (cl, means.getOrElse(cl, prev)) }
        round += 1
      }
      cents
    } finally e.unpersist()
  }

  /** Centroids as a k-row broadcastable frame. */
  private def centroidFrame(s: SparkSession, cents: Seq[(Int, Seq[Double])]): DataFrame = {
    val rows = cents.map { case (cl, c) => Row(cl, c) }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("cluster", IntegerType, nullable = false),
        StructField("centroid", ArrayType(DoubleType, containsNull = false), nullable = false))))
  }

  /** Nearest-centroid assignment: (vec_id, cluster, cosine). One broadcast
    * theta-join (k-row side) + one partial+final argmax aggregate. */
  private def assignTo(s: SparkSession, e: DataFrame,
                       cents: Seq[(Int, Seq[Double])]): DataFrame =
    e.crossJoin(broadcast(centroidFrame(s, cents)))
      .withColumn("cos", VectorFunctions.cosineSim(col("embedding"), col("centroid")))
      .groupBy(col("vec_id"))
      // max struct = max cosine, ties to the SMALLEST cluster via -cluster
      .agg(max(struct(col("cos").as("c"), (-col("cluster")).as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).cast("int").as("cluster"),
        col("m.c").as("cosine"))

  /** Fitted centroids as a k-row broadcastable frame (cluster, centroid:
    * array<double>) — the trained quantizer for IVF (Similarity.
    * ivfTopKTrained) or any other nearest-centroid consumer. */
  def fittedCentroidFrame(s: SparkSession, embs: DataFrame,
                          k: Int = 8, iters: Int = 2): DataFrame =
    centroidFrame(s, fitCentroids(s, embs, k, iters))

  /** q102 — deterministic k-means assignment after `iters` Lloyd rounds. */
  def kmeansAssign(s: SparkSession, embs: DataFrame,
                   k: Int = 8, iters: Int = 2): DataFrame = {
    val cents = fitCentroids(s, embs, k, iters)
    assignTo(s, embs.select(col("vec_id"), col("embedding")), cents)
      .orderBy(col("vec_id"))
  }

  /** q103 — SemDeDup: near-dup pairs WITHIN k-means clusters. The cluster
    * key bounds the quadratic stage (blocks of ~n/k), and real duplicates
    * (cosine ≈ 1) share a nearest centroid by construction, so high-
    * threshold recall matches the exact all-pairs scan (spec-pinned).
    * The pair join is a shuffle hash join on cluster — no broadcast of the
    * corpus, no all-pairs product. */
  def semanticDupPairs(s: SparkSession, embs: DataFrame,
                       threshold: Double = 0.5,
                       k: Int = 8, iters: Int = 2): DataFrame = {
    VectorFunctions.register(s)
    val assigned = kmeansAssign(s, embs, k, iters)
      .select(col("vec_id"), col("cluster"))
      .join(embs.select(col("vec_id"), col("embedding")), "vec_id")
    val a = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("cluster"), col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  // --------------------------------------------------------------------- //

  /** q108 — product-quantization ANN (Jégou et al. TPAMI'11, public): split
    * each embedding into `nSub` contiguous subvectors, learn a `codes`-entry
    * codebook per subspace with the same deterministic Lloyd machinery as
    * q102, store each vector as `nSub` small code ids, and answer queries
    * against the codebook RECONSTRUCTION of each corpus vector.
    *
    * This is the canonical 100 TB memory story for vector search: a
    * 64-dim float vector is 256 bytes, its PQ code is `nSub` bytes — the
    * scored "index" shrinks ~64× and the scan reads codes + a broadcast
    * codebook (nSub × codes × subDim doubles, a few KB) instead of raw
    * vectors. The scoring pass here materializes the reconstruction from
    * the broadcast codebook at scan time — shuffle-free, corpus-linear,
    * exactly the asymmetric-distance shape (full-precision query vs
    * quantized corpus). Training cost is nSub small k-means fits whose
    * per-round state is codes × subDim doubles on the driver (bounded,
    * same argument as q102).
    *
    * Deterministic end-to-end (sample init, cosine argmax with tie-to-
    * smallest-code, exact decimal means), so DuckDB re-derives codebooks,
    * codes, and reconstructions from first principles and must agree. */
  def pqTopK(s: SparkSession, embs: DataFrame, nSub: Int = PqNSub,
             codes: Int = PqCodes, iters: Int = PqIters,
             queryMaxId: Long = PqQueryMax, k: Int = PqK,
             dim: Int = PqDim): DataFrame = {
    VectorFunctions.register(s)
    require(dim % nSub == 0, "dim must divide into nSub equal subspaces")
    val subDim = dim / nSub
    // one (vec_id, sub, se) frame holds ALL subspaces: the nSub codebook
    // fits run as ONE joint Lloyd loop keyed by `sub` — per round one
    // broadcast of every codebook + one (sub, code, dim)-grouped means
    // aggregate — instead of nSub sequential fits (round 5 paid 2×nSub
    // actions/round; this is 1 init + 1/round regardless of nSub).
    val subStructs = (0 until nSub).map(m =>
      struct(lit(m).as("sub"), slice(col("embedding"), m * subDim + 1, subDim).as("se")))
    def subFrame: DataFrame = embs
      .select(col("vec_id"), explode(array(subStructs: _*)).as("x"))
      .select(col("vec_id"), col("x.sub").as("sub"), col("x.se").as("se"))
    // (sub, code, cent) codebook frame — nSub×codes rows, broadcastable
    def codebookFrame(books: Map[Int, Seq[(Int, Seq[Double])]]): DataFrame = {
      val rows = for ((m, cents) <- books.toSeq; (code, c) <- cents) yield Row(m, code, c)
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("sub", IntegerType, nullable = false),
          StructField("code", IntegerType, nullable = false),
          StructField("cent", ArrayType(DoubleType, containsNull = false), nullable = false))))
    }
    val sv = graft.core.CacheScope.cached(subFrame)
    var books: Map[Int, Seq[(Int, Seq[Double])]] =
      try {
        // init: per subspace, codebook = the `codes` smallest vec_ids'
        // subvectors (same no-RNG rule as fitCentroids) — ONE collect
        var bs: Map[Int, Seq[(Int, Seq[Double])]] =
          sv.filter(col("vec_id") < codes).orderBy(col("sub"), col("vec_id"))
            .collect()
            .map(r => (r.getInt(1), r.getLong(0).toInt,
              r.getSeq[Float](2).map(_.toDouble).toSeq))
            .groupBy(_._1).view
            .mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
        var round = 0
        while (round < iters) {
          val assigned = sv.join(broadcast(codebookFrame(bs)), "sub")
            .withColumn("cos", VectorFunctions.cosineSim(col("se"), col("cent")))
            .groupBy(col("sub"), col("vec_id"))
            // same argmax as assignTo: max cosine, ties to smallest code
            .agg(max(struct(col("cos").as("c"), (-col("code")).as("nc"))).as("m"))
            .select(col("sub"), col("vec_id"), (-col("m.nc")).cast("int").as("code"))
          val means = assigned.join(sv, Seq("sub", "vec_id"))
            .select(col("sub"), col("code"), posexplode(col("se")).as(Seq("dim_idx", "v")))
            .groupBy(col("sub"), col("code"), col("dim_idx"))
            // fitCentroids' exact decimal mean — order-independent
            .agg((sum(floor(col("v").cast("double") * lit(1e12) + lit(0.5))
                .cast("decimal(30,0)")).cast("double") / lit(1e12) /
              count(lit(1)).cast("double")).as("c"))
            .groupBy(col("sub"), col("code"))
            .agg(transform(array_sort(collect_list(struct(col("dim_idx"), col("c")))),
              x => x.getField("c")).as("cent"))
            .collect()
            .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toSeq)).toMap
          // empty codes keep their previous centroid (deterministic)
          bs = bs.map { case (m, cents) =>
            m -> cents.map { case (code, prev) => (code, means.getOrElse((m, code), prev)) } }
          round += 1
        }
        bs
      } finally sv.unpersist()
    // encode + reconstruct in ONE plan: assign each subvector its nearest
    // code (carrying the winning centroid through the argmax struct — the
    // (cos, -code) prefix is unique per group so `cent` never orders),
    // then reassemble the reconstruction in subspace order per vector.
    val cbF = broadcast(codebookFrame(books))
    val recon = subFrame.join(cbF, "sub")
      .withColumn("cos", VectorFunctions.cosineSim(col("se"), col("cent")))
      .groupBy(col("sub"), col("vec_id"))
      .agg(max(struct(col("cos").as("c"), (-col("code")).as("nc"),
        col("cent").as("cent"))).as("m"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("m.cent").as("cent")))),
        x => x.getField("cent"))).as("recon"))
      .select(col("vec_id").as("neighbor_id"), col("recon"))
    val q = embs.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    recon.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("q_emb"), col("recon")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------------ q200

  /** q200 — per-label centroid silhouette of the embedding space (the
    * "simplified silhouette", Rousseeuw 1987 §4 centroid variant): for
    * each vector, a = distance to its own label centroid, b = the
    * nearest OTHER label centroid, s = (b−a)/max(a,b); reported as the
    * per-label mean with its extremes — the label-separability report a
    * dataset card quotes before trusting `label` as a training signal.
    *
    * Exactness (the q187 n-scaled trick, extended to CROSS-label
    * comparisons): on the 1e-9 grid, d_l(v)² = Σ_d (xq_d·n_l − s1_{l,d})²
    * is an exact decimal(38,0); the comparable distance is
    * √(d²)/(n_l·1e9) — one sqrt + one division per (vec, label), both
    * engines evaluating the identical exact integer under the identical
    * IEEE chain, so argmin/max/ratio decisions cannot split. Per-label
    * means are floor(s·1e15) decimal sums.
    *
    * Scale shape: one posexplode scan → (label, dim) integer component
    * sums (|labels|·64 rows, broadcast back on the dim key), the
    * per-(vec, label) distance aggregate (rows × dims × |labels| terms,
    * corpus-linear for bounded label sets), one |labels|-wide per-vec
    * min/max aggregate, one |labels|-key final. No all-pairs anything. */
  def silhouette(embs: DataFrame): DataFrame = {
    val xq = floor(col("x").cast("double") * lit(1e9)).cast("long")
    val terms = embs
      .select(col("label").as("own"), col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("own"), col("vec_id"), col("dim"), xq.as("xq"))
    val s1 = terms.groupBy(col("own").as("label"), col("dim"))
      .agg(sum(col("xq")).as("s1"))
    val nPer = embs.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val cent = broadcast(s1.join(nPer, Seq("label")))
    val diff = (col("xq") * col("n") - col("s1")).cast("decimal(38,0)")
    val d2 = terms
      .join(cent, Seq("dim"))
      .select(col("own"), col("vec_id"), col("label"), col("n"),
        (diff * diff).as("t"))
      .groupBy(col("own"), col("vec_id"), col("label"), col("n"))
      .agg(sum(col("t")).as("d2"))
      .select(col("own"), col("vec_id"), col("label"),
        (sqrt(col("d2").cast("double")) /
          (col("n").cast("double") * lit(1e9))).as("dist"))
    val perVec = d2.groupBy(col("vec_id"), col("own"))
      .agg(max(when(col("label") === col("own"), col("dist"))).as("a"),
        min(when(col("label") =!= col("own"), col("dist"))).as("b"))
      .select(col("vec_id"), col("own").as("label"),
        // s = 0 when both distances are exactly 0 (degenerate duplicate
        // point) — pinned, so no NaN/NULL divergence between engines
        when(greatest(col("a"), col("b")) > 0.0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)).as("s"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("s") * lit(1e15)).cast("decimal(38,0)")).cast("double") /
          lit(1e15) / count(lit(1)).cast("double")).as("mean_silhouette"),
        min(col("s")).as("min_s"), max(col("s")).as("max_s"))
      .orderBy(col("label"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q200_silhouette" -> ((s, d) => silhouette(Tables.embeddings(s, d))),
    "q102_kmeans_assign" -> ((s, d) => kmeansAssign(s, Tables.embeddings(s, d))),
    "q103_semantic_dedup" -> ((s, d) => semanticDupPairs(s, Tables.embeddings(s, d))),
    "q108_ann_pq" -> ((s, d) => pqTopK(s, Tables.embeddings(s, d)))
  )

  /** Unrolled-iteration DuckDB twins: same init, same cosine argmax (window
    * formulation — identical result to the max-struct aggregate), same
    * decimal means, same empty-cluster coalesce. */
  private[operators] val kmeansCte: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |c0 AS (
      |  SELECT CAST(vec_id AS INT) AS cluster, e AS centroid
      |  FROM e WHERE vec_id < 8),
      |a1 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT e.vec_id, c.cluster,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.e, c.centroid) DESC, c.cluster) AS rn
      |    FROM e CROSS JOIN c0 c) WHERE rn = 1),
      |m1 AS (
      |  SELECT a1.cluster, r.i AS dim_idx,
      |    CAST(SUM(CAST(floor(e.e[CAST(r.i AS INT) + 1] * 1.0e12 + 0.5)
      |        AS DECIMAL(30,0))) AS DOUBLE) / 1.0e12
      |      / COUNT(*) AS v
      |  FROM a1 JOIN e USING (vec_id), unnest(range(0, len(e.e))) AS r(i)
      |  GROUP BY 1, 2),
      |c1 AS (
      |  SELECT c0.cluster,
      |    COALESCE(m.centroid, c0.centroid) AS centroid
      |  FROM c0 LEFT JOIN (
      |    SELECT cluster, list(v ORDER BY dim_idx) AS centroid
      |    FROM m1 GROUP BY 1) m USING (cluster)),
      |a2 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT e.vec_id, c.cluster,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.e, c.centroid) DESC, c.cluster) AS rn
      |    FROM e CROSS JOIN c1 c) WHERE rn = 1),
      |m2 AS (
      |  SELECT a2.cluster, r.i AS dim_idx,
      |    CAST(SUM(CAST(floor(e.e[CAST(r.i AS INT) + 1] * 1.0e12 + 0.5)
      |        AS DECIMAL(30,0))) AS DOUBLE) / 1.0e12
      |      / COUNT(*) AS v
      |  FROM a2 JOIN e USING (vec_id), unnest(range(0, len(e.e))) AS r(i)
      |  GROUP BY 1, 2),
      |c2 AS (
      |  SELECT c1.cluster,
      |    COALESCE(m.centroid, c1.centroid) AS centroid
      |  FROM c1 LEFT JOIN (
      |    SELECT cluster, list(v ORDER BY dim_idx) AS centroid
      |    FROM m2 GROUP BY 1) m USING (cluster)),
      |afinal AS (
      |  SELECT vec_id, cluster, cos FROM (
      |    SELECT e.vec_id, c.cluster,
      |      list_cosine_similarity(e.e, c.centroid) AS cos,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.e, c.centroid) DESC, c.cluster) AS rn
      |    FROM e CROSS JOIN c2 c) WHERE rn = 1)""".stripMargin

  /** Per-subspace PQ CTE chain: slice, sample-init codebook, one Lloyd
    * round (decimal means, empty-code coalesce), final code assignment.
    * Mirrors kmeansCte exactly, parameterized over the subspace index. */
  private def pqSubCte(m: Int, subDim: Int = PqSubDim, codes: Int = PqCodes): String = {
    val lo = m * subDim + 1
    val hi = (m + 1) * subDim
    s"""em$m AS (
       |  SELECT vec_id, e[$lo:$hi] AS se FROM e),
       |c0_$m AS (
       |  SELECT CAST(vec_id AS INT) AS code, se AS cent
       |  FROM em$m WHERE vec_id < $codes),
       |a1_$m AS (
       |  SELECT vec_id, code FROM (
       |    SELECT t.vec_id, c.code,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY list_cosine_similarity(t.se, c.cent) DESC, c.code) AS rn
       |    FROM em$m t CROSS JOIN c0_$m c) WHERE rn = 1),
       |m1_$m AS (
       |  SELECT a.code, r.i AS dim_idx,
       |    CAST(SUM(CAST(floor(t.se[CAST(r.i AS INT) + 1] * 1.0e12 + 0.5)
       |        AS DECIMAL(30,0))) AS DOUBLE) / 1.0e12
       |      / COUNT(*) AS v
       |  FROM a1_$m a JOIN em$m t USING (vec_id), unnest(range(0, len(t.se))) AS r(i)
       |  GROUP BY 1, 2),
       |c1_$m AS (
       |  SELECT c0.code, COALESCE(mm.cent, c0.cent) AS cent
       |  FROM c0_$m c0 LEFT JOIN (
       |    SELECT code, list(v ORDER BY dim_idx) AS cent
       |    FROM m1_$m GROUP BY 1) mm USING (code)),
       |enc$m AS (
       |  SELECT vec_id, code FROM (
       |    SELECT t.vec_id, c.code,
       |      row_number() OVER (PARTITION BY t.vec_id
       |        ORDER BY list_cosine_similarity(t.se, c.cent) DESC, c.code) AS rn
       |    FROM em$m t CROSS JOIN c1_$m c) WHERE rn = 1)""".stripMargin
  }

  private val pqOracle: String = {
    // generated from the SAME pinned constants pqTopK defaults to — the
    // query and its oracle share one source of truth (oracle unrolls
    // exactly PqIters=1 Lloyd round; changing PqIters requires re-
    // generating the CTE chain depth too)
    val subs = (0 until PqNSub).map(pqSubCte(_)).mkString(",\n")
    val reconJoins = (0 until PqNSub).map(m =>
      s"  JOIN enc$m x$m ON x$m.vec_id = v.vec_id JOIN c1_$m b$m ON b$m.code = x$m.code")
      .mkString("\n")
    val cents = (0 until PqNSub).map(m => s"b$m.cent").mkString(", ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       |$subs,
       |recon AS (
       |  SELECT v.vec_id AS neighbor_id,
       |    flatten([$cents]) AS recon
       |  FROM e v
       |$reconJoins),
       |q AS (
       |  SELECT vec_id AS query_id, e AS qe FROM e WHERE vec_id < $PqQueryMax),
       |s AS (
       |  SELECT query_id, neighbor_id,
       |    list_cosine_similarity(qe, recon) AS cosine
       |  FROM q JOIN recon ON query_id <> neighbor_id),
       |r AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, cosine, rank
       |FROM r WHERE rank <= $PqK
       |ORDER BY query_id, rank""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "q200_silhouette" ->
      """WITH t AS (
        |  SELECT label AS own, vec_id, u.i AS dim,
        |    CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1.0e9) AS BIGINT) AS xq
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) u(i)),
        |s1 AS (
        |  SELECT own AS label, dim, CAST(sum(xq) AS BIGINT) AS s1
        |  FROM t GROUP BY own, dim),
        |np AS (SELECT label, CAST(count(*) AS BIGINT) AS n
        |       FROM embeddings GROUP BY label),
        |d2 AS (
        |  SELECT t.own, t.vec_id, s1.label,
        |    sqrt(CAST(sum(CAST(t.xq * np.n - s1.s1 AS HUGEINT)
        |      * CAST(t.xq * np.n - s1.s1 AS HUGEINT)) AS DOUBLE))
        |      / (CAST(np.n AS DOUBLE) * 1.0e9) AS dist
        |  FROM t
        |  JOIN s1 ON s1.dim = t.dim
        |  JOIN np ON np.label = s1.label
        |  GROUP BY t.own, t.vec_id, s1.label, np.n),
        |pv AS (
        |  SELECT vec_id, own AS label,
        |    max(CASE WHEN label = own THEN dist END) AS a,
        |    min(CASE WHEN label <> own THEN dist END) AS b
        |  FROM d2 GROUP BY vec_id, own),
        |sv AS (
        |  SELECT vec_id, label,
        |    CASE WHEN greatest(a, b) > 0.0 THEN (b - a) / greatest(a, b)
        |      ELSE 0.0 END AS s
        |  FROM pv)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(floor(s * 1.0e15) AS HUGEINT)) AS DOUBLE) / 1.0e15
        |    / CAST(count(*) AS DOUBLE) AS mean_silhouette,
        |  min(s) AS min_s, max(s) AS max_s
        |FROM sv GROUP BY label ORDER BY label""".stripMargin,
    "q108_ann_pq" -> pqOracle,
    "q102_kmeans_assign" -> (kmeansCte +
      """
        |SELECT vec_id, CAST(cluster AS INT) AS cluster, cos AS cosine
        |FROM afinal ORDER BY vec_id""".stripMargin),
    "q103_semantic_dedup" -> (kmeansCte +
      """
        |SELECT a.cluster AS cluster, a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_cosine_similarity(ea.e, eb.e) AS cosine
        |FROM afinal a JOIN afinal b
        |  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |JOIN e ea ON ea.vec_id = a.vec_id
        |JOIN e eb ON eb.vec_id = b.vec_id
        |WHERE list_cosine_similarity(ea.e, eb.e) >= 0.5
        |ORDER BY vec_a, vec_b""".stripMargin)
  )
}
