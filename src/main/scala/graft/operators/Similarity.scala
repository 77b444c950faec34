package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star extension).
  *
  * Two engines:
  *   - `bruteForceTopK` — exact: broadcast the (small) query set against the
  *     corpus scan, score with the codegen'd CosineSimilarity expression,
  *     top-k per query via window. Cost O(|corpus| x |queries| x dim) but
  *     embarrassingly parallel and scan-bound: the right baseline, and the
  *     right *answer* when queries are few.
  *   - `lshTopK` — the scale path: random-hyperplane sketches (seeded,
  *     deterministic) bucket the corpus; a query only scores candidates
  *     sharing at least one sketch band (partition-local candidate join on
  *     the band key instead of an all-pairs product). Approximate: recall
  *     depends on band geometry; exact cosine re-ranks candidates.
  */
object Similarity {

  val Dim = 64

  /** Deterministic pseudo-Gaussian hyperplanes (fixed seed — sketches must
    * be reproducible across runs/executors). */
  def hyperplanes(nPlanes: Int, dim: Int = Dim, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def dotLit(emb: Column, plane: Array[Double]): Column = {
    val planeCol = array(plane.toIndexedSeq.map(lit): _*)
    aggregate(
      zip_with(emb, planeCol, (x, p) => x.cast("double") * p),
      lit(0.0), (acc, x) => acc + x)
  }

  /** Sign-sketch bands: nBands band columns, bitsPerBand planes each. */
  def bandedSketch(emb: Column, nBands: Int, bitsPerBand: Int, seed: Long = 42L): Seq[Column] = {
    val planes = hyperplanes(nBands * bitsPerBand, seed = seed)
    (0 until nBands).map { b =>
      (0 until bitsPerBand).map { i =>
        when(dotLit(emb, planes(b * bitsPerBand + i)) > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    }
  }

  /** Exact top-k neighbors for each query vector (query != neighbor). */
  def bruteForceTopK(spark: SparkSession, embs: DataFrame, queryMaxId: Long = 10,
                     k: Int = 10): DataFrame = {
    VectorFunctions.register(spark)
    val q = embs.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates share >=1 sketch band with
    * the query; exact cosine re-ranks. At corpus scale the banded corpus is
    * a shuffle-partitioned index (band, bucket) -> vectors; queries join it
    * on the band key — no all-pairs product. */
  def lshTopK(spark: SparkSession, embs: DataFrame, queryMaxId: Long = 10,
              k: Int = 10, nBands: Int = 8, bitsPerBand: Int = 4): DataFrame = {
    VectorFunctions.register(spark)
    def banded(df: DataFrame, idName: String, embName: String): DataFrame = {
      val sketch = bandedSketch(col(embName), nBands, bitsPerBand)
      df.select(col(idName), col(embName),
        posexplode(array(sketch: _*)).as(Seq("band", "bucket")))
    }
    val c = banded(embs.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb")),
      "neighbor_id", "n_emb")
    val q = banded(embs.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      "query_id", "q_emb")
    val cand = q.join(c,
      q("band") === c("band") && q("bucket") === c("bucket") &&
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("q_emb"), col("neighbor_id"), col("n_emb"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    cand
      .withColumn("cosine", VectorFunctions.cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse k-means quantizer
    * partitions the corpus into nlist cells; a query scores only the
    * vectors in its nprobe nearest cells (exact cosine re-rank inside).
    *
    * At 100 TB the assigned corpus is written partitioned by cell id, so a
    * query touches nprobe partitions — the classic IVF index expressed as
    * Spark partition pruning. Training samples the corpus; assignment is one
    * broadcast map-side pass (centroids are tiny). */
  def ivfTopK(spark: SparkSession, embs: DataFrame, queryMaxId: Long = 10,
              k: Int = 10, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    VectorFunctions.register(spark)
    val vecs = embs.select(col("vec_id"), col("embedding"),
      array_to_vector(transform(col("embedding"), x => x.cast("double"))).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10).fit(vecs)
    val assigned = model.transform(vecs)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("prediction").as("cell"))
    // centroid table (tiny, broadcast): query → nprobe nearest cells
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
    val q = embs.filter(col("vec_id") < queryMaxId)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("cdist").desc, col("cell"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", VectorFunctions.cosineSim(col("q_emb"), col("centroid")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("q_emb"), col("cell"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    probes.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSim(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // --------------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_ann_brute" -> ((s, d) => bruteForceTopK(s, Tables.embeddings(s, d))),
    "q26_ann_lsh" -> ((s, d) => lshTopK(s, Tables.embeddings(s, d))),
    "q29_ann_ivf" -> ((s, d) => ivfTopK(s, Tables.embeddings(s, d)))
  )

  /** Oracle for the exact path only (q26 is approximate by construction). */
  def oracles: Map[String, String] = Map(
    "q25_ann_brute" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
        |  FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS e
        |      FROM embeddings),
        |s AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(qe, e) AS cosine
        |  FROM q JOIN c ON query_id <> neighbor_id),
        |r AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, cosine, rank FROM r
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  )
}
