package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.plans.VectorExpressions.cosineFused

/** IVF (inverted-file) ANN index built with deterministic k-means.
  *
  * Everything is DataFrame-native so it scales like any other aggregation:
  *  - init: centroid j = mean of vectors with vec_id % k == j (deterministic,
  *    no RNG — reproducible across runs/cluster sizes);
  *  - Lloyd iterations: assign via broadcast centroid cross-join + argmin,
  *    recompute means via explode(posexplode)+groupBy (partial-aggregated);
  *  - search: probe the nprobe nearest centroids, exact-score only those
  *    inverted lists.
  *
  * At 100 TB the assign step is a broadcast join (centroids are k×dim
  * doubles — tiny) and the mean recompute is one shuffle keyed by
  * (cluster, dim) — no O(N²) anywhere.
  */
object Ivf {

  /** Column-wise mean of `e` arrays per cluster id column `cid`. */
  private def centroidMeans(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("cid"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
      .select(col("cid"), transform(col("dm"), s => s.getField("m")).as("ce"))

  /** Assign each vector to its nearest centroid by cosine. */
  private def assign(v: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = v.crossJoin(broadcast(centroids))
      .withColumn("sim", cosineFused(col("e"), col("ce")))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("e"), col("cid"))
  }

  /** Train k centroids with `iters` Lloyd iterations. Returns (cid, ce). */
  def train(vectors: DataFrame, k: Int, iters: Int = 2): DataFrame = {
    val v = vectors.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    var centroids = centroidMeans(v.withColumn("cid", (col("vec_id") % k).cast("int")))
    var i = 0
    while (i < iters) {
      centroids = centroidMeans(assign(v, centroids)).persist()
      i += 1
    }
    centroids
  }

  /** Index: every vector tagged with its cluster id. */
  def index(vectors: DataFrame, centroids: DataFrame): DataFrame =
    assign(vectors.select(col("vec_id"), toDouble(col("embedding")).as("e")), centroids)

  /** IVF top-k: probe the `nprobe` closest clusters per query, exact-score
    * only their lists. Same output contract as Similarity.bruteForceTopK. */
  def topK(indexed: DataFrame, centroids: DataFrame, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), toDouble(col("embedding")).as("qe"))
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", cosineFused(col("qe"), col("ce")))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nprobe)
      .select(col("qid"), col("qe"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
    probes.join(indexed, "cid")
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), round(cosineFused(col("qe"), col("e")), 6).as("sim"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("vec_id"), col("sim"), col("rk"))
  }
}
