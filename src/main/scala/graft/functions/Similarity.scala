package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]).
  *
  * Brute-force cosine is the exact baseline: a broadcast of the query
  * vector + one codegen'd scan — no shuffle at all, scales linearly with
  * executors. The scale path for query *sets* is `assignNearest` /
  * LSH-style bucketing (centroid assignment = one IVF routing step):
  * centroids are tiny (k × dim), always broadcast, so the only shuffle is
  * the k×dim centroid aggregation itself.
  */
object Similarity {

  /** Element-wise ops via sequential fold — deterministic summation order,
    * so results are reproducible across partitionings and engines. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Built-in-composed cosine (interpreted HOFs — reference baseline). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native codegen'd Catalyst expression (identical
    * semantics to `cosineHof`: double accumulation in element order; see
    * graft.expressions.CosineSimilarity for why it exists). */
  def cosine(a: Column, b: Column): Column =
    graft.expressions.CosineSimilarity.cosine_native(a, b)

  /** Exact top-k by cosine against one query vector (taken from the row
    * with `queryId`). The query vector is a literal, not a broadcast join:
    * a cross join compiles to BroadcastNestedLoopJoin which blocks
    * whole-stage codegen, while a literal keeps scan→project→top-k in one
    * codegen stage. Deterministic: ordered by rounded similarity with id
    * tie-break. */
  def topKCosine(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val qv = df.filter(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0)
    df.select(col(idCol),
        round(cosine(col(vecCol), typedlit(qv)), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Element-wise mean vector per label (the IVF coarse codebook). */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col(labelCol), col("pos"))
      .agg(avg(col("v").cast("double")).as("cv"))
      .groupBy(col(labelCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pc"))
      .select(col(labelCol).as("centroid_label"),
        transform(col("pc"), _.getField("cv")).as("cvec"))

  /** Collect the k×dim codebook into a literal array column (label-sorted
    * for deterministic ties). Centroids are metadata scale by definition,
    * so they ship in the task binary rather than through a
    * codegen-blocking nested-loop join. */
  private def literalCodebook(cents: DataFrame): Column = {
    val codebook = cents.collect().map { r =>
      (r.get(0), r.getSeq[Double](1))
    }.sortBy(_._1.toString)
    array(codebook.map { case (label, vec) =>
      struct(lit(label).as("l"), typedlit(vec).as("v"))
    }.toSeq: _*)
  }

  /** Assign every vector to its nearest centroid by cosine (deterministic
    * tie-break on centroid label). The codebook is k×dim — metadata scale
    * by definition — so it ships as a literal array (an IVF routing table
    * in the task binary) rather than a codegen-blocking nested-loop join;
    * the argmin itself is a sequential fold, so no per-vector window
    * shuffle either. */
  def assignNearest(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val centArr = literalCodebook(cents)
    // argmax over the literal codebook: best = fold keeping (cos, label);
    // ties resolve to the lower label because entries are label-sorted and
    // strictly-greater is required to replace
    val scored = df.withColumn("__scored",
      transform(centArr, c =>
        // coalesce: a zero-norm vector/centroid yields null cosine, which
        // would poison every comparison in the fold — rank it below any
        // real similarity instead
        struct(coalesce(round(cosine(col(vecCol), c.getField("v")), 6),
          lit(-2.0)).as("cos"),
          c.getField("l").as("l"))))
    val best = aggregate(col("__scored"),
      element_at(col("__scored"), 1),
      (acc, x) => when(x.getField("cos") > acc.getField("cos"), x)
        .otherwise(acc))
    scored.withColumn("assigned", best.getField("l")).drop("__scored")
  }

  /** Multi-probe IVF routing: the `probes` nearest centroid labels per
    * vector (cosine desc, label asc on ties), as an array column
    * `probe_buckets`. Near-boundary vectors land in every bucket that
    * could hold a close neighbor, which is what gives centroid-blocked
    * candidate generation its recall. Shuffle-free like assignNearest:
    * score the literal codebook, array_sort, slice — no per-vector
    * window. */
  def assignTopK(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, probes: Int): DataFrame = {
    require(probes >= 1, "probes must be >= 1")
    val centArr = literalCodebook(cents)
    // array_sort on structs orders by fields in declaration order, so
    // (-cos, label) ascending = cosine descending with label tie-break;
    // zero-norm null cosine coalesces below any real similarity
    val scored = transform(centArr, c =>
      struct((lit(0.0) - coalesce(
        round(cosine(col(vecCol), c.getField("v")), 6), lit(-2.0)))
          .as("negcos"),
        c.getField("l").as("l")))
    df.withColumn("probe_buckets",
      transform(slice(array_sort(scored), 1, probes), _.getField("l")))
  }
}
