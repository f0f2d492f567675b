package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Scale measurement for the r10 incremental index append (VERDICT r9
  * item 3: "append ≪ rebuild" must be a number, not a claim). Over a
  * ScaleGen corpus split 90/10:
  *
  *   1. `rebuild_retrained` — the pre-r10 answer to a 10% delta: train
  *      sharded codebooks on the union and write the whole index.
  *   2. `rewrite_same_codebooks` — a full union rewrite over the BASE
  *      index's codebooks: the apples-to-apples rewrite whose output
  *      the append must reproduce bit-for-bit.
  *   3. `append` — [[graft.sources.IvfStore.appendShardedInt8]] of the
  *      10% delta onto the 90% index: route through the persisted
  *      codebooks, land new files, advance the fingerprint.
  *
  * The artifact records the three wall times and whether the appended
  * index and the same-codebook rewrite agree (stored rows AND the
  * dedup pair set — both xor-hashed). Probe depths are the production
  * dispatch budgets (pCoarse=4, pFine=8).
  *
  *   runMain graft.AppendProfile <outJson> <scaleDir>
  */
object AppendProfile {
  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    val dir = args(1)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    if (!sys.env.contains("SPARK_GRAFT_INITIAL_PARTITIONS"))
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum", 256)
    import graft.sources.IvfStore

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val delta = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val scratch = s"${System.getProperty("java.io.tmpdir")}/graft_appendprof_" +
      ProcessHandle.current().pid()
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def idxHash(path: String): Long = {
      val r = spark.read.parquet(s"$path/data")
        .agg(expr("bit_xor(xxhash64(vec_id, cast(probe_buckets as string)," +
          " cast(int8_pack.cnorm as string), bucket))")).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    def pairHash(path: String): Long = {
      val r = graft.functions.Dedup.cosineDupPairsFromShardedIndex(spark,
          path, "vec_id", "embedding", threshold = 0.45)
        .agg(count(lit(1)), expr("bit_xor(xxhash64(a, b, cos))")).head()
      r.getLong(0) ^ (if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    // base index: the steady state an append lands on (untimed setup)
    val (coarseB, fineB) = graft.functions.Similarity
      .trainShardedCodebook(base, "vec_id", "embedding")
    IvfStore.writeShardedInt8(base, coarseB, fineB, "vec_id", "embedding",
      s"$scratch/base", pCoarse = 4, pFine = 8, targetBucket = 128)

    // leg 1: production rebuild (retrain on the union + full write)
    val (_, tRebuild) = timed {
      val (c, f) = graft.functions.Similarity
        .trainShardedCodebook(emb, "vec_id", "embedding")
      IvfStore.writeShardedInt8(emb, c, f, "vec_id", "embedding",
        s"$scratch/rebuild", pCoarse = 4, pFine = 8, targetBucket = 128)
    }
    // leg 2: same-codebook union rewrite (the bit-for-bit reference)
    val (_, tRewrite) = timed {
      IvfStore.writeShardedInt8(emb, coarseB, fineB, "vec_id", "embedding",
        s"$scratch/rewrite", pCoarse = 4, pFine = 8, targetBucket = 128)
    }
    // leg 3: the append
    val (_, tAppend) = timed {
      IvfStore.appendShardedInt8(delta, "vec_id", "embedding",
        s"$scratch/base")
    }
    val storedMatch = idxHash(s"$scratch/base") == idxHash(s"$scratch/rewrite")
    val pairsMatch = pairHash(s"$scratch/base") == pairHash(s"$scratch/rewrite")
    val fpMatch = IvfStore.readIndexMeta(spark, s"$scratch/base")
      .exists(_.get("fingerprint")
        .contains(IvfStore.corpusFingerprint(emb, "vec_id")))
    val ok = storedMatch && pairsMatch && fpMatch
    val violations = if (ok) Seq.empty[String] else Seq(
      s"append != same-codebook rewrite (stored=$storedMatch, " +
        s"pairs=$pairsMatch, fingerprint=$fpMatch)")
    val json = s"""{
  ${BenchUtil.commitJsonFields()},
  "chain": "appendShardedInt8 10% delta vs full rebuild (pCoarse=4, pFine=8)",
  "dir": "$dir",
  "rebuild_retrained_secs": ${f"$tRebuild%.3f"},
  "rewrite_same_codebooks_secs": ${f"$tRewrite%.3f"},
  "append_secs": ${f"$tAppend%.3f"},
  "append_vs_rebuild": ${f"${tAppend / math.max(1e-9, tRebuild)}%.3f"},
  "stored_rows_match": $storedMatch,
  "pair_set_match": $pairsMatch,
  "fingerprint_is_union": $fpMatch,
  "contract_violations": ${violations.map(n => s""""$n"""")
        .mkString("[", ",", "]")}
}
"""
    Files.writeString(Paths.get(outJson), json)
    println(s"[append] wrote $outJson; rebuild ${f"$tRebuild%.1f"}s, " +
      s"rewrite ${f"$tRewrite%.1f"}s, append ${f"$tAppend%.1f"}s, ok=$ok")
    // scratch cleanup (corpus-sized)
    org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(scratch), true)
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
