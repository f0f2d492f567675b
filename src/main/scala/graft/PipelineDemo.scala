package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.multimodal.Multimodal
import graft.queries.Tables
import graft.sources.IvfStore

/** Executable tour of the training-data pipeline surface: dedup →
  * quality filtering → similarity search, end to end on the synthetic
  * corpus. `runMain graft.PipelineDemo [sfDir]` — prints one compact
  * line per stage; doubles as an integration smoke over the library's
  * LLM-ops API the way Demo does for the SAR service.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.get(cores = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents").cache()
    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    println(s"[pipeline] corpus: ${docs.count()} docs, ${emb.count()} vectors ($sfDir)")

    // 1. exact dedup on the shared normalized prefix key
    val keyed = docs.withColumn("k", TextAnalysis.prefixKey(col("text")))
    val exactGroups = Dedup.exactDupGroups(keyed, "k", "doc_id").count()
    println(s"[pipeline] exact dup groups: $exactGroups")

    // 2. near-dup: auto-dispatched Jaccard + LSH candidates
    val jac = Dedup.jaccardPairsAuto(docs, "text", "doc_id").count()
    val lsh = Dedup.lshCandidatePairs(docs, "text", "doc_id").count()
    println(s"[pipeline] jaccard>=0.8 pairs: $jac; LSH candidates: $lsh")

    // 3. quality filter: stopword ratio + entropy band keeps real text
    val quality = docs.select(col("doc_id"),
        TextAnalysis.stopwordRatio(col("text")).as("swr"),
        TextAnalysis.tokenEntropy(col("text")).as("ent"))
      .filter(col("ent") > 1.0 && col("swr") < 0.8)
    println(s"[pipeline] docs passing entropy/stopword filter: ${quality.count()}")

    // 4. embedding dedup: centroid-blocked (trained codebook, no labels)
    val codebook = Similarity.trainCodebook(emb, "vec_id", "embedding",
        k = 8, iters = 2)
      .select(col("centroid_label"), col("cvec"))
    val blocked = Dedup.cosineDupPairsBlocked(emb, codebook,
      "vec_id", "embedding", threshold = 0.45, probes = 4).count()
    println(s"[pipeline] cosine>=0.45 near-dup pairs (blocked): $blocked")

    // 5. similarity search: on-disk IVF index, partition-pruned probe
    val ivfPath = java.nio.file.Files.createTempDirectory("ivf").toString
    IvfStore.write(emb, codebook, "vec_id", "embedding", ivfPath)
    val qv = emb.select("embedding").head().getSeq[Float](0)
    val hits = IvfStore.search(spark, ivfPath, qv, "vec_id", "embedding",
      k = 5, probes = 3).collect()
    println(s"[pipeline] IVF top-5: " +
      hits.map(r => s"${r.getLong(0)}@${r.getDouble(1)}").mkString(", "))

    // 6. compression: int8 (4×) and PQ/ADC (32×) with exact rerank
    val pqCb = graft.functions.Quantize.trainPq(emb, "vec_id",
      "embedding", m = 8, ksub = 16, iters = 2)
    val codes = graft.functions.Quantize.pqEncode(emb, "embedding", pqCb)
    val pqHits = graft.functions.Quantize.pqSearchRerank(emb, "vec_id",
        "embedding", codes, "pq_code", pqCb, qv, k = 5, shortlist = 50)
      .collect()
    println(s"[pipeline] PQ(ADC shortlist 50 -> exact rerank) top-5: " +
      pqHits.map(r => s"${r.getLong(0)}@${r.getDouble(1)}").mkString(", "))

    // 7. the composed curation pipeline (gate -> dedup -> near-dup)
    val curated = graft.functions.Curation.curate(docs, "doc_id", "text")
    println(s"[pipeline] curation survivors: ${curated.count()} " +
      s"of ${docs.count()}")

    // 8. governance: decontamination, PII scrub, mixture + token
    // budget sampling, split assignment, incremental dedup ledger
    val bench = docs.filter(col("doc_id") % 37 === 0)
    val corpus = docs.filter(col("doc_id") % 37 =!= 0)
    val contaminated = graft.functions.Decontam
      .contamination(corpus, bench, "text", "doc_id")
      .filter(col("contaminated") === 1).count()
    println(s"[pipeline] decontamination: $contaminated of " +
      s"${corpus.count()} docs flagged vs ${bench.count()}-doc benchmark")

    val pii = graft.functions.Pii.piiReport(
      docs.withColumn("aug", concat(col("text"),
        lit(" contact admin@site.example.org at 10.1.2.3"))),
      "aug", "doc_id")
    val piiTotals = pii.agg(sum("n_emails"), sum("n_ips")).head()
    println(s"[pipeline] PII scrub: ${piiTotals.getLong(0)} emails, " +
      s"${piiTotals.getLong(1)} IPs redacted")

    val mixed = graft.functions.Curation.sampleMixture(docs, "doc_id",
      "lang", graft.functions.Curation.mixtureQuotas(docs.count() * 40 / 100,
        Map("en" -> 50L, "es" -> 20L, "de" -> 10L, "fr" -> 10L, "zh" -> 10L)))
    val budgeted = graft.functions.Curation.sampleToTokenFraction(
      docs, "doc_id", "text", 30L)
    val splits = graft.functions.Curation.assignSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(s"[pipeline] mixture sample: ${mixed.count()} docs; " +
      s"30%-token budget: ${budgeted.count()} docs; splits: $splits")

    val ledgerPath = java.nio.file.Files.createTempDirectory("ledger")
      .toString
    graft.sources.DedupLedger.write(corpus, "text", ledgerPath,
      bucketChars = 1)
    val freshNext = graft.sources.DedupLedger.filterNew(spark, docs,
      "text", ledgerPath).count()
    println(s"[pipeline] dedup ledger: ${docs.count()}-doc re-ingest -> " +
      s"$freshNext unseen")

    // 9. quality & dedup signals: Gopher rules, unigram LM scoring,
    // repeated k-gram spans, semantic dedup over embeddings
    // the synthetic vocab carries no Gopher stopwords, so the full
    // conjunction correctly rejects everything — report the informative
    // per-rule signals instead
    val gopherPass = docs.filter(
      TextAnalysis.alphaWordFraction(col("text")) >= 0.8 &&
        TextAnalysis.symbolWordRatio(col("text")) <= 0.1 &&
        TextAnalysis.wsTokenCount(col("text")) >= 20).count()
    val lm = graft.functions.LangModel.trainUnigram(
      docs.filter(col("doc_id") % 3 =!= 0), "text")
    val ceStats = graft.functions.LangModel
      .crossEntropy(docs, "doc_id", "text", lm)
      .agg(min("cross_entropy"), max("cross_entropy")).head()
    val spanned = Dedup.repeatedKgramSpans(docs, "text", "doc_id")
      .filter(col("n_spans") > 0).count()
    val semantic = Dedup.semanticDedup(emb, "vec_id", "embedding",
        threshold = 0.45, probes = 4, iters = 2)
      .filter(col("keep") === 0).count()
    println(s"[pipeline] gopher shape rules pass: $gopherPass docs " +
      s"(full conjunction 0 — no English stopwords in synthetic " +
      s"vocab); LM cross-entropy " +
      f"range [${ceStats.getDouble(0)}%.3f, ${ceStats.getDouble(1)}%.3f]; " +
      s"$spanned docs with repeated 8-gram spans; " +
      s"$semantic semantic near-dups dropped")

    // 10. line-level structural cleaning + token-budget sharding
    val lined = docs.withColumn("text",
      concat_ws("\n", col("text"), lit("all rights reserved footer"),
        lit("ok")))
    // count docs whose text the cleaner actually CHANGED — a raw
    // count() would print the constant corpus size whether or not the
    // operator did anything
    val nCleaned = lined
      .filter(graft.functions.LineClean.cleanLines(col("text"))
        =!= col("text")).count()
    val deFootered = graft.functions.LineClean.dropFrequentLines(
      lined, "doc_id", "text", maxDocs = 5)
    val nFooter = deFootered
      .filter(col("text").contains("all rights reserved")).count()
    val shardPath = java.nio.file.Files.createTempDirectory("shards")
      .toString
    val nShards = graft.sources.ShardStore.write(docs, "doc_id", "text",
      shardPath, shardTokens = 2000L)
    println(s"[pipeline] line clean rewrote $nCleaned/${docs.count()} " +
      s"docs; frequent-line pass leaves $nFooter docs with the footer; " +
      s"shard store: $nShards shards of ~2000 tokens")

    // 11. multimodal: opaque binary payloads + REAL header/pixel decode
    // (docs' text bytes stand in for an object-store read; a real PNG
    // generated in-process shows the JVM-codec path end-to-end)
    val png = {
      val img = new java.awt.image.BufferedImage(32, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 32) img.setRGB(x, y, 0x3366cc)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    import spark.implicits._
    val payloads = docs.limit(50)
      .select(col("doc_id").as("id"), col("text").cast("binary").as("data"))
      .unionByName(Seq((9999L, png)).toDF("id", "data"))
    val media = Multimodal.asMedia(payloads, "id", "data")
    val types = media.groupBy("media_type").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    val feats = Multimodal.extractFeatures(media)
    println(s"[pipeline] media types: $types; " +
      s"feature rows: ${feats.count()} (png row decoded via JDK ImageIO)")

    // 12. selection layer: perplexity terciles -> DSIR -> URL gate ->
    // weighted sample -> context-window packing -> JSONL export
    import graft.functions.{Curation, Dsir, LangModel, UrlOps}
    // reuses the stage-9 unigram model (identical training split) —
    // retraining here would duplicate a full corpus pass
    val buckets = Curation.quantileBuckets(
        LangModel.crossEntropy(docs, "doc_id", "text", lm)
          .join(docs.select("doc_id", "lang"), Seq("doc_id")),
        "doc_id", "cross_entropy", Seq("lang"), 3)
      .groupBy("bucket").count().collect()
      .sortBy(_.getInt(0)).map(r => s"${r.getInt(0)}=${r.getLong(1)}")
    println(s"[pipeline] ccnet ppl terciles (all langs): " +
      buckets.mkString(", "))
    val dsir = Dsir.trainHashedRatio(docs.filter(col("lang") === "en"),
      docs, "text")
    val dsirTop = Dsir.importanceWeights(docs, "doc_id", "text", dsir)
      .orderBy(col("w_micro").desc, col("doc_id")).limit(3)
      .collect().map(r => s"${r.getLong(0)}@${r.getLong(1)}")
    println(s"[pipeline] dsir top-3 target-like: ${dsirTop.mkString(", ")}")
    val withUrl = docs.select(col("doc_id"), concat(lit("https://www.d"),
      (col("doc_id") % 7).cast("string"), lit(".example/p/"),
      col("doc_id").cast("string")).as("url"))
    val gated = UrlOps.domainGate(withUrl, "doc_id", "url",
      Seq("d3.example").toDF("domain"), capPerDomain = 25)
    println(s"[pipeline] url gate: ${gated.count()} docs across " +
      s"${gated.select("domain").distinct().count()} domains " +
      "(1 blocklisted, cap 25)")
    val sampled = Curation.weightedSample(
      docs.filter(col("n_chars") > 0), "doc_id", "n_chars", 40)
    println(s"[pipeline] weighted sample: ${sampled.count()} docs, " +
      "inclusion ∝ n_chars, md5-derandomized")
    val seqs = Curation.packSequences(docs, "doc_id", "text", 512L)
    println(s"[pipeline] packed ${seqs.agg(sum("n_tokens")).head().getLong(0)} " +
      s"tokens into ${seqs.select("seq_id").distinct().count()} " +
      "sequences of 512")
    val mix = Curation.epochMix(docs.select("doc_id", "lang"), "doc_id",
        "lang", Map("en" -> 2.0, "de" -> 1.0, "fr" -> 0.5))
    println(s"[pipeline] epoch mix (en x2.0, de x1.0, fr x0.5): " +
      s"${mix.count()} rows from " +
      s"${mix.select("doc_id").distinct().count()} docs")
    val bpe = graft.functions.BpeTokenizer.train(docs, "text",
      numMerges = 16)
    val bpeTotal = graft.functions.BpeTokenizer
      .tokenCounts(docs, "doc_id", "text", bpe)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    println(s"[pipeline] bpe: 16 merges trained " +
      s"(first: ${bpe.merges.take(3).map(m => m._1 + "+" + m._2)
        .mkString(", ")}); corpus = $bpeTotal bpe tokens")
    val qm = graft.functions.QualityClassifier.QualityModel(
      Seq(3.0, -0.1, -5.0, 1.5), bias = -0.5)
    val qKept = graft.functions.QualityClassifier
      .gate(docs, "text", qm, threshold = 0.6).count()
    println(s"[pipeline] classifier quality gate (pinned weights, " +
      s"p>=0.6): $qKept of ${docs.count()} docs kept")
    val chunks = Curation.chunkDocs(docs, "doc_id", "text", 64, 16)
    println(s"[pipeline] rag chunking: ${chunks.count()} chunks of <=64 " +
      s"tokens (16 overlap) from ${docs.count()} docs")
    val jsonlDir = java.nio.file.Files.createTempDirectory("jsonl").toString
    graft.sources.JsonlStore.write(docs, s"$jsonlDir/out",
      codec = Some("gzip"))
    val reread = graft.sources.JsonlStore.read(spark, s"$jsonlDir/out",
      docs.schema).count()
    println(s"[pipeline] jsonl boundary: $reread docs round-tripped (gzip)")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(jsonlDir))

    // 20. incremental ingestion: gate + exact ledger + near-dup ledger,
    // batch 2 sealed by batch 1's keys
    val ingDir = java.nio.file.Files.createTempDirectory("ingest").toString
    graft.sources.DedupLedger.write(docs.limit(0), "text",
      s"$ingDir/exact", bucketChars = 1)
    graft.sources.NearDupLedger.write(docs.limit(0), "text", "doc_id",
      s"$ingDir/near", bucketChars = 1)
    val b1 = graft.sources.CorpusIngest.ingest(spark,
      docs.filter(col("doc_id") < 250), "text", "doc_id",
      s"$ingDir/exact", s"$ingDir/near")
    val b2 = graft.sources.CorpusIngest.ingest(spark,
      docs, "text", "doc_id", s"$ingDir/exact", s"$ingDir/near")
    println(s"[pipeline] incremental ingest: batch1 kept ${b1.count()}, " +
      s"full-corpus batch2 kept ${b2.count()} (history seals re-sends)")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(ingDir))

    // 21. snapshot monitoring: crawl delta + token-distribution drift
    val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
    val delta = Curation.snapshotDelta(oldSnap, docs, "doc_id", "text")
      .groupBy("status").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
    val kl = graft.functions.Decontam.tokenKlReport(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0), "text").head()
    println(s"[pipeline] snapshot delta: ${delta.mkString(", ")}; " +
      s"even/odd token drift KL=${kl.getLong(3)} micro-nats " +
      s"over ${kl.getLong(0)} vocab")

    // 21b. drift deep-dive: per-source KL, set overlap, KS shift
    val srcKl = graft.functions.Decontam.klReportBy(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0), "source", "text")
      .orderBy(desc("kl_pq_micro")).head()
    val overlap = graft.functions.Decontam.shingleJaccard(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 =!= 0), "text").head()
    val ks = graft.functions.Decontam.ksStatistic(
      docs.filter(col("doc_id") % 2 === 0)
        .select(TextAnalysis.wsTokenCount(col("text")).as("t")),
      docs.filter(col("doc_id") % 2 =!= 0)
        .select(TextAnalysis.wsTokenCount(col("text")).as("t")), "t")
      .head().getDouble(2)
    println(s"[pipeline] drift: most-drifted source " +
      s"${srcKl.getString(0)} (KL ${srcKl.getLong(4)} micro-nats), " +
      s"shingle jaccard ${overlap.getDouble(4)}, token-count KS $ks")

    // 22. embedding compression: 64->16 random-sign projection feeding
    // the same ANN machinery
    val proj = Similarity.randomProject(emb, "embedding", 64, 16)
    val pk = Similarity.knnJoin(proj.filter(col("vec_id") === 3L), proj,
        "vec_id", "vec_id", "proj", k = 3)
      .select("neighbor_id").collect().map(_.getLong(0))
    println(s"[pipeline] projected (dim 16) top-3 for vec 3: " +
      s"${pk.mkString(", ")}")

    // 23. frequency sketch: CMS heavy hitters vs exact
    val hh = graft.functions.Decontam.cmsHeavyHitters(docs, "text", k = 3)
      .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}")
    println(s"[pipeline] cms heavy hitters (exact counts, " +
      s"sketch-audited): ${hh.mkString(", ")}")

    spark.stop()
  }
}
