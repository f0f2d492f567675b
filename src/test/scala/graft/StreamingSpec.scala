package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Tables
import graft.streaming.SarStreaming

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed stream over event files matches the batch aggregate") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(dir).schema, dir)
    val result = SarStreaming.runToMemory(
      SarStreaming.windowedCounts(stream), "win_counts")

    val batch = events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(result.count() == batch.count())
    val streamTotal = result.agg(sum("n")).collect().head.getLong(0)
    assert(streamTotal == events.count())
  }

  test("streaming dedup drops re-delivered events within the watermark") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .limit(200)
    val dir = Files.createTempDirectory("graft_dedup").toString
    // simulate a source that re-delivers the same batch twice
    events.write.mode("overwrite").parquet(s"$dir/batch1")
    events.write.mode("overwrite").parquet(s"$dir/batch2")
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/batch1").schema, s"$dir/*")
    val deduped = SarStreaming.dedupStream(stream,
      Seq("event_id"), "ts", "2 hours")
    val result = SarStreaming.runToMemory(deduped, "dedup_out",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(spark.read.parquet(s"$dir/*").count() == 400)
    assert(result.count() == 200)
  }

  test("streaming curation gate+dedup equals the batch stages under id-ordered arrival") {
    import graft.functions.Curation
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("ts", timestamp_seconds(
        lit(1767225600L) + col("doc_id"))) // 2026-01-01 + doc_id seconds
    val dir = Files.createTempDirectory("graft_curate").toString
    // two id-ordered files -> two micro-batches in arrival = id order,
    // so streaming keep-first-arrival equals batch keep-min-id
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in/b1")
    docs.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in/b2")
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/in/b1").schema, s"$dir/in/*",
      Map("maxFilesPerTrigger" -> "1"))
    val survived = SarStreaming.runToMemory(
      SarStreaming.curateStream(stream, "text", "ts"),
      "curate_out", org.apache.spark.sql.streaming.OutputMode.Append())
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = Curation.dedupKeepFirst(
        Curation.qualityGate(docs, "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survived == batch)
  }

  test("foreachBatch ledger ingestion equals sequential batch appends") {
    import org.apache.spark.sql.DataFrame
    import graft.sources.NearDupLedger
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val dir = Files.createTempDirectory("graft_ndl_stream").toString
    // two files -> two micro-batches, processed in write (mod-time) order
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in/b1")
    docs.filter(col("doc_id") >= 250).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/in/b2")
    // day-one empty seed; the stream populates the ledger as it ingests
    val streamLedger = s"$dir/ledger_stream"
    NearDupLedger.write(docs.limit(0), "text", "doc_id", streamLedger,
      bucketChars = 1)
    val survived = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = SarStreaming.readEvents(spark, docs.schema, s"$dir/in/*",
        Map("maxFilesPerTrigger" -> "1"))
      .writeStream.foreachBatch { (b: DataFrame, _: Long) =>
        NearDupLedger.append(spark, b, "text", "doc_id", streamLedger)
          .select("doc_id").collect()
          .foreach(r => survived.add(r.getLong(0)))
      }.start()
    q.processAllAvailable(); q.stop()
    // the same two batches appended sequentially in batch mode
    val batchLedger = s"$dir/ledger_batch"
    NearDupLedger.write(docs.limit(0), "text", "doc_id", batchLedger,
      bucketChars = 1)
    val b1 = NearDupLedger.append(spark, docs.filter(col("doc_id") < 250),
      "text", "doc_id", batchLedger)
    val b2 = NearDupLedger.append(spark, docs.filter(col("doc_id") >= 250),
      "text", "doc_id", batchLedger)
    val expected = (b1.select("doc_id").collect() ++
      b2.select("doc_id").collect()).map(_.getLong(0)).toSet
    assert(survived.toArray(Array.empty[java.lang.Long]).map(_.toLong)
      .toSet == expected && expected.nonEmpty)
  }

  test("streaming PQ encode equals the batch codes (stateless projection)") {
    import graft.functions.Quantize
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cb = Quantize.trainPq(emb, "vec_id", "embedding", m = 8,
      ksub = 16, iters = 2)
    val dir = Files.createTempDirectory("graft_pq_stream").toString
    emb.write.mode("overwrite").parquet(dir)
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(dir).schema, dir)
    val streamed = SarStreaming.runToMemory(
      Quantize.pqEncode(stream, "embedding", cb)
        .select("vec_id", "pq_code"),
      "pq_stream", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Quantize.pqEncode(emb, "embedding", cb)
      .select("vec_id", "pq_code")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stateful sessionization matches the batch window query") {
    import spark.implicits._
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val ds = events.select(col("user_id"), col("ts"))
      .as[SarStreaming.SessionEvent]
    // batch oracle: q_sessionize logic (batch execution — timeouts can't
    // fire, so the watermark path is explicitly disabled)
    val batch = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SarStreaming.sessionize(ds, watermarkDelay = None).collect()
      .map(u => u.user_id -> (u.n_sessions, u.n_events)).toMap
    assert(got == batch)
  }

  test("streaming LSH near-dup equals the batch candidate pairs") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // batch truth
    val batch = graft.functions.Dedup
      .lshCandidatePairs(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // per-row signature must match the batch explode+groupBy family
    val sigBatch = graft.functions.Dedup
      .minhashSignature(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (1 to 8).map(r.getString).toSeq).toMap
    val sigRow = (0 until 8).foldLeft(docs) { (d, i) =>
      d.withColumn(s"mh$i", graft.functions.Dedup
        .minhashComponentRow(col("text"), i))
    }.filter(col("mh0").isNotNull).orderBy("doc_id").collect()
      .map(r => r.getLong(0) ->
        (0 until 8).map(i => r.getString(r.fieldIndex(s"mh$i"))).toSeq).toMap
    assert(sigRow == sigBatch)
    // the compiled one-pass expression (what nearDupCandidates actually
    // runs now) is bit-identical to the same family
    val sigExpr = docs.withColumn("mhs", graft.expressions
        .MinhashComponents.minhash_components(col("text"), 8, 3))
      .filter(element_at(col("mhs"), 1).isNotNull)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](r.fieldIndex("mhs")).toSeq)
      .toMap
    assert(sigExpr == sigBatch)
    // stream the same corpus through the stateful bucket detector
    val dir = Files.createTempDirectory("graft_neardup").toString
    docs.withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(dir)
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(dir).schema, dir)
    val cand = SarStreaming.nearDupCandidates(stream, "doc_id", "text",
      "ts", maxBucket = 10000)
    val got = SarStreaming.runToMemory(cand.toDF(), "neardup_out",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch, s"stream ${got.size} vs batch ${batch.size}; " +
      s"diff ${(batch -- got).take(5)} / ${(got -- batch).take(5)}")
  }

  test("streaming vector near-dup: int8-prefiltered candidates re-score " +
      "to exactly the batch pair set (single-bucket and trained codebook)") {
    import graft.functions.{Dedup, Similarity}
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Dedup.cosineDupPairsExact(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val dir = Files.createTempDirectory("graft_vec_neardup").toString
    emb.withColumn("ts",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.mode("overwrite").parquet(dir)
    def streamCandidates(cents: org.apache.spark.sql.DataFrame,
        probes: Int): Set[(Long, Long)] = {
      val stream = SarStreaming.readEvents(spark,
        spark.read.parquet(dir).schema, dir)
      val cand = SarStreaming.vectorNearDupCandidates(stream, "vec_id",
        "embedding", "ts", cents, threshold = 0.4, probes = probes,
        maxBucket = 10000)
      SarStreaming.runToMemory(cand.toDF(), s"vec_neardup_$probes",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    def rescore(cand: Set[(Long, Long)]): Set[(Long, Long)] = {
      import spark.implicits._
      cand.toSeq.toDF("a", "b")
        .join(emb.select(col("vec_id").as("a"),
          col("embedding").as("__va")), Seq("a"))
        .join(emb.select(col("vec_id").as("b"),
          col("embedding").as("__vb")), Seq("b"))
        .filter(round(Similarity.cosine(col("__va"), col("__vb")), 4)
          >= 0.4)
        .select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // single centroid = one bucket = exhaustive: the prefilter's margin
    // must lose nothing, so re-scored candidates == the exact pair set
    val one = streamCandidates(
      Similarity.trainCodebook(emb, "vec_id", "embedding", 1, 1), 1)
    assert(one.forall { case (a, b) => a < b })
    assert((exact -- one).isEmpty,
      s"prefilter lost qualifying pairs: ${(exact -- one).take(5)}")
    assert(rescore(one) == exact)
    // trained codebook at the settings the batch blocked path is pinned
    // recall-complete under: re-scored stream output == exact again
    val trained = streamCandidates(
      Dedup.dupCodebook(emb, "vec_id", "embedding"), 20)
    assert(rescore(trained) == exact)
  }

  test("vector near-dup auto maxBucket sizes from codebook fill (r9): " +
      "a small codebook gets a proportionally larger default cap") {
    // the sizing rule maxBucket >= 8 * n/k, executable: at dupCodebook
    // geometry (fill 128) the auto cap IS the old 1024 default; shrink
    // k 4x over the same expected volume and the cap grows 4x — the
    // regime the fixed default silently under-admitted
    assert(SarStreaming.autoMaxBucket(1024, 131072) == 1024)
    assert(SarStreaming.autoMaxBucket(256, 131072) == 4096)
    assert(SarStreaming.autoMaxBucket(16, 131072) == 65536)
    // no estimate (a stream has no row count to read) keeps the floor
    assert(SarStreaming.autoMaxBucket(16, -1) == 1024)
    // a huge codebook never drops below the floor's 8x headroom
    assert(SarStreaming.autoMaxBucket(1 << 20, 131072) == 1024)
  }

  test("vector near-dup state honors the membership cap and evicts idle " +
      "buckets at the event-time TTL") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def vrow(id: Long, x: Float, y: Float, offsetSec: Long)
        : (Long, Seq[Float], java.sql.Timestamp) =
      (id, Seq(x, y), new java.sql.Timestamp(t0 + offsetSec * 1000))
    // ---- cap: 5 identical vectors, one bucket, maxBucket = 3 --------
    // residents {1,2,3} pair among themselves (3); 4 and 5 still PROBE
    // the 3 residents (3 pairs each) but are not admitted — per-arrival
    // work stays <= cap, never quadratic
    val oneCent = Seq((0L, Seq(1.0, 0.0))).toDF("c", "cv")
    val capDir = Files.createTempDirectory("graft_veccap").toString
    Seq(vrow(1, 1f, 0f, 0), vrow(2, 1f, 0f, 0), vrow(3, 1f, 0f, 0),
        vrow(4, 1f, 0f, 0), vrow(5, 1f, 0f, 0))
      .toDF("vec_id", "embedding", "ts").coalesce(1)
      .write.mode("overwrite").parquet(capDir)
    val capStream = SarStreaming.readEvents(spark,
      spark.read.parquet(capDir).schema, capDir)
    val dropped = spark.sparkContext.longAccumulator("dropped_residents")
    val capped = SarStreaming.runToMemory(
      SarStreaming.vectorNearDupCandidates(capStream, "vec_id",
        "embedding", "ts", oneCent, threshold = 0.9, probes = 1,
        maxBucket = 3, droppedResidents = Some(dropped)).toDF(), "vec_cap",
      org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 4L), (2L, 4L), (3L, 4L), (1L, 5L), (2L, 5L), (3L, 5L)),
      s"got $capped")
    // cap-pressure RECALL accounting (VERDICT r7 item 5): the pairs
    // lost at 1.67× over-cap occupancy are exactly the cross pairs of
    // the refused residents — (4,5) here — and the droppedResidents
    // alarm counts each refusal, so an operator sees the loss the
    // moment it starts instead of discovering it in an audit
    assert(!capped.contains((4L, 5L)),
      "pairs among refused residents cannot surface — if this appears, " +
        "the cap stopped binding and the spec is stale")
    assert(dropped.value == 2L,
      s"expected 2 refused residents (ids 4, 5): ${dropped.value}")
    // ---- TTL: bucket A idles past the TTL while bucket B advances the
    // watermark; a fresh A vector then pairs with NOTHING ------------
    val twoCents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("c", "cv")
    val dir = Files.createTempDirectory("graft_vecttl").toString
    val batches = Seq(
      Seq(vrow(1, 1f, 0f, 0), vrow(2, 1f, 0f, 0)),   // A: pair (1,2)
      Seq(vrow(50, 0f, 1f, 4 * 3600)),               // B advances watermark
      Seq(vrow(51, 0f, 1f, 4 * 3600 + 60)),          // trigger fires A's timer
      Seq(vrow(3, 1f, 0f, 5 * 3600)))                // A again: state evicted
    batches.zipWithIndex.foreach { case (rows, i) =>
      val f = s"$dir/b$i"
      rows.toDF("vec_id", "embedding", "ts").coalesce(1).write.parquet(f)
      new java.io.File(f).listFiles().foreach(
        _.setLastModified(t0 + i * 60000))
    }
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/b0").schema, s"$dir/*",
      Map("maxFilesPerTrigger" -> "1"))
    val got = SarStreaming.runToMemory(
      SarStreaming.vectorNearDupCandidates(stream, "vec_id", "embedding",
        "ts", twoCents, threshold = 0.9, probes = 1,
        delay = "10 minutes", stateTtlMs = 1800 * 1000L).toDF(),
      "vec_ttl", org.apache.spark.sql.streaming.OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // vec 3 pairing with 1 or 2 would mean the evicted state survived
    assert(got == Set((1L, 2L), (50L, 51L)), s"got $got")
  }

  test("stream-stream interval join matches the batch join") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dir = Files.createTempDirectory("graft_ssj").toString
    events.write.mode("overwrite").parquet(dir)
    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
    def errors(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("event_type") === "error")
        .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
          col("ts").as("e_ts"))
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(dir).schema, dir)
    val joined = SarStreaming.intervalJoinStreams(
      purchases(stream), errors(stream), "p_user", "e_user",
      "p_ts", "e_ts", lookback = "1 hour")
    val got = SarStreaming.runToMemory(joined, "ssj_out",
        org.apache.spark.sql.streaming.OutputMode.Append())
      .select("p_id", "e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = purchases(events).join(errors(events),
        expr("""p_user = e_user AND
                e_ts >= p_ts - INTERVAL 1 HOUR AND e_ts <= p_ts"""))
      .select("p_id", "e_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == batch && batch.nonEmpty,
      s"stream ${got.size} vs batch ${batch.size}")
  }

  test("sessionize evicts timed-out state and late replays open no phantom sessions") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ev(user: Long, offsetSec: Long): (Long, java.sql.Timestamp) =
      (user, new java.sql.Timestamp(t0 + offsetSec * 1000))
    val dir = Files.createTempDirectory("graft_sess").toString
    // one file per micro-batch (maxFilesPerTrigger=1, mod-time ordered):
    //  b1: user 1 twice              → emits (u1, 1 session, 2 events)
    //  b2: user 42 at +4h            → advances the watermark past u1's
    //                                  timeout (last + gap)
    //  b3: user 42 again             → u1 has no data, watermark (from
    //                                  b2) > timeout → state evicted
    //  b4: user 1 fresh at +5h       → NEW state: (1 session, 1 event);
    //                                  without eviction it would emit
    //                                  (2 sessions, 3 events)
    val batches = Seq(
      Seq(ev(1, 0), ev(1, 60)),
      Seq(ev(42, 4 * 3600)),
      Seq(ev(42, 4 * 3600 + 60)),
      Seq(ev(1, 5 * 3600)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      val f = s"$dir/b$i"
      rows.toDF("user_id", "ts").coalesce(1).write.parquet(f)
      // deterministic one-file-per-trigger ordering is by mod time
      new java.io.File(f).listFiles().foreach(_.setLastModified(t0 + i * 60000))
    }
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/b0").schema, s"$dir/*",
      Map("maxFilesPerTrigger" -> "1"))
      .as[SarStreaming.SessionEvent]
    val out = SarStreaming.runToMemory(
      SarStreaming.sessionize(stream, gapSeconds = 1800,
        watermarkDelay = Some("10 minutes")).toDF(),
      "sess_evict")
    val u1 = out.filter(col("user_id") === 1)
      .select("n_sessions", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the re-delivered user re-starts at (1,1): state was evicted; a
    // surviving state would have produced (2,3)
    assert(u1 == Set((1L, 2L), (1L, 1L)), s"got $u1")
  }

  test("stateless governance ops (PII, normalize, split) run in one streaming pass") {
    import graft.functions.{Curation, Pii, TextAnalysis}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("text",
        concat(col("text"), lit(" mail "), col("doc_id").cast("string"),
          lit("@x.example.io")))
    val dir = Files.createTempDirectory("graft_gov_stream").toString
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/in").schema, s"$dir/in")
    val scrubbed = Curation.assignSplit(
      stream.withColumn("text", Pii.redact(col("text")))
        .withColumn("norm", TextAnalysis.normalizeText(col("text"))),
      "doc_id")
    val out = SarStreaming.runToMemory(scrubbed, "gov_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    assert(out.count() == docs.count())
    // every email was redacted in-flight...
    assert(out.filter(col("text").contains("@")).count() == 0)
    // ...and the stream's split assignment equals the batch one
    val batchSplits = Curation.assignSplit(docs, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamSplits = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamSplits == batchSplits)
  }

  test("line cleaning and gopher rules run stateless in a stream, equal batch") {
    import graft.functions.{LineClean, TextAnalysis}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("text", concat_ws("\n",
        col("text"), lit("ok"), lit("lorem ipsum dolor sit amet")))
    val dir = Files.createTempDirectory("graft_line_stream").toString
    docs.write.mode("overwrite").parquet(s"$dir/in")
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(s"$dir/in").schema, s"$dir/in")
    def shape(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        LineClean.cleanLines(col("text")).as("clean"),
        TextAnalysis.gopherPass(col("text"), minWords = 20).as("g"))
    val out = SarStreaming.runToMemory(shape(stream), "line_stream",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batch = shape(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val streamed = out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
    // the planted short + blocklist lines really were dropped in-flight
    assert(out.filter(col("clean").contains("lorem ipsum")).count() == 0)
  }

  test("vector near-dup surfaces its sizing in every progress report " +
      "(r10): chosen bucket cap, caller estimate, observed vector count") {
    import spark.implicits._
    // 5 vectors, one centroid; estimate DELIBERATELY 10x low (50 would
    // be honest for a 500-vector stream) — the surfaced metrics are
    // what lets monitoring catch that before droppedResidents fires
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val dir = Files.createTempDirectory("graft_vec_obs").toString
    (1 to 5).map(i => (i.toLong, Seq(1.0f, 0.0f), t0))
      .toDF("vec_id", "embedding", "ts").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val oneCent = Seq((0L, Seq(1.0, 0.0))).toDF("c", "cv")
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(dir).schema, dir)
    val cand = SarStreaming.vectorNearDupCandidates(stream, "vec_id",
      "embedding", "ts", oneCent, threshold = 0.9, probes = 1,
      expectedVectors = 4096)
    val q = cand.toDF().writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .format("noop").start()
    try q.processAllAvailable() finally q.stop()
    // empty trailing micro-batches report null metrics (max over zero
    // rows) — the sizing assertions read the data-carrying batches
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("graft_vector_neardup")))
      .filter(!_.isNullAt(1))
    assert(metrics.nonEmpty, "no observed metrics in any progress report")
    // one residence row per input vector: Σ over batches = the stream
    assert(metrics.map(_.getAs[Long]("observed_vectors")).sum == 5L)
    // the CHOSEN cap (autoMaxBucket over k=1, n̂=4096 -> 8*4096) and the
    // estimate it came from, verbatim — k=1 so fill = the estimate
    assert(metrics.map(_.getAs[Int]("bucket_cap")).distinct ==
      Seq(SarStreaming.autoMaxBucket(1, 4096)))
    assert(metrics.map(_.getAs[Long]("expected_vectors")).distinct ==
      Seq(4096L))
  }

  // ---------------------------------- r12: streaming -> index append
  test("streaming vector index append: a corpus streamed in epochs " +
      "lands bit-identical to the batch append, the fingerprint " +
      "advances per epoch, and replayed/crashed epochs never " +
      "double-append") {
    import graft.functions.{Dedup, Similarity}
    import graft.sources.IvfStore
    // the lifecycle planted-dup fixture: every 20th vector near-copies
    // its predecessor, so every qualifying pair crosses the base/delta
    // parity split — the adversarial shape for an append path
    val emb = spark.range(0, 2000).selectExpr(
        "id AS vec_id",
        "if(id % 20 = 19, id - 1, id) AS sid")
      .selectExpr("vec_id",
        """transform(sequence(0, 63), d -> cast(
            (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
            + if(vec_id % 20 = 19,
                (pmod(xxhash64(vec_id, d, 8), 21) - 10) / 1000.0, 0.0)
          as float)) AS embedding""")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val d1 = emb.filter(col("vec_id") % 4 === 1)
    val d2 = emb.filter(col("vec_id") % 4 === 3)
    val (coarse, fine) = Similarity.trainShardedCodebook(base, "vec_id",
      "embedding", targetBucket = 32)
    def build(tag: String): String = {
      val d = Files.createTempDirectory(s"graft_stream_ivf_$tag").toString
      IvfStore.writeShardedInt8(base, coarse, fine, "vec_id",
        "embedding", d, pCoarse = 4, pFine = 8, targetBucket = 32)
      d
    }
    def stored(d: String) = spark.read.parquet(s"$d/data")
      .select(col("vec_id"), col("probe_buckets"),
        col("int8_pack.cnorm"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1),
        r.getDouble(2), r.getLong(3))).toSet
    // ---- the real stream: two one-file micro-batches into index A
    val streamed = build("a")
    val srcDir = Files.createTempDirectory("graft_stream_ivf_src").toString
    d1.coalesce(1).write.mode("append").parquet(srcDir)
    d2.coalesce(1).write.mode("append").parquet(srcDir)
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(srcDir).schema, srcDir,
      Map("maxFilesPerTrigger" -> "1"))
    val ckpt = Files.createTempDirectory("graft_stream_ivf_ckpt").toString
    val q = SarStreaming.vectorIndexAppendSink(stream, "vec_id",
        "embedding", streamed)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    // ---- batch comparator: one appendShardedInt8 of the whole delta
    // into index B over the SAME codebooks
    val batch = build("b")
    IvfStore.appendShardedInt8(d1.unionByName(d2), "vec_id",
      "embedding", batch)
    assert(stored(streamed) == stored(batch),
      "streamed index diverged from the batch append")
    // fingerprint reached the union; auto-dispatch accepts it; the
    // dedup answer off the streamed index is the exact join's
    val unionFp = IvfStore.corpusFingerprint(emb, "vec_id")
    val metaA = IvfStore.readIndexMeta(spark, streamed).get
    assert(metaA("fingerprint") == unionFp)
    assert(metaA(SarStreaming.StreamEpochKey).toLong >= 1L)
    val (_, branch) = Dedup.cosineDupPairsTrainedInt8Branch(emb,
      "vec_id", "embedding", 0.9, targetBucket = 32,
      indexPath = streamed)
    assert(branch == "indexed_sharded")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Dedup.cosineDupPairsExact(emb, "vec_id",
      "embedding", 0.9).select("a", "b"))
    assert(pairs(Dedup.cosineDupPairsFromShardedIndex(spark, streamed,
      "vec_id", "embedding", 0.9).select("a", "b")) == exact)
    // ---- epoch mechanics on a fresh index C, driven manually
    val manual = build("c")
    assert(SarStreaming.appendIndexEpoch(d1, 0L, "vec_id", "embedding",
      manual, "manual-q") == 500L)
    // fingerprint advanced to base ∪ d1 after epoch 0 alone
    assert(IvfStore.readIndexMeta(spark, manual).get("fingerprint") ==
      IvfStore.corpusFingerprint(base.unionByName(d1), "vec_id"))
    // at-least-once replay of epoch 0 is a no-op
    assert(SarStreaming.appendIndexEpoch(d1, 0L, "vec_id", "embedding",
      manual, "manual-q") == 0L)
    assert(IvfStore.readIndexMeta(spark, manual).get("fingerprint") ==
      IvfStore.corpusFingerprint(base.unionByName(d1), "vec_id"))
    // crashed epoch 1: sealed stage (rows + watermark staged together),
    // nothing published — the REPLAY heals it forward and then no-ops,
    // so the epoch's rows land exactly once
    IvfStore.stageAppend(d2, "vec_id", "embedding", manual,
      extraMeta = Map(SarStreaming.StreamEpochKey -> "1"))
    assert(SarStreaming.appendIndexEpoch(d2, 1L, "vec_id", "embedding",
      manual, "manual-q") == 0L)
    val metaC = IvfStore.readIndexMeta(spark, manual).get
    assert(metaC("fingerprint") == unionFp)
    assert(metaC(SarStreaming.StreamEpochKey) == "1")
    assert(stored(manual) == stored(batch))
  }

  // ------------------- r13: stream-identity-qualified epoch watermark
  test("index epoch watermark is stream-identity-qualified (r13): a " +
      "fresh-checkpoint stream refuses loudly with nothing appended, " +
      "same-lineage replay still no-ops, and detachIndexStream hands " +
      "the index to a new lineage") {
    import graft.functions.Similarity
    import graft.sources.IvfStore
    val emb = spark.range(0, 400).selectExpr(
        "id AS vec_id",
        "if(id % 10 = 9, id - 1, id) AS sid")
      .selectExpr("vec_id",
        """transform(sequence(0, 31), d -> cast(
            (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
            + if(vec_id % 10 = 9,
                (pmod(xxhash64(vec_id, d, 8), 21) - 10) / 1000.0, 0.0)
          as float)) AS embedding""")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val d1 = emb.filter(col("vec_id") % 4 === 1)
    val d2 = emb.filter(col("vec_id") % 4 === 3)
    val (coarse, fine) = Similarity.trainShardedCodebook(base, "vec_id",
      "embedding", targetBucket = 32)
    val dir = Files.createTempDirectory("graft_sid_ivf").toString
    IvfStore.writeShardedInt8(base, coarse, fine, "vec_id", "embedding",
      dir, pCoarse = 4, pFine = 8, targetBucket = 32)
    // ---- manual matrix first: owner qA commits epoch 0
    assert(SarStreaming.appendIndexEpoch(d1, 0L, "vec_id", "embedding",
      dir, "qA") == 100L)
    val fpAfterA = IvfStore.readIndexMeta(spark, dir).get("fingerprint")
    // same lineage, same epoch: replay no-op
    assert(SarStreaming.appendIndexEpoch(d1, 0L, "vec_id", "embedding",
      dir, "qA") == 0L)
    // FOREIGN lineage at a non-advancing epoch: the silent-data-loss
    // case — must throw, not no-op, and must append nothing
    val e1 = intercept[IllegalStateException] {
      SarStreaming.appendIndexEpoch(d2, 0L, "vec_id", "embedding",
        dir, "qB")
    }
    assert(e1.getMessage.contains("attached to streaming query"))
    // foreign lineage even at an ADVANCING epoch: two interleaved
    // streams on one index refuse until an explicit detach
    intercept[IllegalStateException] {
      SarStreaming.appendIndexEpoch(d2, 7L, "vec_id", "embedding",
        dir, "qB")
    }
    assert(IvfStore.readIndexMeta(spark, dir)
      .get("fingerprint") == fpAfterA)
    // explicit handover: epoch resets, owner clears, fingerprint
    // untouched (zero-row append = compositional identity), then the
    // new lineage's epoch 0 lands
    SarStreaming.detachIndexStream(spark, dir)
    val metaD = IvfStore.readIndexMeta(spark, dir).get
    assert(metaD(SarStreaming.StreamEpochKey) == "-1")
    assert(metaD(SarStreaming.StreamQueryKey) == "")
    assert(metaD("fingerprint") == fpAfterA)
    assert(SarStreaming.appendIndexEpoch(d2, 0L, "vec_id", "embedding",
      dir, "qB") == 100L)
    assert(IvfStore.readIndexMeta(spark, dir).get("fingerprint") ==
      IvfStore.corpusFingerprint(emb, "vec_id"))
    // ---- end-to-end: a REAL fresh-checkpoint stream against the
    // watermarked index dies with the refusal, not silent data loss
    val srcDir = Files.createTempDirectory("graft_sid_src").toString
    emb.filter(col("vec_id") % 2 === 0).limit(0) // schema only
      .write.mode("overwrite").parquet(srcDir)
    spark.range(1000, 1010).selectExpr("id AS vec_id",
        """transform(sequence(0, 31), d -> cast(
            (pmod(xxhash64(id, d, 7), 2001) - 1000) / 500.0 as float))
          AS embedding""")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(srcDir).schema, srcDir)
    val ckpt = Files.createTempDirectory("graft_sid_ckpt").toString
    val q = SarStreaming.vectorIndexAppendSink(stream, "vec_id",
        "embedding", dir)
      .option("checkpointLocation", ckpt).start()
    val err = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
      q.awaitTermination()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    assert(chain(err).contains("attached to streaming query"))
    assert(IvfStore.readIndexMeta(spark, dir).get("fingerprint") ==
      IvfStore.corpusFingerprint(emb, "vec_id"),
      "the refused stream must append NOTHING")
  }

  // -------------------------- r13: streaming-curation capstone (item 5)
  test("vectorIngestSink capstone (r13): a stream screened against the " +
      "registered index == the batch screen-and-append loop == the " +
      "exact-join keep-first oracle; replays land nothing") {
    import graft.functions.{Dedup, Similarity}
    import graft.sources.IvfStore
    // clusters {10k, 10k+5, 10k+7, 10k+8, 10k+9} (tiny per-id jitter):
    // 10k and 10k+8 are even -> BASE (indexed at build); the odd
    // members alternate between d1 (id%4==1) and d2 (id%4==3) with k's
    // parity, so the screen sees batch-vs-index, batch-vs-earlier-
    // epoch-survivor AND in-batch pairs across the two epochs
    val emb = spark.range(0, 600).selectExpr(
        "id AS vec_id",
        "if(id % 10 in (5, 7, 8, 9), id - id % 10, id) AS sid")
      .selectExpr("vec_id",
        """transform(sequence(0, 31), d -> cast(
            (pmod(xxhash64(sid, d, 7), 2001) - 1000) / 500.0
            + if(sid <> vec_id,
                (pmod(xxhash64(vec_id, d, 8), 21) - 10) / 1000.0, 0.0)
          as float)) AS embedding""")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val d1 = emb.filter(col("vec_id") % 4 === 1)
    val d2 = emb.filter(col("vec_id") % 4 === 3)
    val threshold = 0.9
    val (coarse, fine) = Similarity.trainShardedCodebook(base, "vec_id",
      "embedding", targetBucket = 32)
    // exhaustive depths (k1 is small on this fixture), so the screen's
    // recall provably equals the exact join and the oracle is exact
    def build(tag: String): String = {
      val d = Files.createTempDirectory(s"graft_ingest_ivf_$tag").toString
      IvfStore.writeShardedInt8(base, coarse, fine, "vec_id",
        "embedding", d, pCoarse = coarse.count().toInt, pFine = 64,
        targetBucket = 32)
      d
    }
    def storedIds(d: String): Set[Long] =
      spark.read.parquet(s"$d/data").select("vec_id").collect()
        .map(_.getLong(0)).toSet
    def stored(d: String) = spark.read.parquet(s"$d/data")
      .select(col("vec_id"), col("probe_buckets"),
        col("int8_pack.cnorm"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1),
        r.getDouble(2), r.getLong(3))).toSet
    // ---- the exact-join oracle, applied with the documented loser
    // rule: batch row loses to any qualifying indexed partner and to
    // any smaller-id batch peer (pairs normalized a < b)
    val exactPairs = Dedup.cosineDupPairsExact(emb, "vec_id",
        "embedding", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def exactStep(indexed: Set[Long], bids: Set[Long]): Set[Long] = {
      val losers = exactPairs.collect {
        case (a, b) if bids(a) && indexed(b) => a
        case (a, b) if bids(b) && (indexed(a) || bids(a)) => b
      }
      bids -- losers
    }
    val baseIds = base.collect().map(_.getLong(0)).toSet
    val d1Ids = d1.collect().map(_.getLong(0)).toSet
    val d2Ids = d2.collect().map(_.getLong(0)).toSet
    val surv1 = exactStep(baseIds, d1Ids)
    val surv2 = exactStep(baseIds ++ surv1, d2Ids)
    assert(surv1 != d1Ids && surv2 != d2Ids,
      "fixture must actually screen something out")
    assert((d1Ids -- surv1).nonEmpty && (d2Ids -- surv2).nonEmpty)
    // ---- batch loop: the same screen+append composition, driven
    // directly (independent reimplementation of the loser rule)
    val batchIdx = build("b")
    def batchStep(batch: org.apache.spark.sql.DataFrame): Set[Long] = {
      val bids = batch.select("vec_id").collect().map(_.getLong(0)).toSet
      val pairs = Dedup.cosineDupPairsDeltaIndexInt8(spark, batchIdx,
          batch, "vec_id", "embedding", threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val losers = pairs.map { case (a, b) =>
        if (bids(a) && !bids(b)) a else b }
      val surv = bids -- losers
      IvfStore.appendShardedInt8(
        batch.filter(col("vec_id").isin(surv.toSeq: _*)),
        "vec_id", "embedding", batchIdx)
      surv
    }
    assert(batchStep(d1) == surv1,
      "batch screen diverged from the exact oracle on epoch 1")
    assert(batchStep(d2) == surv2,
      "batch screen diverged from the exact oracle on epoch 2")
    assert(storedIds(batchIdx) == baseIds ++ surv1 ++ surv2)
    // ---- the real stream: two one-file micro-batches into a twin
    val streamIdx = build("s")
    val srcDir = Files.createTempDirectory("graft_ingest_src").toString
    d1.coalesce(1).write.mode("append").parquet(srcDir)
    d2.coalesce(1).write.mode("append").parquet(srcDir)
    val stream = SarStreaming.readEvents(spark,
      spark.read.parquet(srcDir).schema, srcDir,
      Map("maxFilesPerTrigger" -> "1"))
    val ckpt = Files.createTempDirectory("graft_ingest_ckpt").toString
    val q = SarStreaming.vectorIngestSink(stream, "vec_id", "embedding",
        streamIdx, threshold)
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    assert(storedIds(streamIdx) == baseIds ++ surv1 ++ surv2,
      "streamed survivor set diverged")
    assert(stored(streamIdx) == stored(batchIdx),
      "streamed index state diverged from the batch loop")
    assert(IvfStore.readIndexMeta(spark, streamIdx).get("fingerprint")
      == IvfStore.readIndexMeta(spark, batchIdx).get("fingerprint"))
    // auto-dispatch accepts the ingest-maintained index for the
    // SURVIVOR corpus it now holds
    val survCorpus = emb.filter(
      col("vec_id").isin((baseIds ++ surv1 ++ surv2).toSeq: _*))
    val (_, branch) = Dedup.cosineDupPairsTrainedInt8Branch(survCorpus,
      "vec_id", "embedding", threshold, targetBucket = 32,
      indexPath = streamIdx)
    assert(branch == "indexed_sharded")
    // ---- replay: re-delivering a committed epoch lands NOTHING
    val owner = IvfStore.readIndexMeta(spark, streamIdx).get
      .get(SarStreaming.StreamQueryKey)
    assert(owner.exists(_.nonEmpty))
    assert(SarStreaming.ingestIndexEpoch(d2, 1L, "vec_id", "embedding",
      streamIdx, threshold, owner.get) == ((0L, 0L)))
    assert(stored(streamIdx) == stored(batchIdx))
  }
}
