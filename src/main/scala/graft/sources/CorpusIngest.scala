package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.Curation

/** The incremental ingestion entry point: what a 100 TB pipeline runs
  * per arriving crawl batch, composed from the oracle-proven stages —
  * quality/language gate → exact prefix-key ledger → near-dup band
  * ledger. Stage order matters and is fixed on purpose: gated-out
  * documents never claim ledger keys (a junk doc must not shadow a
  * later clean copy), and the cheap 16-byte exact check runs before
  * the banding work.
  *
  * Crash-safety: [[screen]] is PURE (no ledger mutation), [[commit]]
  * mutates both ledgers, [[ingest]] composes them with the at-most-once
  * semantics of the ledgers' own `append` (see their retry notes).
  * Pipelines that must survive a crash between ledger write and
  * survivor landing call the steps themselves: screen → durably land
  * survivors → commit — the ledger mutation last, replays harmless.
  *
  * In-batch duplicates are NOT removed (both ledgers filter against
  * HISTORY only); compose `Curation.curate` for in-batch semantics or
  * ingest batch-by-batch, where each batch seals the next.
  */
object CorpusIngest {

  /** Pure screening: the batch rows that pass the quality gate AND
    * have no exact-prefix ancestor AND no near-dup band collision in
    * history. The near-dup hash-family geometry comes from the
    * ledger's stored meta (never the call site); the exact ledger's
    * `prefixWords` rides in `cfg.dedupPrefixWords` and must match the
    * seed's choice. */
  def screen(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, exactPath: String, nearPath: String,
      cfg: Curation.Config = Curation.Config()): DataFrame = {
    val gated = Curation.qualityGate(batch, textCol, cfg)
    val exactNew = DedupLedger.filterNew(spark, gated, textCol,
      exactPath, cfg.dedupPrefixWords)
    NearDupLedger.filterNew(spark, exactNew, textCol, idCol, nearPath)
  }

  /** Record `survivors`' keys in BOTH ledgers — the final step of the
    * crash-safe recipe. Replaying it is harmless. */
  def commit(spark: SparkSession, survivors: DataFrame, textCol: String,
      idCol: String, exactPath: String, nearPath: String,
      prefixWords: Int = 8): Unit = {
    DedupLedger.recordKeys(spark, survivors, textCol, exactPath,
      prefixWords)
    NearDupLedger.recordKeys(spark, survivors, textCol, idCol, nearPath)
  }

  /** Screen, seal, return: the at-most-once convenience composition
    * (checkpointed before the ledgers mutate — the refreshByPath
    * lesson). */
  def ingest(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, exactPath: String, nearPath: String,
      cfg: Curation.Config = Curation.Config()): DataFrame = {
    val survivors = screen(spark, batch, textCol, idCol, exactPath,
      nearPath, cfg)
    val fresh =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        survivors.checkpoint(eager = true)
      else survivors.localCheckpoint(eager = true)
    commit(spark, fresh, textCol, idCol, exactPath, nearPath,
      cfg.dedupPrefixWords)
    fresh
  }
}
