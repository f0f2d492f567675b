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
  * Pipelines that must survive crashes call the steps themselves:
  * screen → durably land survivors → commit. The unit of replay after
  * a crash in commit is COMMIT ITSELF, re-run with the already-landed
  * survivor set read back from durable storage — never a re-screen:
  * commit mutates two ledgers non-atomically, so a crash between the
  * two recordKeys calls leaves one ledger sealed, and a re-screen
  * would then return empty and permanently strand the other ledger
  * without the batch's keys. Re-running commit with the landed set is
  * safe from any crash point (recordKeys replays are no-ops for
  * collision checks in both ledgers).
  *
  * In-batch duplicates are NOT removed (both ledgers filter against
  * HISTORY only); compose `Curation.curate` for in-batch semantics or
  * ingest batch-by-batch, where each batch seals the next.
  */
object CorpusIngest {

  /** Pure screening: the batch rows that pass the quality gate AND
    * have no exact-prefix ancestor AND no near-dup band collision in
    * history. BOTH ledgers resolve their key rules from stored meta
    * (band geometry and prefix-word rule alike) — `cfg.dedupPrefixWords`
    * only serves exact ledgers seeded before the rule was stored. */
  def screen(spark: SparkSession, batch: DataFrame, textCol: String,
      idCol: String, exactPath: String, nearPath: String,
      cfg: Curation.Config = Curation.Config()): DataFrame =
    screenPinned(spark, batch, textCol, idCol, exactPath, nearPath,
      cfg)._1

  /** [[screen]] plus the persisted intermediate it pins: the near-dup
    * stage consumes the gate+exact result TWICE (banding branch and
    * anti-join branch), so it is persisted — [[ingest]] unpersists it
    * once the survivors are checkpointed; long-lived callers of the
    * pure [[screen]] release it via the ContextCleaner when they drop
    * the returned plan (nothing else holds it). */
  private def screenPinned(spark: SparkSession, batch: DataFrame,
      textCol: String, idCol: String, exactPath: String,
      nearPath: String, cfg: Curation.Config)
      : (DataFrame, DataFrame) = {
    val gated = Curation.qualityGate(batch, textCol, cfg)
    val exactNew = DedupLedger.filterNew(spark, gated, textCol,
        exactPath, cfg.dedupPrefixWords)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (NearDupLedger.filterNew(spark, exactNew, textCol, idCol, nearPath),
      exactNew)
  }

  /** Record `survivors`' keys in BOTH ledgers — the final step of the
    * crash-safe recipe. NOT atomic across the two ledgers: on a crash
    * mid-commit, re-run commit with the SAME landed survivor set (see
    * the object doc) — replays are no-ops, a re-screen is not. */
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
    val (scr, pinned) = screenPinned(spark, batch, textCol, idCol,
      exactPath, nearPath, cfg)
    val fresh = Lineage.truncated(spark, scr)
    // the checkpoint materialized the survivors; the pinned
    // intermediate would otherwise accumulate one cached frame per
    // ingested batch in a long-lived pipeline
    pinned.unpersist(blocking = false)
    commit(spark, fresh, textCol, idCol, exactPath, nearPath,
      cfg.dedupPrefixWords)
    fresh
  }
}
