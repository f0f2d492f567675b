package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines interchange — the de-facto wire format of public LLM
  * corpora (one JSON object per line; Dolma, RedPajama, FineWeb all ship
  * this way). Parquet stays the engine's native format; this store is
  * the boundary where corpora enter and leave.
  *
  * Contract notes:
  *  - WRITE drops null fields per line (standard JSONL); READ restores
  *    them as typed nulls via the REQUIRED explicit schema — inference
  *    over 100 TB would cost a full extra pass and can mistype sparse
  *    columns (a column that is all-null in the sampled files infers as
  *    string), so there is deliberately no schema-less read.
  *  - READ is FAILFAST by default: a corrupt line in a curated corpus
  *    should stop the job, not vanish. [[readPermissive]] is the
  *    crawl-ingest path: corrupt lines land whole in `_corrupt_record`
  *    for quarantine instead of killing the run.
  *  - Compression is a codec option (`gzip`, `zstd`, …); files stay one
  *    object per line either way, so downstream line tools still work.
  *    Splittability caveat for 100 TB: gzip files are NOT splittable —
  *    one task per file regardless of size — so write compressed shards
  *    at bounded size (compose with `Curation.packShards` /
  *    [[ShardStore]]) rather than few huge files.
  */
object JsonlStore {

  def write(df: DataFrame, path: String,
      codec: Option[String] = None,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    codec.foreach(c => w.option("compression", c))
    w.json(path)
  }

  /** Strict read: explicit schema, corrupt line = failed job. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Ingest read: rows that fail to parse carry the raw line in
    * `corruptCol` (all data fields null) — filter on
    * `col(corruptCol).isNotNull` to quarantine them. The corrupt
    * column is appended to the caller's schema here; passing it
    * pre-added also works (Spark requires it present to populate). */
  def readPermissive(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): DataFrame = {
    val full =
      if (schema.fieldNames.contains(corruptCol)) schema
      else schema.add(corruptCol, org.apache.spark.sql.types.StringType)
    spark.read.schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }
}
