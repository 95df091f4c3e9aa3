package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, from_json}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-Lines corpus source/sink — the interchange format of LLM data
  * pipelines (one JSON document per line: raw crawls, filtered dumps,
  * instruction sets all ship as .jsonl shards).
  *
  * Spark's JSON datasource is distributed (line-splittable reads,
  * per-task writes); these wrappers pin the curation-pipeline
  * conventions: an EXPLICIT schema (inference is a full extra pass
  * over 100 TB and lets one stray shard silently widen a column), and
  * a corrupt-line policy that never silently drops data — malformed
  * lines are either captured in a quarantine column (`readQuarantine`)
  * or fail the read (`readStrict`). Silent-drop (Spark's
  * DROPMALFORMED) is deliberately not offered: at corpus scale a
  * quietly vanishing 0.1% of lines is an unauditable data loss.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"

  /** Read with the malformed-line quarantine: rows parsing clean carry
    * null in `_corrupt_record`; malformed lines yield a row that is
    * null in every schema column with the raw line in
    * `_corrupt_record`, so bad shards are countable and inspectable
    * with one filter instead of vanishing.
    *
    * Implemented as a distributed `text` read + per-row `from_json`
    * rather than the json datasource: Spark forbids scans whose only
    * referenced column is the datasource's internal corrupt column
    * (column pruning would otherwise skip the parse that defines it),
    * which would make `corrupt(df).count()` — the audit query this
    * reader exists for — an analysis error. With the parse as an
    * expression the quarantine column is an ordinary projection, every
    * downstream query shape is legal, and the read is still
    * line-splittable with the parser inlined per task. */
  def readQuarantine(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already contains $CorruptCol")
    val withCorrupt =
      StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))
    // blank lines are skipped (matching the native json datasource —
    // they are line noise, not records); a line that parses to a NULL
    // struct (the literal `null` document, which PERMISSIVE does not
    // flag) is quarantined with its raw text rather than admitted as a
    // phantom all-null row — the audit contract is that nothing is
    // silently admitted or dropped. `{}` still parses clean to an
    // all-null-fields row (the struct itself is non-null), as native.
    // "Blank" is the full whitespace CLASS (rlike \s), not trim()'s
    // ASCII space: native skips a tab- or CR-only line too, and a
    // trim-based check would route those to quarantine instead.
    spark.read.text(path)
      .filter(!col("value").rlike("^\\s*$"))
      .select(col("value"), from_json(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("__p"))
      .select(schema.fieldNames.map(f => col(s"__p.`$f`").as(f)) :+
        org.apache.spark.sql.functions.when(col("__p").isNull, col("value"))
          .otherwise(col(s"__p.`$CorruptCol`")).as(CorruptCol): _*)
  }

  /** Read that FAILS on the first malformed line (ingest gates that
    * must not admit partial shards). */
  def readStrict(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** The clean rows of a quarantine read, corrupt column dropped. */
  def clean(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantined raw lines of a quarantine read. */
  def corrupt(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))

  /** Write as JSON-Lines. One file per partition at scale;
    * `singleFile` only for small results. */
  def write(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    d.write.mode("overwrite").json(path)
  }
}
