package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GraftEncoder, TokenTables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one named entry per implemented operator (SURVEY §2);
  * SQL-expressible entries have a DuckDB oracle in `oracleSql` with
  * IDENTICAL column names/types on both sides. Encode/decode round-trip
  * entries are non-SQL-expressible and deliberately omitted from oracleSql
  * (driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship: encode the token table derived from sf0.001 documents with
    * the auto-selected codecs, decode it back, aggregate — proves the whole
    * engine end-to-end. Driver smoke-checks rows > 0.
    *
    * Bench runs this OUTSIDE its timed loop precisely to absorb one-time
    * JVM costs (its round-1 note: the alphabetically-first query otherwise
    * absorbs all first-use overhead). The encode pipeline alone left the
    * window/broadcast-join/sort execution paths cold, so their first-use
    * codegen+JIT still landed on the first timed entries (ann_* ran ~2x
    * their steady-state cost); the tiny synthetic probes below warm those
    * shapes too — ~0.3 s once, charged to warm-up where it belongs. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val probe = spark.range(0L, 256L, 1L, 4)
      .select($"id", ($"id" % 7).as("k"), ($"id" % 13).cast("double").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"v".desc, $"id".asc)
    probe.withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rn" <= 3)
      .join(broadcast(probe.groupBy($"k").agg(count(lit(1)).as("n"))), Seq("k"))
      .orderBy($"k", $"rn")
      .count()
    val input = TokenTables.fromDocuments(spark, "/root/testdata/sf0.001")
    val segments = GraftEncoder.encode(input, buckets = 8)
    val decoded = GraftEncoder.decode(segments)
    decoded.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("sum_tokens"))
      .orderBy($"source")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries0.Relational.all ++
      queries0.Encode.all ++
      queries0.Text.all ++
      queries0.Dedup.all ++
      queries0.Similarity.all

  def oracleSql: Map[String, String] =
    queries0.Relational.oracles ++
      queries0.Encode.oracles ++
      queries0.Text.oracles ++
      queries0.Dedup.oracles ++
      queries0.Similarity.oracles
}
