package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stores ANY scalar table as a graft table and reads it back with its
  * original schema — the bridge behind the graft-storage relational suite
  * (the reference runs its whole TPC-DS query set against its own ORC
  * source, /root/reference/benches/tpcds_bench.rs:439-626; this is the
  * analog for the connector).
  *
  * Mapping: the canonical carrier columns are synthesized — `doc_id` is
  * the first column cast to string (key-ish, so the bucket hash spreads),
  * `tokens` is empty, `source` is the table name — and EVERY original
  * column rides as a [[MetaColumns]] metadata stream (selector-encoded,
  * PRESENT-framed, stat-pruned like any graft column). Original names that
  * collide with the canonical four get an `m_` prefix on disk, stripped on
  * read; the recorded table schema preserves original column order, so the
  * read side reconstructs the exact input schema with zero per-table
  * state. */
object GraftTableBridge {

  /** When set on the session, [[graft.queries0.Relational]] reads its base
    * tables from `<root>/<name>` graft tables instead of parquet. */
  final val TableRootKey = "graft.bench.tableRoot"

  private def metaName(c: String): String =
    if (MetaColumns.ReservedNames.contains(c)) s"m_$c" else c

  /** Inverse of [[metaName]]: strip the prefix ONLY when it was added for
    * a reserved collision — a genuine `m_*` column keeps its name. */
  private def originalName(stored: String): String = {
    val stripped = stored.stripPrefix("m_")
    if (stored.startsWith("m_") && MetaColumns.ReservedNames.contains(stripped)) stripped
    else stored
  }

  def write(df: DataFrame, path: String, tableName: String, buckets: Int): Unit = {
    val names = df.schema.fieldNames.toSeq
    require(names.map(metaName).distinct.length == names.length,
      s"bridge rename collision in ${names.mkString(",")}")
    val carrier = Seq(
      // doc_id is a carrier, not data: coalesce nulls in the key column to
      // a placeholder so the writer (which requires doc_id non-null) never
      // NPEs on a nullable first column.
      coalesce(col(names.head).cast("string"), lit("")).as("doc_id"),
      typedLit(Array.empty[Int]).as("tokens"),
      lit(0).as("n_tok"),
      lit(tableName).as("source"))
    df.select(carrier ++ names.map(n => col(n).as(metaName(n))): _*)
      .write.format("graft").option("buckets", buckets.toString)
      .mode(org.apache.spark.sql.SaveMode.Append).save(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val table = spark.read.format("graft").load(path)
    val metas = MetaColumns.metaFields(table.schema) // recorded (original) order
    table.select(metas.map(f => col(f.name).as(originalName(f.name))): _*)
  }
}
