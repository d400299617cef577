package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{StructField, StructType}

/** Multi-file schema inference + merge — the analog of the reference's
  * `infer_schema` (concurrent footer reads + `Schema::try_merge`,
  * /root/reference/src/file_format.rs:137-162). Semantics mirror Arrow's
  * try_merge: same-name fields must agree on type (fail fast naming the
  * field), nullability unions, fields not seen before append in first-seen
  * order. The engine's own input schema is fixed by input_hint, but a user
  * pointing the reader at a mixed directory (schema evolved across
  * snapshots — e.g. a metadata column added) hits this path. */
object SchemaMerge {

  def merge2(a: StructType, b: StructType): StructType = {
    val byName = a.fields.map(f => f.name -> f).toMap
    val merged = new scala.collection.mutable.ArrayBuffer[StructField]
    merged ++= a.fields
    b.fields.foreach { bf =>
      byName.get(bf.name) match {
        case None => merged += bf
        case Some(af) if af.dataType == bf.dataType =>
          if (bf.nullable && !af.nullable) {
            val i = merged.indexWhere(_.name == af.name)
            merged(i) = af.copy(nullable = true)
          }
        case Some(af) =>
          throw new IllegalArgumentException(
            s"schema merge conflict on field '${bf.name}': " +
              s"${af.dataType.simpleString} vs ${bf.dataType.simpleString}")
      }
    }
    StructType(merged.toSeq)
  }

  def merge(schemas: Seq[StructType]): StructType = {
    require(schemas.nonEmpty, "no schemas to merge")
    schemas.reduce(merge2)
  }

  /** Read each path's footer schema, merge, and return the merged view of
    * all files (missing columns read as null — parquet's usual evolution
    * contract). */
  def readMerged(spark: SparkSession, paths: Seq[String]): org.apache.spark.sql.DataFrame = {
    val merged = merge(paths.map(p => spark.read.parquet(p).schema))
    spark.read.schema(merged).parquet(paths: _*)
  }
}
