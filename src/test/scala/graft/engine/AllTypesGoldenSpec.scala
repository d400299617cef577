package graft.engine

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's own golden integration tests, re-expressed.
  *
  * Its correctness suite reads two tiny ORC fixtures and asserts literal
  * batches (/root/reference/tests/basic_reading.rs:259-277 — the 11-row
  * `alltypes` dump — and :402-408 `map_list`; predicate goldens in
  * tests/predicate_pushdown.rs). We reproduce the exact fixture CONTENT
  * (FIXTURES.md §1-2) in-memory, round-trip it through Spark's ORC
  * writer/reader (the original fixture was itself written by Spark/ORC
  * Java), and assert the same golden facts the reference pins:
  *
  *  - full scan: 11 rows, rows 1 and 11 all-NULL (basic_reading.rs:263,:273)
  *  - COUNT(*)=11 (:434-440); GROUP BY boolean -> false:3,true:6 (:939-947)
  *  - int8 IS NULL -> 2 rows (:674)
  *  - int8 > 51 -> {52,53,127} (predicate_pushdown.rs:123-131)
  *  - float64 in (3,4) -> exactly 3.14159265359 (:403-409)
  *  - extremes/±inf/decimals/unicode/dates survive bit-identically (:698-794)
  *  - filters reach the ORC scan as PushedFilters (the reference's pushdown
  *    contract, src/source.rs:257-289)
  */
class AllTypesGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("boolean", BooleanType),
    StructField("int8", ByteType),
    StructField("int16", ShortType),
    StructField("int32", IntegerType),
    StructField("int64", LongType),
    StructField("float32", FloatType),
    StructField("float64", DoubleType),
    StructField("decimal", DecimalType(15, 5)),
    StructField("binary", BinaryType),
    StructField("utf8", StringType),
    StructField("date32", DateType)))

  private def dec(s: String) = new java.math.BigDecimal(s).setScale(5)
  private val allNull = Row(null, null, null, null, null, null, null, null, null, null, null)

  private val rows: Seq[Row] = Seq(
    allNull,
    Row(true, 0.toByte, 0.toShort, 0, 0L, 0.0f, 0.0, dec("0"), Array.empty[Byte], "", Date.valueOf("1970-01-01")),
    Row(false, 1.toByte, 1.toShort, 1, 1L, 1.0f, 1.0, dec("1"), Array(0x61.toByte), "a", Date.valueOf("1970-01-02")),
    Row(false, (-1).toByte, (-1).toShort, -1, -1L, -1.0f, -1.0, dec("-1"), Array(0x20.toByte), "", Date.valueOf("1969-12-31")),
    Row(true, 127.toByte, 32767.toShort, Int.MaxValue, Long.MaxValue,
      Float.PositiveInfinity, Double.PositiveInfinity, dec("123456789.12345"),
      "encode".getBytes("UTF-8"), "encode", Date.valueOf("9999-12-31")),
    Row(true, (-128).toByte, (-32768).toShort, Int.MinValue, Long.MinValue,
      Float.NegativeInfinity, Double.NegativeInfinity, dec("-999999999.99999"),
      "decode".getBytes("UTF-8"), "decode", Date.valueOf("1582-10-15")),
    Row(true, 50.toByte, 50.toShort, 50, 50L, 3.1415927f, 3.14159265359, dec("-31256.123"),
      "大熊和奏".getBytes("UTF-8"), "大熊和奏", Date.valueOf("1582-10-16")),
    Row(true, 51.toByte, 51.toShort, 51, 51L, -3.1415927f, -3.14159265359, dec("1241000"),
      "斉藤朱夏".getBytes("UTF-8"), "斉藤朱夏", Date.valueOf("2000-01-01")),
    Row(true, 52.toByte, 52.toShort, 52, 52L, 1.1f, 1.1, dec("1.1"),
      "鈴原希実".getBytes("UTF-8"), "鈴原希実", Date.valueOf("3000-12-31")),
    Row(false, 53.toByte, 53.toShort, 53, 53L, -1.1f, -1.1, dec("0.99999"),
      Array(0xf0, 0x9f, 0xa4, 0x94).map(_.toByte), "🤔", Date.valueOf("1900-01-01")),
    allNull)

  /** The fixture after an ORC write+read round-trip — the same storage
    * lineage as the reference's fixture (written by Spark, read back). */
  lazy val alltypes: DataFrame = {
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-alltypes").toString
    df.coalesce(1).write.mode("overwrite").option("compression", "snappy").orc(dir)
    spark.read.schema(schema).orc(dir)
  }

  test("schema inference matches the reference golden (basic_reading.rs:192)") {
    val inferred = spark.read.orc(alltypes.inputFiles.head.stripSuffix("/")).schema
    assert(inferred === schema)
  }

  test("full scan: 11 rows, 2 all-NULL (basic_reading.rs:263,273,434)") {
    assert(alltypes.count() === 11L)
    assert(alltypes.filter(col("int8").isNull && col("utf8").isNull &&
      col("boolean").isNull).count() === 2L)
  }

  test("values round-trip bit-identically incl. extremes/inf/unicode (:698-794)") {
    val got = alltypes.orderBy(col("int8").asc_nulls_first, col("boolean").asc_nulls_first,
      col("float64").asc_nulls_first).collect()
    assert(got.length === 11)
    val five = got.find(r => !r.isNullAt(1) && r.getByte(1) == 127.toByte).get
    assert(five.getInt(3) === Int.MaxValue)
    assert(five.getLong(4) === Long.MaxValue)
    assert(five.getFloat(5).isPosInfinity)
    assert(five.getDouble(6).isPosInfinity)
    assert(five.getDecimal(7) === dec("123456789.12345"))
    assert(five.getString(9) === "encode")
    assert(five.getDate(10) === Date.valueOf("9999-12-31"))
    val six = got.find(r => !r.isNullAt(1) && r.getByte(1) == (-128).toByte).get
    assert(six.getLong(4) === Long.MinValue)
    assert(six.getFloat(5).isNegInfinity)
    assert(six.getDecimal(7) === dec("-999999999.99999"))
    assert(six.getDate(10) === Date.valueOf("1582-10-15"))
    val ten = got.find(r => !r.isNullAt(9) && r.getString(9) == "🤔").get
    assert(ten.getAs[Array[Byte]](8).toSeq === Array(0xf0, 0x9f, 0xa4, 0x94).map(_.toByte).toSeq)
    val cjk = got.find(r => !r.isNullAt(9) && r.getString(9) == "大熊和奏").get
    assert(cjk.getDate(10) === Date.valueOf("1582-10-16"))
  }

  test("projection subset/reorder/single/explicit-all (basic_reading.rs:291-361,812-870)") {
    assert(alltypes.select("utf8", "int8").columns.toSeq === Seq("utf8", "int8"))
    assert(alltypes.select("int8").count() === 11L)
    assert(alltypes.select(schema.fieldNames.reverse.map(col): _*).columns.toSeq ===
      schema.fieldNames.reverse.toSeq)
    assert(alltypes.select(schema.fieldNames.map(col): _*).collect().length === 11)
  }

  test("sort nulls-first + limit top-k (basic_reading.rs:294-296)") {
    val top = alltypes.orderBy(col("int8").asc_nulls_first).select("int8").limit(4).collect()
    assert(top.take(2).forall(_.isNullAt(0)), "nulls first")
    assert(top.drop(2).map(_.getByte(0)).toSeq === Seq((-128).toByte, (-1).toByte))
  }

  test("filter int8 > 51 -> {52,53,127} (predicate_pushdown.rs:123-131)") {
    val got = alltypes.filter(col("int8") > 51).select("int8").collect()
      .map(_.getByte(0)).sorted.toSeq
    assert(got === Seq(52.toByte, 53.toByte, 127.toByte))
  }

  test("filter 3 < float64 < 4 -> exactly pi (predicate_pushdown.rs:403-409)") {
    val got = alltypes.filter(col("float64") > 3.0 && col("float64") < 4.0)
      .select("float64").collect().map(_.getDouble(0)).toSeq
    assert(got === Seq(3.14159265359))
  }

  test("filter int8 IS NULL -> 2 rows; IS NOT NULL -> 9 (basic_reading.rs:674)") {
    assert(alltypes.filter(col("int8").isNull).count() === 2L)
    assert(alltypes.filter(col("int8").isNotNull).count() === 9L)
  }

  test("compound AND/OR/NOT and reversed operands (predicate_pushdown.rs:185-224)") {
    // bool=true rows have int8 {0,127,-128,50,51,52}; <51 keeps {0,-128,50}
    assert(alltypes.filter(col("boolean") === true && col("int8") < 51).count() === 3L)
    assert(alltypes.filter(col("utf8") === "decode" || col("utf8") === "encode").count() === 2L)
    // NOT(int8>0) keeps {0,-1,-128}; NULLs drop (three-valued logic)
    assert(alltypes.filter(!(col("int8") > 0)).count() === 3L)
    // reversed operand order, the predicate.rs:123-138 flip case
    assert(alltypes.filter(lit(51) < col("int8")).count() === 3L)
  }

  test("aggregations: count/min/max and GROUP BY boolean (basic_reading.rs:906,939-947)") {
    val agg = alltypes.agg(count(lit(1)), min(col("int8")), max(col("int8"))).collect()(0)
    assert(agg.getLong(0) === 11L)
    assert(agg.getByte(1) === (-128).toByte)
    assert(agg.getByte(2) === 127.toByte)
    val byBool = alltypes.filter(col("boolean").isNotNull)
      .groupBy("boolean").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byBool === Map(false -> 3L, true -> 6L))
  }

  test("filters reach the ORC scan as PushedFilters (src/source.rs:257-289 contract)") {
    val plan = alltypes.filter(col("int8") > 51).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(int8,51"),
      s"expected pushed filter in plan:\n$plan")
  }

  test("alltypes fixture round-trips bit-identically through GRAFT storage " +
    "(the reference type matrix, src/lib.rs:139-156, on the graft codec stack)") {
    import graft.sources.GraftTableBridge
    val root = java.nio.file.Files.createTempDirectory("graft-alltypes-rt").toString
    val in = alltypes
    GraftTableBridge.write(in, s"$root/alltypes", "alltypes", buckets = 2)
    val out = GraftTableBridge.read(spark, s"$root/alltypes")
    assert(out.schema === in.schema, "schema drift through graft storage")
    // multiset equality (two identical all-NULL rows must BOTH survive)
    assert(out.count() === 11L)
    assert(out.exceptAll(in).count() === 0L, "rows present in graft output only")
    assert(in.exceptAll(out).count() === 0L, "rows lost through graft storage")
    // the reference's predicate goldens replay against the graft table
    assert(out.filter(col("int8") > 51).select("int8").collect()
      .map(_.getByte(0)).sorted.toSeq === Seq(52.toByte, 53.toByte, 127.toByte))
    assert(out.filter(col("int8").isNull).count() === 2L)
    assert(out.filter(col("boolean") === true && col("int8") < 51).count() === 3L)
    assert(out.filter(col("decimal") === dec("123456789.12345")).count() === 1L)
    assert(out.filter(col("float32") > 3.0f && col("float32") < 4.0f)
      .collect().map(_.getFloat(5)).toSeq === Seq(3.1415927f))
    // binary equality predicate (re-filtered by Spark; no stats pruning)
    assert(out.filter(col("binary") === lit("encode".getBytes("UTF-8"))).count() === 1L)
    // extrema fold from headers in the column's own type
    val mm = out.agg(min(col("int16")), max(col("int16")),
      min(col("decimal")), max(col("decimal")), min(col("float32"))).collect()(0)
    assert(mm.getShort(0) === (-32768).toShort && mm.getShort(1) === 32767.toShort)
    assert(mm.getDecimal(2) === dec("-999999999.99999"))
    assert(mm.getDecimal(3) === dec("123456789.12345"))
    assert(mm.getFloat(4).isNegInfinity)
  }

  test("map_list fixture golden (basic_reading.rs:402-408)") {
    import spark.implicits._
    val df = Seq((1L, Map("one" -> "1", "zero" -> "0"), Seq("test", "blaze"), "blaze"))
      .toDF("id", "m", "l", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft-maplist").toString
    df.write.mode("overwrite").option("compression", "snappy").orc(dir)
    val got = spark.read.orc(dir).collect()(0)
    assert(got.getLong(0) === 1L)
    assert(got.getAs[Map[String, String]](1) === Map("one" -> "1", "zero" -> "0"))
    assert(got.getAs[Seq[String]](2) === Seq("test", "blaze"))
    assert(got.getString(3) === "blaze")
    // and the same fixture round-trips through GRAFT storage (round 5:
    // map + list metadata columns — the full map_list shape on our codecs)
    import graft.sources.GraftTableBridge
    val root = java.nio.file.Files.createTempDirectory("graft-maplist-rt").toString
    GraftTableBridge.write(df, s"$root/map_list", "map_list", buckets = 1)
    val back = GraftTableBridge.read(spark, s"$root/map_list").collect()(0)
    assert(back.getLong(0) === 1L)
    assert(back.getAs[Map[String, String]](1) === Map("one" -> "1", "zero" -> "0"))
    assert(back.getAs[Seq[String]](2) === Seq("test", "blaze"))
    assert(back.getString(3) === "blaze")
  }
}
