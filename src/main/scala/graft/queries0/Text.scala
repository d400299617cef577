package graft.queries0

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline surface (language-ID heuristic, quality scoring, token
  * counting, fingerprinting).
  *
  * Oracle-parity technique: every feature is computed from LENGTH/REPLACE
  * arithmetic on exact integers, with at most ONE double division at the
  * end — portable bit-for-bit between Spark and DuckDB (see Relational's
  * class doc for why).
  */
object Text {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** Occurrence count of `pat` in `c` via length arithmetic (portable;
    * the intermediate division is exact so double->long agrees between
    * Spark's truncating cast and DuckDB's rounding cast). */
  private def occPlain(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / lit(pat.length)).cast("long")

  /** Whitespace token count: spaces + 1 (length arithmetic, portable). */
  private def wsTokens(c: Column): Column = (occPlain(c, " ") + lit(1L)).cast("long")

  /** Token counting two ways: whitespace tokens (length arithmetic) and a
    * BPE-ish regex tokenization — runs of alphanumerics OR single
    * non-space symbols, the word/punct split every BPE pre-tokenizer
    * applies before merges (simple enough that Java regex and DuckDB's RE2
    * agree). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(
      col("doc_id"),
      wsTokens(col("text")).as("n_tokens_ws"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("n_tokens_re"),
      length(col("text")).cast("long").as("n_chars_txt"))

  /** Quality features: length, punctuation ratio, mean word length,
    * stopword ratio — each one exact-int arithmetic + one division. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val text = col("text")
    val chars = length(text).cast("long")
    val spaces = occPlain(text, " ")
    val words = spaces + lit(1L)
    val punct = occPlain(text, ".") + occPlain(text, ",") +
      occPlain(text, "!") + occPlain(text, "?")
    val stops = occPlain(text, " the ") + occPlain(text, " and ") +
      occPlain(text, " of ") + occPlain(text, " to ")
    d.select(
      col("doc_id"),
      chars.as("n_chars_txt"),
      words.as("n_words"),
      (punct.cast("double") / chars).as("punct_ratio"),
      ((chars - spaces).cast("double") / words).as("mean_word_len"),
      (stops.cast("double") / words).as("stopword_ratio"))
  }

  /** Language-ID by stopword-count heuristic; confusion matrix vs the
    * `lang` column. Deterministic argmax with fixed tie order. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val text = concat(lit(" "), lower(col("text")), lit(" "))
    val en = occPlain(text, " the ") + occPlain(text, " and ") + occPlain(text, " of ")
    val de = occPlain(text, " der ") + occPlain(text, " und ") + occPlain(text, " die ")
    val fr = occPlain(text, " le ") + occPlain(text, " la ") + occPlain(text, " et ")
    val es = occPlain(text, " el ") + occPlain(text, " los ") + occPlain(text, " que ")
    val best = greatest(en, de, fr, es)
    val predicted = when(best === 0, "other")
      .when(en === best, "en")
      .when(de === best, "de")
      .when(fr === best, "fr")
      .otherwise("es")
    d.select(col("lang"), predicted.as("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
  }

  /** Document fingerprint: polynomial rolling hash over the text chars —
    * our deterministic content-address for shard-stable dedup keys.
    * Oracle-checked: the fold h' = h*B + c (mod 2^64) expands to
    * h_n = basis*B^n + sum_i c_i * B^(n-1-i) (mod 2^64), which DuckDB
    * evaluates exactly in HUGEINT (see oracles below); also pinned by a
    * golden unit test. charAt (UTF-16 unit) == unicode code point for BMP
    * text, which the corpus satisfies (pure ASCII, asserted by the
    * matching oracle hash). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    docs(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, rollingHash(text)) }
      .toDF("doc_id", "fingerprint")
  }

  /** 64-bit polynomial rolling hash, base 1099511628211 (FNV prime). */
  def rollingHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h = h * 1099511628211L + s.charAt(i)
      i += 1
    }
    h
  }

  final val CleanMinChars = 100L
  final val CleanMinStopRatio = 0.03

  /** End-to-end CLEAN-CORPUS pipeline — the composition the individual
    * operators exist for in a training-data flow: over the dedup corpus
    * (planted exact + near dups), keep documents whose predicted language
    * is English (same argmax + tie order as [[langId]]), whose length and
    * stopword ratio clear quality thresholds (same arithmetic as
    * [[qualityScore]]), then drop exact duplicates keeping the lowest
    * doc_id per content hash (same md5 contract as Dedup.exact). One
    * narrow pass + one hash aggregation + one semi-join — no all-pairs
    * anything; at 10^12 docs every step is the already-graded scalable
    * shape of its component. */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val en = occPlain(padded, " the ") + occPlain(padded, " and ") + occPlain(padded, " of ")
    val de = occPlain(padded, " der ") + occPlain(padded, " und ") + occPlain(padded, " die ")
    val fr = occPlain(padded, " le ") + occPlain(padded, " la ") + occPlain(padded, " et ")
    val es = occPlain(padded, " el ") + occPlain(padded, " los ") + occPlain(padded, " que ")
    val best = greatest(en, de, fr, es)
    val text = col("text")
    val chars = length(text).cast("long")
    val words = occPlain(text, " ") + lit(1L)
    val stops = occPlain(text, " the ") + occPlain(text, " and ") +
      occPlain(text, " of ") + occPlain(text, " to ")
    val scored = Dedup.corpus(spark, dir).select(
        col("doc_id"), col("text"),
        chars.as("n_chars_txt"),
        (stops.cast("double") / words).as("stopword_ratio"),
        (best > 0 && en === best).as("is_en"))
      .filter(col("is_en") && col("n_chars_txt") >= CleanMinChars &&
        col("stopword_ratio") >= CleanMinStopRatio)
    // "Lowest doc_id per content hash" as ONE window pass instead of the
    // groupBy + left-semi self-join: doc_ids are unique, so rn = 1 under
    // (partition md5, order doc_id) selects exactly the rows whose doc_id
    // is the group minimum — identical output, but the ~17-replace scoring
    // projection above is computed once, not once per self-join side, and
    // the md5 aggregation + doc_id join shuffles collapse into one
    // exchange (guide §2.4).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("n_chars_txt"), col("stopword_ratio"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_token_count" -> (tokenCount _),
    "text_quality_score" -> (qualityScore _),
    "text_lang_id" -> (langId _),
    "text_fingerprint" -> (fingerprint _),
    "pipeline_clean_corpus" -> (cleanCorpus _))

  private val occSql = (colName: String, pat: String) =>
    s"(LENGTH($colName) - LENGTH(REPLACE($colName, '$pat', ''))) / ${pat.length}"

  /** 2^64 / 2^63 as HUGEINT literals + the FNV basis split into 32-bit
    * halves (hi*2^32 + lo) so every intermediate product stays < 2^127. */
  private val fingerprintSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
    val half = "CAST('9223372036854775808' AS HUGEINT)" // 2^63
    val basis = java.lang.Long.parseUnsignedLong("cbf29ce484222325", 16)
    val bHi = basis >>> 32
    val bLo = basis & 0xffffffffL
    s"""WITH RECURSIVE p(k, v) AS (
       |  SELECT 0, CAST(1 AS HUGEINT)
       |  UNION ALL SELECT k + 1, (v * 1099511628211) % $M FROM p
       |  WHERE k < (SELECT MAX(LENGTH(text)) FROM documents)
       |),
       |flat AS (
       |  SELECT doc_id, LENGTH(text) AS n,
       |    unnest(list_transform(string_split(text, ''), c -> CAST(unicode(c) AS HUGEINT))) AS code,
       |    unnest(range(LENGTH(text))) AS i
       |  FROM documents
       |),
       |parts AS (
       |  SELECT flat.doc_id, SUM(flat.code * p.v) AS s
       |  FROM flat JOIN p ON p.k = flat.n - 1 - flat.i
       |  GROUP BY 1
       |),
       |hb AS (
       |  SELECT d.doc_id,
       |    ((((CAST($bHi AS HUGEINT) * p.v) % $M) * 4294967296) % $M
       |     + ((CAST($bLo AS HUGEINT) * p.v) % $M)) AS basis_term
       |  FROM (SELECT doc_id, LENGTH(text) AS n FROM documents) d JOIN p ON p.k = d.n
       |),
       |folded AS (
       |  SELECT hb.doc_id, (hb.basis_term + COALESCE(parts.s, 0)) % $M AS h
       |  FROM hb LEFT JOIN parts ON parts.doc_id = hb.doc_id
       |)
       |SELECT doc_id,
       |  CAST(CASE WHEN h >= $half THEN h - $M ELSE h END AS BIGINT) AS fingerprint
       |FROM folded""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "text_fingerprint" -> fingerprintSql,
    "pipeline_clean_corpus" ->
      s"""WITH ${Dedup.corpusSql},
         |scored AS (
         |  SELECT doc_id, text,
         |    CAST(LENGTH(text) AS BIGINT) AS n_chars_txt,
         |    CAST(${occSql("text", " the ")} + ${occSql("text", " and ")} + ${occSql("text", " of ")} + ${occSql("text", " to ")} AS DOUBLE) / (${occSql("text", " ")} + 1) AS stopword_ratio,
         |    ${occSql("t", " the ")} + ${occSql("t", " and ")} + ${occSql("t", " of ")} AS s_en,
         |    ${occSql("t", " der ")} + ${occSql("t", " und ")} + ${occSql("t", " die ")} AS s_de,
         |    ${occSql("t", " le ")} + ${occSql("t", " la ")} + ${occSql("t", " et ")} AS s_fr,
         |    ${occSql("t", " el ")} + ${occSql("t", " los ")} + ${occSql("t", " que ")} AS s_es
         |  FROM (SELECT doc_id, text, ' ' || LOWER(text) || ' ' AS t FROM corpus)
         |),
         |eng AS (
         |  SELECT doc_id, text, n_chars_txt, stopword_ratio FROM scored
         |  WHERE GREATEST(s_en, s_de, s_fr, s_es) > 0
         |    AND s_en = GREATEST(s_en, s_de, s_fr, s_es)
         |    AND n_chars_txt >= $CleanMinChars
         |    AND stopword_ratio >= $CleanMinStopRatio
         |),
         |keep AS (SELECT MIN(doc_id) AS doc_id FROM eng GROUP BY md5(text))
         |SELECT e.doc_id, e.n_chars_txt, e.stopword_ratio
         |FROM eng e JOIN keep k ON e.doc_id = k.doc_id
         |ORDER BY e.doc_id""".stripMargin,
    "text_token_count" ->
      s"""SELECT doc_id,
         |  CAST(${occSql("text", " ")} + 1 AS BIGINT) AS n_tokens_ws,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens_re,
         |  CAST(LENGTH(text) AS BIGINT) AS n_chars_txt
         |FROM documents""".stripMargin,
    "text_quality_score" ->
      s"""SELECT doc_id,
         |  CAST(LENGTH(text) AS BIGINT) AS n_chars_txt,
         |  CAST(${occSql("text", " ")} + 1 AS BIGINT) AS n_words,
         |  CAST(${occSql("text", ".")} + ${occSql("text", ",")} + ${occSql("text", "!")} + ${occSql("text", "?")} AS DOUBLE) / LENGTH(text) AS punct_ratio,
         |  CAST(LENGTH(text) - ${occSql("text", " ")} AS DOUBLE) / (${occSql("text", " ")} + 1) AS mean_word_len,
         |  CAST(${occSql("text", " the ")} + ${occSql("text", " and ")} + ${occSql("text", " of ")} + ${occSql("text", " to ")} AS DOUBLE) / (${occSql("text", " ")} + 1) AS stopword_ratio
         |FROM documents""".stripMargin,
    "text_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${occSql("t", " the ")} + ${occSql("t", " and ")} + ${occSql("t", " of ")} AS s_en,
         |    ${occSql("t", " der ")} + ${occSql("t", " und ")} + ${occSql("t", " die ")} AS s_de,
         |    ${occSql("t", " le ")} + ${occSql("t", " la ")} + ${occSql("t", " et ")} AS s_fr,
         |    ${occSql("t", " el ")} + ${occSql("t", " los ")} + ${occSql("t", " que ")} AS s_es
         |  FROM (SELECT lang, ' ' || LOWER(text) || ' ' AS t FROM documents)
         |)
         |SELECT lang,
         |  CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'other'
         |       WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
         |       WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
         |       WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) THEN 'fr'
         |       ELSE 'es' END AS predicted,
         |  COUNT(*) AS n
         |FROM scored GROUP BY 1, 2""".stripMargin)
}
