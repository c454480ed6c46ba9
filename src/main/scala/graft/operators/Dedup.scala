package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Portable

/** Deduplication operators over the `documents` table: exact, word-n-gram
  * Jaccard, MinHash+LSH, and SimHash. (Embedding-cosine near-dup lives in
  * [[Similarity]] next to the ANN operators.)
  *
  * Scale design (the part that matters at 100 TB):
  *  - Exact dedup shuffles an 8-byte hash key, never the document text.
  *  - Jaccard/minhash build an inverted index (explode → join on shingle
  *    or band key) instead of the O(n²) cross join; candidate generation
  *    touches only (doc_id, key) pairs.
  *  - All pseudo-randomness is md5-derived ([[Portable]]) so every
  *    operator has a bit-exact DuckDB oracle. A production deployment
  *    would switch the hash to xxhash64 (same topology, codegen'd).
  *  - Hot-shingle skew ("the the the…" appearing in every doc) is the
  *    classic failure: AQE skew-join handles moderate skew; extremely
  *    frequent shingles should be dropped like stopwords (df cutoff) —
  *    the jaccard operator exposes `maxDf` for that.
  */
object Dedup {

  val NumHashes = 16 // minhash signature length
  val Bands = 4      // LSH bands (rows per band = NumHashes / Bands)
  val SimBits = 32   // simhash signature width

  // ------------------------------------------------------------ d_exact
  /** Exact dedup via normalized-text hash: one shuffle of (hash, doc_id). */
  def dExact(s: SparkSession, dir: String): DataFrame = {
    val norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' '))"
    Tables.documents(s, dir)
      .select(col("doc_id"), expr(s"md5($norm)").as("fp"))
      .groupBy("fp")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("canonical_id"))
  }

  val dExactSql: String = {
    val norm = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
    s"""SELECT md5($norm) AS fp, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
       |FROM documents GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------ d_ngram_jaccard
  /** Word-3-gram Jaccard via inverted index: explode distinct shingles,
    * self-join on shingle (doc_a < doc_b), count common, join per-doc
    * sizes, jaccard = |∩| / (|A|+|B|-|∩|). */
  def dNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sh = docs.select(col("doc_id"),
      explode(expr(Portable.sparkShingles("text", 3))).as("sh"))
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(cnt.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(cnt.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        expr("cast(n_common as double) / (na + nb - n_common)"))
      .filter(col("jaccard") >= 0.2)
      .select("doc_a", "doc_b", "n_common", "jaccard")
  }

  val dNgramJaccardSql: String =
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${Portable.duckShingles("text", 3)}) AS sh FROM documents),
       |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) AS jaccard
       |FROM common
       |JOIN cnt ca ON ca.doc_id = doc_a
       |JOIN cnt cb ON cb.doc_id = doc_b
       |WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.2""".stripMargin

  // ------------------------------------------------------------ d_minhash
  /** MinHash signatures: explode distinct 3-gram shingles once, compute
    * NumHashes portable hashes per shingle, take per-doc minima. One
    * explode + one shuffle; signature is NumHashes longs per doc. */
  def dMinhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sh = docs.select(col("doc_id"),
      explode(expr(Portable.sparkShingles("text", 3))).as("sh"))
    val mins = (0 until NumHashes).map(k =>
      min(expr(Portable.sparkHash("sh", s"mh$k"))).as(s"mh$k"))
    sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  val dMinhashSql: String = {
    val mins = (0 until NumHashes)
      .map(k => s"MIN(${Portable.duckHash("sh", s"mh$k")}) AS mh$k")
      .mkString(",\n    ")
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${Portable.duckShingles("text", 3)}) AS sh FROM documents)
       |SELECT doc_id,
       |    $mins
       |FROM sh GROUP BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------ d_minhash_lsh
  /** MinHash + LSH banding: band key = Bands consecutive signature values;
    * docs sharing any band become candidate pairs; est_sim = fraction of
    * equal signature positions. Candidate generation joins only
    * (band_idx, band_key) — never signatures against signatures. */
  def dMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val sig = dMinhash(s, dir)
    val r = NumHashes / Bands
    val bandExpr = (0 until Bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(k => s"mh$k")
      s"concat_ws('-', ${cols.mkString(", ")})"
    }.mkString("array(", ", ", ")")
    val exploded = sig.select(col("doc_id"),
        array((0 until NumHashes).map(k => col(s"mh$k")): _*).as("sig"),
        posexplode(expr(bandExpr)).as(Seq("band_idx", "band_key")))
    val pairs = exploded.as("a").join(exploded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .distinct()
    pairs.withColumn("est_sim",
        expr(s"cast(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) as double) / $NumHashes"))
      .select("doc_a", "doc_b", "est_sim")
  }

  val dMinhashLshSql: String = {
    val r = NumHashes / Bands
    val bandSelects = (0 until Bands).map { b =>
      val cols = (b * r until (b + 1) * r).map(k => s"mh$k")
      s"SELECT doc_id, $b AS band_idx, ${cols.map(c => s"CAST($c AS VARCHAR)").mkString(" || '-' || ")} AS band_key FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    val eq = (0 until NumHashes)
      .map(k => s"(CASE WHEN sa.mh$k = sb.mh$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(${Portable.duckShingles("text", 3)}) AS sh FROM documents),
       |sig AS (
       |  SELECT doc_id,
       |    ${(0 until NumHashes).map(k => s"MIN(${Portable.duckHash("sh", s"mh$k")}) AS mh$k").mkString(",\n    ")}
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b,
       |  CAST($eq AS DOUBLE) / $NumHashes AS est_sim
       |FROM pairs
       |JOIN sig sa ON sa.doc_id = doc_a
       |JOIN sig sb ON sb.doc_id = doc_b""".stripMargin
  }

  // ------------------------------------------------------------ d_simhash
  /** SimHash signatures (SimBits bits): per distinct token, hash once;
    * bit b of the signature is the sign of Σ_tokens (2·bit_b(h) − 1).
    * The per-bit sums are exact integers, so aggregation order cannot
    * change the result. */
  def dSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs.select(col("doc_id"),
      explode(expr(s"array_distinct(${Portable.sparkTokens("lower(text)")})")).as("tok"))
      .withColumn("h", expr(Portable.sparkHash("tok", "sim")))
    val bitSums = (0 until SimBits).map(b =>
      sum(expr(s"(cast(shiftright(h, $b) & 1 as bigint)) * 2 - 1")).as(s"s$b"))
    val agg = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until SimBits)
      .map(b => s"(case when s$b > 0 then cast(${1L << b} as bigint) else cast(0 as bigint) end)")
      .mkString(" + ")
    agg.select(col("doc_id"), expr(sig).as("simhash"))
  }

  val dSimhashSql: String = {
    val bitSums = (0 until SimBits)
      .map(b => s"SUM(((h >> $b) & 1) * 2 - 1) AS s$b").mkString(",\n    ")
    val sig = (0 until SimBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${Portable.duckTokens("lower(text)")})) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, ${Portable.duckHash("tok", "sim")} AS h FROM toks),
       |b AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id)
       |SELECT doc_id, $sig AS simhash FROM b""".stripMargin
  }

  // ------------------------------------------------------------ d_simhash_pairs
  /** SimHash near-dup pairs: band the signature into 4 byte-chunks
    * (pigeonhole: hamming ≤ 6 ⇒ at least one equal chunk is NOT
    * guaranteed at 8 bits/chunk, but equal-chunk candidates + hamming
    * filter is the standard recall/cost tradeoff), then filter
    * bit_count(xor) ≤ 6. */
  def dSimhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = dSimhash(s, dir)
    val chunks = sig.select(col("doc_id"), col("simhash"),
      posexplode(expr(
        (0 until 4).map(c => s"shiftright(simhash, ${c * 8}) & 255")
          .mkString("array(", ", ", ")"))).as(Seq("chunk_idx", "chunk")))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
        col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sig_a"), col("b.simhash").as("sig_b"))
      .distinct()
      .withColumn("hamming", expr("bit_count(sig_a ^ sig_b)").cast("long"))
      .filter(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
  }

  val dSimhashPairsSql: String = {
    val chunkSelects = (0 until 4).map(c =>
      s"SELECT doc_id, simhash, $c AS chunk_idx, (simhash >> ${c * 8}) & 255 AS chunk FROM sig")
      .mkString("\n  UNION ALL\n  ")
    val bitSums = (0 until SimBits)
      .map(b => s"SUM(((h >> $b) & 1) * 2 - 1) AS s$b").mkString(",\n    ")
    val sigExpr = (0 until SimBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_distinct(${Portable.duckTokens("lower(text)")})) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, ${Portable.duckHash("tok", "sim")} AS h FROM toks),
       |bsum AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sigExpr AS simhash FROM bsum),
       |chunks AS (
       |  $chunkSelects),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sig_a, b.simhash AS sig_b
       |  FROM chunks a JOIN chunks b
       |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
       |   AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
       |FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= 6""".stripMargin
  }

  val all: Map[String, ((SparkSession, String) => DataFrame, Option[String])] = Map(
    "d_exact" -> ((dExact _, Some(dExactSql))),
    "d_ngram_jaccard" -> ((dNgramJaccard _, Some(dNgramJaccardSql))),
    "d_minhash" -> ((dMinhash _, Some(dMinhashSql))),
    "d_minhash_lsh" -> ((dMinhashLsh _, Some(dMinhashLshSql))),
    "d_simhash" -> ((dSimhash _, Some(dSimhashSql))),
    "d_simhash_pairs" -> ((dSimhashPairs _, Some(dSimhashPairsSql))))
}
