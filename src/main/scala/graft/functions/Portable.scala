package graft.functions

/** Paired Spark-SQL / DuckDB-SQL expression fragments that are guaranteed
  * to produce bit-identical results in both engines.
  *
  * This is what lets approximate-dedup operators (MinHash, SimHash,
  * hyperplane LSH) have an *exact* DuckDB oracle: both engines derive all
  * pseudo-randomness from md5 (standard everywhere) instead of from
  * engine-private hash functions or float RNGs.
  *
  * The portable hash is H(s, seed) = int64(first 12 hex chars of
  * md5(seed || ':' || s)) — a uniform 48-bit value. A production
  * deployment would swap in `xxhash64(seed, s)` (codegen'd, no
  * hex/string detour) — same topology, no oracle twin; the md5 path
  * exists for oracle-verifiable correctness and as the deterministic
  * cross-engine contract.
  */
object Portable {

  /** Spark SQL fragment: 48-bit portable hash of string expression `s`. */
  def sparkHash(s: String, seed: String): String =
    s"cast(conv(substr(md5(concat('$seed', ':', $s)), 1, 12), 16, 10) as bigint)"

  /** DuckDB fragment computing the identical value. (list_transform's
    * lambda gets no index here; strpos is 1-based in both engines.) */
  def duckHash(s: String, seed: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(substr(md5('$seed' || ':' || ($s)), 1, 12), ''), " +
      s"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), (a, b) -> a * 16 + b)"

  /** Same 48-bit hash computed on the JVM — used to pre-materialize
    * data-independent randomness (e.g. LSH hyperplanes) as literals so
    * the hot path never touches md5. */
  def jvmHash(s: String, seed: String): Long =
    jvmHash(java.security.MessageDigest.getInstance("MD5"), s, seed)

  /** The reusable-digest form for per-ROW callers
    * (Multimodal.decodeStub's mapPartitions): one digest per partition
    * instead of a provider lookup per row, and the 48-bit value read
    * straight off the first 6 digest bytes — arithmetically identical
    * to parsing the first 12 hex chars, with no hex-string detour. */
  def jvmHash(md: java.security.MessageDigest, s: String, seed: String): Long = {
    md.reset()
    val d = md.digest(s"$seed:$s".getBytes("UTF-8"))
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Full 128-bit md5 hex of a string — collision-safe key material for
    * path derivation (32-bit String.hashCode is not, ADVICE r7). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  /** Shared tokenization: split on single space (the synthetic corpus is
    * space-separated). Both fragments yield identical string arrays. */
  def sparkTokens(text: String): String = s"split($text, ' ')"
  def duckTokens(text: String): String = s"string_split($text, ' ')"

  /** Locale-free ASCII-only lowercase — ONE rule across all three
    * engines (r13 sweep). `lower()` is NOT portable on non-ASCII text:
    * Spark's falls back to JVM-default-locale `String.toLowerCase`
    * (under tr-TR, "I" → dotless "ı"), DuckDB's is utf8proc
    * (locale-free Unicode), and the former JVM twin used Locale.ROOT
    * ("İ" → "i̇") — three engines, three answers for the same text,
    * silently splitting fingerprint/signature identity. `translate`
    * over A–Z is bit-identical in Spark and DuckDB by construction;
    * non-ASCII letters pass through unchanged in both (and the
    * [^a-z0-9] normalizers then map them to separators identically).
    * The synthetic corpus is pure ASCII with zero uppercase, so
    * adopting this rule is hash-identical there — the fix is for real
    * corpora. */
  def sqlAsciiLower(text: String): String =
    s"translate($text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')"

  /** JVM twin of [[sqlAsciiLower]] — allocation-free when the text has
    * no ASCII uppercase (the common case for normalized corpora). */
  def jvmAsciiLower(s: String): String = {
    val n = s.length
    var i = 0
    while (i < n && !(s.charAt(i) >= 'A' && s.charAt(i) <= 'Z')) i += 1
    if (i == n) s
    else {
      val a = s.toCharArray
      while (i < n) {
        val c = a(i)
        if (c >= 'A' && c <= 'Z') a(i) = (c + 32).toChar
        i += 1
      }
      new String(a)
    }
  }

  /** Word n-gram shingles = DISTINCT over [[sparkNgrams]]/[[duckNgrams]]
    * — defined by composition, not by a fourth/fifth copy of the window
    * index arithmetic, so a boundary fix to the n-gram fragments can
    * never split shingle identity (Jaccard/minhash) from the
    * repetition-signal n-grams. */
  def sparkShingles(text: String, n: Int): String =
    s"array_distinct(${sparkNgrams(text, n)})"
  def duckShingles(text: String, n: Int): String =
    s"list_distinct(${duckNgrams(text, n)})"

  /** Normalized-text form underlying every exact-dedup fingerprint —
    * THE cross-operator definition of "the same document" for d_exact,
    * d_incremental, t_fingerprint, t_clean_corpus and t_dataset_card.
    * One definition per engine (the 'g' flag is the only difference:
    * DuckDB's regexp_replace is first-match-only without it, Spark's is
    * global always) so a charset or flag edit can never silently split
    * fingerprint identity across operators. */
  def sparkNormText(text: String = "text"): String =
    s"trim(regexp_replace(${sqlAsciiLower(text)}, '[^a-z0-9]+', ' '))"
  def duckNormText(text: String = "text"): String =
    s"trim(regexp_replace(${sqlAsciiLower(text)}, '[^a-z0-9]+', ' ', 'g'))"

  /** Stopword list shared by the quality score and [[TextAnalysis]]'s
    * signal columns. Lives here (a leaf module) so Dedup and TextAnalysis
    * can both embed the score without an init-order cycle between their
    * registry vals. */
  val QualityStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "a", "in", "is", "it")
  private def stopList = QualityStopwords.map(x => s"'$x'").mkString(", ")

  /** The composite document quality score over a `text` column — the
    * same arithmetic t_quality emits, as one inline expression so any
    * operator (d_canonical's representative pick, the e2e pipeline) can
    * order by it. Both fragments run the identical IEEE double chain, so
    * cross-engine ordering and equality agree exactly (t_quality is
    * hash-exact against the oracle). */
  /** Punctuation-density component — one definition per engine (the
    * inline forms in t_quality / t_clean_corpus previously carried
    * copies). The denominator is floored at 1: on empty text 0/0 is
    * NULL in Spark (non-ANSI Divide) but NaN in DuckDB — the one input
    * that breaks the bit-identical contract (and poisons d_canonical's
    * representative ordering differently per engine). greatest(len,1)
    * yields 0.0 on both (the numerator is 0 too); identity for any
    * non-empty text. The token-ratio denominator needs no guard:
    * split('') is [''] (size 1) in both engines. */
  def sparkPunctRatio(text: String = "text"): String =
    s"cast(length($text) - length(regexp_replace($text, '[.,!?;:]', '')) as double)" +
      s" / greatest(length($text), 1)"
  def duckPunctRatio(text: String = "text"): String =
    s"CAST(length($text) - length(regexp_replace($text, '[.,!?;:]', '', 'g')) AS DOUBLE)" +
      s" / greatest(length($text), 1)"

  def sparkQualityScore: String =
    qualityCombineSpark(s"size(${sparkTokens("text")})",
      s"(cast(size(filter(${sparkTokens("text")}, t -> t IN ($stopList))) as double)" +
        s" / size(${sparkTokens("text")}))",
      sparkPunctRatio())
  def duckQualityScore: String =
    qualityCombineDuck(s"len(${duckTokens("text")})",
      s"(CAST(len(list_filter(${duckTokens("text")}, t -> t IN ($stopList))) AS DOUBLE)" +
        s" / len(${duckTokens("text")}))",
      duckPunctRatio())

  /** The weighted combination over ALREADY-COMPUTED component
    * expressions — the score's weights exist exactly here, so operators
    * that emit the components as columns (t_quality, t_clean_corpus)
    * compose the same arithmetic the inline forms above embed; a weight
    * retune can no longer desynchronize t_quality's published score
    * from the score d_canonical ranks representatives by. Identical
    * IEEE op order in both engines. */
  def qualityCombineSpark(nTokens: String, stopRatio: String, punctRatio: String): String =
    s"least(cast($nTokens as double) / 100, 1.0) * 0.5" +
      s" + $stopRatio * 0.3 + (1.0 - $punctRatio) * 0.2"
  def qualityCombineDuck(nTokens: String, stopRatio: String, punctRatio: String): String =
    s"least(CAST($nTokens AS DOUBLE) / 100, 1.0) * 0.5" +
      s" + $stopRatio * 0.3 + (1.0 - $punctRatio) * 0.2"

  /** Word n-grams WITH multiplicity (the shingle helpers above are
    * distinct sets for Jaccard/minhash; repetition signals need the
    * occurrence counts). */
  def sparkNgrams(text: String, n: Int): String =
    s"(case when size(${sparkTokens(text)}) < $n then array() " +
      s"else transform(sequence(1, size(${sparkTokens(text)}) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice(${sparkTokens(text)}, i, $n))) end)"
  def duckNgrams(text: String, n: Int): String =
    s"list_transform(range(1, greatest(len(${duckTokens(text)}) - ${n - 2}, 1)), " +
      s"i -> array_to_string(list_slice(${duckTokens(text)}, i, i + ${n - 1}), ' '))"
}
