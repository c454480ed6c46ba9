package graft.functions

/** JVM twin of the SQL SimHash in [[graft.operators.Dedup]] — the same
  * tokenization (space-split of lowercased text, distinct tokens), the
  * same two portable 48-bit hashes ("sim"/"sim2" seeds), the same
  * majority-vote bit rule, producing bit-identical 60-bit signatures
  * (SimHashConsistencySpec pins the differential against the SQL form).
  *
  * Lives in the leaf functions package so the streaming pipeline DSL can
  * fingerprint rows inside typed closures without depending on the batch
  * operator registry. This is what makes near-dup dedup a STREAMING
  * operator: SimHash collapses near-identical documents (reordered /
  * repeated words, small boilerplate diffs) to the exact same 8-byte
  * key, so Spark's dropDuplicates[WithinWatermark] state store — built
  * for exact keys — performs near-dup suppression with ~16 bytes of
  * state per distinct signature. */
object SimHash {

  val Bits = 60

  def signature(text: String): Long =
    sigOver(text) { t => (Portable.jvmHash(t, "sim"), Portable.jvmHash(t, "sim2")) }

  /** Production-speed signature: identical vote topology, but the two
    * per-token hashes come from XXH64 (the engine's codegen hash family)
    * instead of the md5-derived portable hash — ~2 orders of magnitude
    * cheaper per token. Same collapse behavior, but no cross-engine
    * oracle: use [[signature]] where DuckDB must agree (registry
    * entries), this form on hot streaming paths (StreamBench's
    * stream_neardup row prices it). */
  def fastSignature(text: String): Long = {
    import org.apache.spark.unsafe.Platform
    sigOver(text) { t =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (org.apache.spark.sql.catalyst.expressions.XXH64
         .hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0x517cc1b727220a95L),
       org.apache.spark.sql.catalyst.expressions.XXH64
         .hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 0x9e3779b97f4a7c15L))
    }
  }

  private def sigOver(text: String)(hash2: String => (Long, Long)): Long = {
    val votes = new Array[Int](Bits)
    val seen = new java.util.HashSet[String]()
    text.toLowerCase(java.util.Locale.ROOT).split(" ", -1).foreach { t =>
      if (seen.add(t)) {
        val (h1, h2) = hash2(t)
        var b = 0
        while (b < Bits) {
          val src = if (b < 48) h1 else h2
          val off = if (b < 48) b else b - 48
          votes(b) += (((src >>> off) & 1L).toInt * 2 - 1)
          b += 1
        }
      }
    }
    var sig = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }
}
