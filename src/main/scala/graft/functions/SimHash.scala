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

  def signature(text: String): Long = {
    // ONE digest reused across tokens (r13 sweep): the convenience
    // jvmHash(String, String) overload pays a MessageDigest provider
    // lookup PER CALL — 2T lookups per document on the streaming
    // near-dup hot path (Pipeline.nearDedupBy calls this per row).
    val md = java.security.MessageDigest.getInstance("MD5")
    sigOver(text) { t => (Portable.jvmHash(md, t, "sim"), Portable.jvmHash(md, t, "sim2")) }
  }

  /** Production-speed signature: same vote TOPOLOGY (distinct-token
    * majority vote over 60 bits — order- and multiplicity-invariant, the
    * properties SimHashConsistencySpec pins) and the same ASCII-only
    * lowercase rule as [[signature]]/[[Portable.sqlAsciiLower]] (r13:
    * formerly per-char `Character.toLowerCase`, a fourth lowercase
    * mapping), but its own hash family. Computed in ONE pass
    * over the chars with zero per-token allocation: no lowercased string
    * copy, no split() token array, no HashSet[String], no UTF-8 encode.
    * Each token folds its lowercased chars through an FNV-1a accumulator;
    * two murmur-finalized avalanches of the fold give the 48+12 vote
    * bits, and token distinctness is an open-addressed long set over the
    * fold. ~9× the throughput of the previous XXH64-over-encoded-bytes
    * form (the r6 stream_neardup bottleneck). No cross-engine oracle:
    * use [[signature]] where DuckDB must agree (registry entries), this
    * form on hot streaming paths (StreamBench's stream_neardup row
    * prices it). */
  def fastSignature(text: String): Long = {
    val votes = new Array[Int](Bits)
    // open-addressed distinct-token set over the 64-bit fold (0 = empty
    // slot; a zero fold is remapped). A 64-bit collision between two
    // distinct tokens merges their votes — vanishingly rare and harmless
    // to a similarity fingerprint.
    var table = new Array[Long](256)
    var mask = table.length - 1
    var size = 0
    def add(h0: Long): Boolean = {
      val h = if (h0 == 0L) 0x9e3779b97f4a7c15L else h0
      var i = (h ^ (h >>> 32)).toInt & mask
      while (true) {
        val cur = table(i)
        if (cur == h) return false
        if (cur == 0L) {
          table(i) = h
          size += 1
          if (size * 2 > mask) { // grow at 50% load
            val old = table
            table = new Array[Long](old.length * 2)
            mask = table.length - 1
            var j = 0
            while (j < old.length) {
              val v = old(j)
              if (v != 0L) {
                var k = (v ^ (v >>> 32)).toInt & mask
                while (table(k) != 0L) k = (k + 1) & mask
                table(k) = v
              }
              j += 1
            }
          }
          return true
        }
        i = (i + 1) & mask
      }
      false
    }
    def fmix(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^ (x >>> 33)
    }
    def vote(acc: Long): Unit = {
      if (add(acc)) {
        val h1 = fmix(acc ^ 0x517cc1b727220a95L)
        val h2 = fmix(acc ^ 0x9e3779b97f4a7c15L)
        var b = 0
        while (b < 48) { votes(b) += (((h1 >>> b) & 1L).toInt << 1) - 1; b += 1 }
        while (b < Bits) { votes(b) += (((h2 >>> (b - 48)) & 1L).toInt << 1) - 1; b += 1 }
      }
    }
    val n = text.length
    var acc = 0xcbf29ce484222325L // FNV-1a offset basis
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == ' ') {
        vote(acc)
        acc = 0xcbf29ce484222325L
      } else {
        // the one ASCII-only lowercase rule; non-ASCII passes through
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        acc = (acc ^ lc.toLong) * 0x100000001b3L
      }
      i += 1
    }
    vote(acc) // final token (split(" ", -1) semantics: empties vote too)
    var sig = 0L
    var b = 0
    while (b < Bits) { if (votes(b) > 0) sig |= 1L << b; b += 1 }
    sig
  }

  private def sigOver(text: String)(hash2: String => (Long, Long)): Long = {
    val votes = new Array[Int](Bits)
    val seen = new java.util.HashSet[String]()
    // ASCII-only lowercase — the one portable rule ([[Portable.sqlAsciiLower]]):
    // Locale.ROOT here with lower() in the SQL twins was a THREE-way
    // latent divergence on non-ASCII text (Spark lower() falls back to
    // JVM-default-locale toLowerCase; DuckDB is utf8proc; ROOT is a
    // third mapping) — under a tr-TR default locale the engines
    // disagreed on any document containing "I" plus a non-ASCII char.
    Portable.jvmAsciiLower(text).split(" ", -1).foreach { t =>
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
