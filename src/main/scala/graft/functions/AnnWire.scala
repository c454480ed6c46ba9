package graft.functions

/** The streaming-ANN wire format (VERDICT r8 #5, second iteration): the
  * per-(query, cell) ADC probe and the per-vector code word, BIT-PACKED
  * into long arrays.
  *
  * The float64 contract shipped 257 doubles (~2 KB) per probe; float32
  * halved the bytes but kept 257 array elements — and the typed DSL
  * path pays per-ELEMENT (encoder boxing on both sides of the keyed
  * exchange), which profiling showed dominating the scoring loop's
  * ~120 integer ops. This format cuts both axes:
  *
  *  - probe payload = `[doubleBits(base), doubleBits(scale), 64 longs]`
  *    (66 elements, 528 B): the 8×32 cost tables quantized to uint16
  *    packed 4-per-long. `base = qrr + 8·lo`, `scale = (hi−lo)/65535`
  *    with lo/hi the min/max over all 256 table entries, entry
  *    `q = round((cost−lo)/scale)` — so a candidate's distance is
  *    `base + scale · Σ_m q_m`: eight 8-bit code extracts, eight
  *    uint16 extracts, seven INT adds (exact — no float association
  *    anywhere), one multiply, one add.
  *  - code word = ONE long: the 8 per-subspace code ids (1-based,
  *    ≤ [[Codes]] = 32 — the byte fields could hold 256 but ids past
  *    Codes are REJECTED at pack time, see packCodes) packed as 8 bits
  *    each, vs the 8-element array the old format shipped. Per-cell state is
  *    (id: Long, word: Long) — 16 B/vector.
  *
  * Quantization error is ≤ 8·scale/2 ≈ (hi−lo)/16 384 per distance —
  * two orders below PQ's own distortion; StreamAnnDifferentialSpec
  * pins the packed scorer bit-exactly against this object's own fold
  * over independently-packed payloads AND proves no per-cell winner
  * flips vs the float64 batch argmins.
  *
  * Everything here is deterministic integer/IEEE arithmetic — pack then
  * score gives the same bits on any JVM, which is what lets the
  * differential spec compare exactly.
  */
object AnnWire {

  val Tables = 8   // PqSub
  val Codes = 32   // PqK

  /** 8 one-based code ids (each ≤ [[Codes]]) → one long, 8 bits per
    * code. The range check is against [[Codes]], not the byte capacity
    * (ADVICE r9): [[score]] indexes the flat m·Codes+c cost table, so a
    * code id in [Codes, 256) would pass a byte-range check and silently
    * read a NEIGHBORING subspace's table entry — a PQ retune or corrupt
    * id must fail at pack time, not scramble distances. */
  def packCodes(codes: Array[Int]): Long = {
    require(codes.length == Tables, s"expected $Tables codes")
    var w = 0L
    var m = 0
    while (m < Tables) {
      val c = codes(m) - 1
      require(c >= 0 && c < Codes, s"code id out of [1, $Codes]: ${codes(m)}")
      w |= (c.toLong & 0xFFL) << (8 * m)
      m += 1
    }
    w
  }

  /** (‖q_res‖², 8×[[Codes]] concatenated cost tables) → packed probe
    * payload. `tables` is the flat [m·Codes + k] layout the float
    * contract used. */
  def packProbe(qrr: Double, tables: Array[Double]): Array[Long] = {
    require(tables.length == Tables * Codes,
      s"expected ${Tables * Codes} table entries")
    var lo = Double.PositiveInfinity
    var hi = Double.NegativeInfinity
    var i = 0
    while (i < tables.length) {
      // fail at pack time (the packCodes discipline): a NaN skips both
      // range comparisons and then quantizes via Math.round(NaN) = 0 —
      // the MINIMUM cost — so a corrupted table entry would silently
      // score its code word as the cell's nearest instead of surfacing
      // the upstream corruption
      require(!java.lang.Double.isNaN(tables(i)) && !tables(i).isInfinite,
        s"non-finite ADC cost table entry ${tables(i)} at $i")
      if (tables(i) < lo) lo = tables(i)
      if (tables(i) > hi) hi = tables(i)
      i += 1
    }
    val scale = if (hi > lo) (hi - lo) / 65535.0 else 0.0
    val base = qrr + Tables * lo
    val out = new Array[Long](2 + (Tables * Codes + 3) / 4)
    out(0) = java.lang.Double.doubleToLongBits(base)
    out(1) = java.lang.Double.doubleToLongBits(scale)
    i = 0
    while (i < tables.length) {
      val q =
        if (scale == 0.0) 0L
        else {
          val r = Math.round((tables(i) - lo) / scale)
          if (r < 0L) 0L else if (r > 65535L) 65535L else r
        }
      out(2 + (i >> 2)) |= (q & 0xFFFFL) << (16 * (i & 3))
      i += 1
    }
    out
  }

  /** Quantized ADC distance of one stored code word against a packed
    * probe — the ONLY scoring path both the streaming state computation
    * and the differential spec use. */
  def score(payload: Array[Long], word: Long): Double = {
    val base = java.lang.Double.longBitsToDouble(payload(0))
    val scale = java.lang.Double.longBitsToDouble(payload(1))
    var sum = 0
    var m = 0
    while (m < Tables) {
      val c = ((word >>> (8 * m)) & 0xFFL).toInt
      val flat = m * Codes + c
      sum += ((payload(2 + (flat >> 2)) >>> (16 * (flat & 3))) & 0xFFFFL).toInt
      m += 1
    }
    base + scale * sum
  }
}
