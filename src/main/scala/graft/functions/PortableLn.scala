package graft.functions

/** Engine-portable fixed-point natural log of a rational `a/b ≥ 1` —
  * the kernel that lets ln-bearing scores (BM25 idf, surprisals,
  * likelihood ratios) hash-check across engines WITHOUT floats: every
  * step is integer arithmetic with floor division, so any engine that
  * replays the same steps produces the same integer. The Scala fold
  * below runs driver-side over model-sized panels (query terms,
  * vocabulary buckets); [[duckLnCtes]] emits the SAME algorithm as a
  * DuckDB recursive CTE for oracle SQL, sharing these constants.
  *
  * Algorithm (classic shift-and-square binary logarithm, e.g. Knuth
  * TAOCP vol 2 / Turner "A slow-but-exact binary logarithm"):
  *   k    = floor(log2(a/b))           (≤ [[KMax]] compare-and-counts)
  *   x    = (a·2^S) div (b·2^k)        — mantissa in [2^S, 2^(S+1))
  *   20×:   y = x² div 2^S; bit = [y ≥ 2^(S+1)]; x = y div 2^bit
  *   ln_fp = ((k·2^F + frac) · LN2_FP) div 2^(F+10)  ≈ 10^6 · ln(a/b)
  *
  * The result is within ~2 units of 10^6·ln(a/b) — and BIT-EXACT
  * between implementations, which is the property the oracle gate
  * needs (floors of libm ln are not: Java Math.log and DuckDB's
  * std::log may differ in the last ulp, flipping a floor). */
object PortableLn {

  /** Mantissa scale shift: x ∈ [2^S, 2^(S+1)) keeps x² ≤ 2^62 in
    * signed-64 range on engines without transparent widening. */
  val SShift: Int = 30

  /** Fractional log2 bits extracted (result resolution 2^-20). */
  val FracBits: Int = 20

  /** floor(ln 2 · 10^6 · 2^10): converts the base-2 fixed point to
    * the 10^6-scaled natural log both sides report. The extra 2^10
    * head-room (divided back out with the frac bits below) keeps the
    * ln2-truncation error ≤ 0.04 over the whole k ≤ 40 range — a bare
    * floor(ln2·10^6) loses 0.18 per exponent unit (7+ at k ≈ 40). */
  val Ln2Fp: Long = 709782712L

  /** Final right-shift: FracBits + the 10 ln2 head-room bits. */
  val OutShift: Int = FracBits + 10

  /** Max representable exponent: a/b < 2^KMax. 50 covers probability
    * denominators up to ~10^15 (a 100-TB-corpus token count); callers
    * with wider ratios get the loud require below, not a silent wrap. */
  val KMax: Int = 50

  /** 10^6·ln(a/b) in PORTABLE fixed point (see object doc). Pure
    * BigInt — no overflow for any inputs; caller bounds magnitude. */
  def lnFp(a: BigInt, b: BigInt): Long = {
    require(b > 0 && a >= b, s"lnFp needs a/b >= 1, got $a/$b")
    require(a < (b << KMax), s"lnFp: $a/$b >= 2^$KMax")
    // overflow-free exponent probe (the SQL twin compares a div 2^j
    // >= b for the same reason): a >= b·2^j ⟺ a div 2^j >= b
    var k = 0
    while (k < KMax && (a >> (k + 1)) >= b) k += 1
    var x = (a << SShift) / (b << k)
    var frac = 0L
    val lo = BigInt(1) << SShift
    val hi = lo << 1
    var i = 0
    while (i < FracBits) {
      val y = (x * x) >> SShift
      if (y >= hi) { x = y >> 1; frac = frac * 2 + 1 }
      else { x = y; frac = frac * 2 }
      i += 1
    }
    (((k.toLong << FracBits) + frac) * Ln2Fp) >> OutShift
  }

  /** The same algorithm as DuckDB CTE text. `inCte` must expose one
    * row per key with BIGINT columns `a`, `b` (a ≥ b ≥ 1, a/b <
    * 2^KMax; a·2^S rides HUGEINT internally, so any BIGINT operands
    * are safe). Appends CTE definitions ending in
    * `outCte`(keyCols..., ln_fp) — splice into a WITH chain AFTER
    * `inCte` (caller supplies the leading/trailing commas). `prefix`
    * namespaces the two internal CTEs so one WITH chain can carry
    * SEVERAL ln instantiations (the unigram oracle runs the kernel
    * once per EM round). */
  def duckLnCtes(inCte: String, keyCols: Seq[String],
                 outCte: String, prefix: String = ""): String = {
    val ks = keyCols.mkString(", ")
    val s = 1L << SShift
    val hi = 2L * s
    val f = 1L << FracBits
    val outDiv = 1L << OutShift
    val lnK = s"${prefix}__ln_k"
    val lnIt = s"${prefix}__ln_it"
    val lnS = s"${prefix}__ln_s"
    // k = Σ_j [a div 2^j ≥ b] — floor(log2(a/b)) by KMax
    // compare-counts; the div form never overflows (b·2^j would)
    val kExpr = (1 to KMax)
      .map(j => s"CASE WHEN a // ${1L << j} >= b THEN 1 ELSE 0 END")
      .mkString(" + ")
    // x = (a·2^S) div (b·2^k) via nested floor divisions (exact:
    // ⌊⌊aS/b⌋/2^k⌋ = ⌊aS/(b·2^k)⌋); a·2^S needs HUGEINT head-room
    s"""$lnK AS (
       |  SELECT $ks, a, b, CAST($kExpr AS BIGINT) AS k FROM $inCte),
       |$lnIt AS (
       |  SELECT $ks, k,
       |    CAST(((CAST(a AS HUGEINT) * $s) // b)
       |      // (CAST(1 AS BIGINT) << k) AS BIGINT) AS x,
       |    0 AS i, CAST(0 AS BIGINT) AS frac
       |  FROM $lnK
       |  UNION ALL
       |  SELECT $ks, k,
       |    CASE WHEN y >= $hi THEN y // 2 ELSE y END,
       |    i + 1, frac * 2 + CASE WHEN y >= $hi THEN 1 ELSE 0 END
       |  FROM (SELECT $ks, k, (x * x) // $s AS y, i, frac
       |        FROM $lnIt WHERE i < $FracBits) $lnS),
       |$outCte AS (
       |  SELECT $ks, ((k * $f + frac) * $Ln2Fp) // $outDiv AS ln_fp
       |  FROM $lnIt WHERE i = $FracBits)""".stripMargin
  }
}
