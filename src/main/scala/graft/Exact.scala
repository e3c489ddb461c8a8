package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{conv, md5, round, substring}
import org.apache.spark.sql.types.DecimalType

/** Cross-engine exactness helpers (see QueryDef scaladoc).
  *
  * `dec` makes double aggregation order-independent (decimal addition is
  * exact and commutative). `decOut` is the only way a decimal may LEAVE a
  * query: the driver's compare stringifies pandas cells, and a pyarrow
  * `Decimal('x.4500000000')` never equals DuckDB's float64 `x.45` — and
  * DuckDB's decimal→double cast is NOT correctly rounded at unscaled >
  * 2^52 (measured: ~25% of values off by 1 ulp). Rounding to 4 fractional
  * digits first keeps the unscaled value < 2^52 at any realistic sum
  * magnitude, so the final decimal→double is one exact-operand division,
  * correctly rounded — bit-identical in both engines. Both engines round
  * half-away-from-zero (Spark HALF_UP, DuckDB round()); DuckDB's decimal
  * CAST, by contrast, truncates — the oracle must use round() too.
  */
object Exact {
  def dec(c: Column): Column = c.cast(DecimalType(38, 10))

  /** Final projection for any decimal aggregate: stable cross-engine
    * double. Oracle twin: `CAST(round(<dec expr>, 4) AS DOUBLE)`. */
  def decOut(c: Column): Column = round(c, 4).cast("double")

  /** Portable 60-bit hash: the first 15 hex chars of md5, as a positive
    * BIGINT. The sketch operators (minhash / simhash / sign-LSH) hang off
    * this instead of xxhash64 so the DuckDB oracle can mirror candidate
    * generation exactly: `('0x' || substr(md5(s), 1, 15))::BIGINT`.
    * 60 bits keeps the value positive in a signed 64-bit long on both
    * sides (and `% m` == pmod for positive inputs). */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Quantized log2 as an integer Column expression: q16(x) =
    * 16*(bitlen(x)-1) + ((x*16) >> (bitlen(x)-1)) - 16 — integer
    * exponent plus 4 linear mantissa bits, within 0.15 bit of
    * 16*log2(x) and never above it by more than 1/16 (pinned in
    * BloomPackSpec). DuckDB twin:
    * `((x*16) >> (length(format('{:b}', x)) - 1)) + 16*(length(format('{:b}', x)) - 1) - 16`.
    * Defined for x >= 1. Shared by the perplexity and curriculum
    * entries so the two engines can never drift on the cost law. */
  def q16(c: String): Column =
    org.apache.spark.sql.functions.expr(
      s"shiftright($c * 16, cast(length(bin($c)) as int) - 1) " +
        s"+ 16 * (length(bin($c)) - 1) - 16")

  /** Driver/executor-side md5 as lowercase hex — the JVM twin of both
    * engines' md5(VARCHAR), for decode paths that digest raw bytes
    * outside Catalyst (the video frame signatures). */
  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
}
