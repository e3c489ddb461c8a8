package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (no UDFs). All arithmetic is promoted to double
  * before accumulating, left-to-right — matching DuckDB's
  * `list_cosine_similarity(CAST(... AS DOUBLE[]), ...)` evaluation.
  */
object VectorFunctions {

  def toDoubleArr(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDoubleArr(a), toDoubleArr(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    aggregate(toDoubleArr(a), lit(0.0), (acc, v) => acc + v * v)

  /** Cosine via the native codegen'd CosineSim expression (one fused array
    * walk); `cosineHof` keeps the pure higher-order-function formulation —
    * both produce bit-identical doubles (same IEEE op sequence, asserted
    * in DedupSimilaritySpec). */
  def cosine(a: Column, b: Column): Column = CosineSim.cosineSim(a, b)

  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Deterministic pseudo-random hyperplane dot product for sign-LSH:
    * plane j's component i is Kirsch-Mitzenmacher-derived from two
    * md5-60 seeds of the plane id — (a + (i+1)*b) mod 2^60, mod 1001,
    * scaled to [-1, 1]. The seeds are literals, so Catalyst constant-folds
    * the md5s at plan time and the per-element work is pure arithmetic.
    * No stored model, reproducible on any cluster, and exactly mirrorable
    * in the DuckDB oracle (same formula; b is masked to 48 bits so
    * a + (i+1)*b provably fits a signed 64-bit long — a_max + n*b_max =
    * (2^60-1) + n*(2^48-1) < 2^63 holds for any dimension n up to 28672;
    * a 56-bit mask would overflow from dim 128 up. Beyond 28672 dims the
    * JVM would wrap consistently across eval/codegen/HOF, but DuckDB's
    * checked BIGINT arithmetic errors — the oracle bit-identity, not the
    * index, is what the bound protects). */
  def planeDot(v: Column, j: Int): Column = {
    val a = graft.Exact.h60(lit(s"plane_a_$j"))
    val b = graft.Exact.h60(lit(s"plane_b_$j")) % lit(1L << 48)
    aggregate(
      zip_with(toDoubleArr(v), sequence(lit(0), size(v) - 1),
        (x, i) => x * ((((a + (i.cast("long") + 1) * b) % lit(1L << 60))
          % 1001 - 500).cast("double") / 500.0)),
      lit(0.0), (acc, x) => acc + x)
  }

  /** sign-LSH bucket id from `bits` hyperplanes (bit j = sign(v . plane_j));
    * `seedBase` shifts the plane family so several independent hash tables
    * can be built (multi-table LSH = the recall lever). */
  def lshBucket(v: Column, bits: Int, seedBase: Int = 0): Column =
    (0 until bits).map(j => when(planeDot(v, seedBase + j) > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)

  /** One row per (table, bucket) membership: multi-table sign-LSH.
    * Candidates = rows sharing (table, bucket) in ANY of the `tables`
    * independent tables; P(candidate) = 1 - (1 - p^bits)^tables.
    * Buckets come from the native [[SrpBuckets]] pass (same plane
    * family t*bits..t*bits+bits-1 as the per-bucket HOF — bit-identical). */
  def lshTables(v: Column, bits: Int, tables: Int): Column =
    lshTableKeys(SrpBuckets.srpBuckets(v, bits, tables))

  /** Per-table bucket array (element t = table t's `bits`-bit bucket,
    * plane family t*bits..t*bits+bits-1). Compute ONCE per vector (then
    * checkpoint), so the exact-membership and probe expansions below
    * never re-derive the tables*bits plane dot products. Evaluated by
    * the native codegen [[SrpBuckets]] expression — one fused pass over
    * the vector instead of bits*tables lambda-evaluated HOF walks
    * (measured ~2.3 ms/row -> ~0.03 ms/row at 16x6); bit-identical to
    * [[lshBucketArrHof]] (same seeds, same IEEE fold — spec-asserted). */
  def lshBucketArr(v: Column, bits: Int, tables: Int): Column =
    SrpBuckets.srpBuckets(v, bits, tables)

  /** the pure higher-order-function formulation, kept as the
    * cross-check twin (the cosine/cosineHof precedent) */
  def lshBucketArrHof(v: Column, bits: Int, tables: Int): Column =
    array((0 until tables).map(t => lshBucket(v, bits, t * bits)): _*)

  /** Exact (table, bucket) membership rows from a precomputed bucket
    * array — the index side of a multi-probe join. */
  def lshTableKeys(bks: Column): Column =
    explode(transform(bks, (b, t) => struct(t.as("t"), b.as("b"))))

  /** Flip-1 multi-probe rows from a precomputed bucket array: per table,
    * the vector's own bucket plus each single-bit flip (bits+1 probes).
    * Joining probe rows against exact rows on (t, b) surfaces every pair
    * within Hamming distance 1 in ANY table — per-table hit probability
    * p^bits + bits*p^(bits-1)*(1-p) with p = 1 - theta/pi, OR-amplified
    * across tables. The probe side is the SMALL side (queries / eval
    * split): only (id, t, b) keys fan out, never the vectors. */
  def lshProbeKeys(bks: Column, bits: Int): Column =
    explode(flatten(transform(bks, (b, t) =>
      array((-1 until bits).map { f =>
        val pb = if (f < 0) b else b.bitwiseXOR(lit(1L << f))
        struct(t.as("t"), pb.as("b"))
      }: _*))))
}
