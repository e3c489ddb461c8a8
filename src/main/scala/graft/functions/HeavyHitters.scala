package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator`: a bounded
  * map of at most `capacity` counters that can be merged associatively —
  * the frequency twin of the HLL sketch (`q_agg_hll_merge`).
  *
  * Guarantee (the oracle-checkable contract): after summarizing n items,
  * every item with true frequency > n / (capacity + 1) IS in the sketch,
  * and each sketch estimate undercounts by at most n / (capacity + 1).
  * So "find all items above a support threshold" needs only this
  * fixed-size state per group — at 100 TB the shuffle carries `capacity`
  * counters per partition instead of one row per distinct item, and
  * partial sketches merge losslessly w.r.t. the guarantee (merge = add
  * counters, then decrement-all by the (capacity+1)-th largest overflow,
  * the standard parallel Misra-Gries of Agarwal et al.).
  *
  * The reference has no sketches at all; this belongs to the engine's
  * scale layer, next to [[TopKAggregator]] (the exact bounded fold).
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= capacity) m
    else {
      // decrement every counter by the (capacity+1)-th largest count and
      // drop the non-positive ones — removes at least one key, preserves
      // the undercount bound. The per-element reduce path overflows by
      // exactly one, where that cut IS the minimum — skip the sort there.
      val cut =
        if (m.size == capacity + 1) m.values.min
        else m.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      m.flatMap { case (k, v) =>
        if (v - cut > 0) Some(k -> (v - cut)) else None }
    }

  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    shrink(b.updated(a, b.getOrElse(a, 0L) + 1L))
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    shrink(b2.foldLeft(b1) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v) })
  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}

/** Merge ALREADY-BUILT Misra-Gries sketches (the parallel-MG combine of
  * Agarwal et al., same `capacity`): the fold a streaming monitor runs
  * across micro-batch partial sketches, and what a 1000-executor job
  * runs across per-shard sketches shipped from ingest sites. The
  * undercount bound (<= n / (capacity + 1) over the TOTAL stream) is
  * preserved under any merge order/grouping — the batching-invariant
  * CONTRACT q_stream_heavyhitters verifies (exact counter values may
  * differ across orders; the support guarantee never does). */
class HeavyHittersMerge(capacity: Int)
    extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {
  private val hh = new HeavyHitters(capacity)
  override def zero: Map[String, Long] = Map.empty
  override def reduce(b: Map[String, Long], a: Map[String, Long]): Map[String, Long] =
    hh.merge(b, a)
  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] =
    hh.merge(b1, b2)
  override def finish(r: Map[String, Long]): Map[String, Long] = r
  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
