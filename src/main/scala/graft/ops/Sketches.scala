package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory stream summaries as typed combinable aggregates.
  *
  * The reference's only frequency statistic is a full GROUP BY; at
  * 100 TB a "which tokens are hot" question must not materialize a
  * vocabulary-sized shuffle. A Misra-Gries summary holds `k` counters
  * per partition partial (fixed size regardless of input), merges
  * associatively (pointwise sum, then subtract the (k+1)-th largest and
  * keep positives — Agarwal et al., "Mergeable Summaries", PODS'12),
  * and guarantees NO FALSE NEGATIVES for any item with true frequency
  * > N/k (N/(k+1) in the classic variant; the insert-after-reap step in
  * [[MisraGries.reduce]] trades one k of bound for better typical-case
  * retention). [[TextAnalysis.heavyHitters]] exploits exactly that: the
  * sketch nominates ≤ k candidates, an exact recount over the candidate
  * set (a semi-join, never a full-vocabulary aggregate) fixes the
  * counts — so the final answer is EXACT while the full-corpus pass
  * stays fixed-memory.
  */
object Sketches {

  /** Mutable Misra-Gries buffer. `offset` implements the classic
    * lazy-decrement trick: a miss at capacity increments `offset`
    * instead of touching every counter; an entry's true weight is
    * `stored - offset`, entries at or below zero are dead and reaped
    * amortized. Buffer rides between rows as a deserialized object
    * (TypedImperativeAggregate) and serializes only at shuffle. */
  final class MgBuffer(
      var total: Long,
      var offset: Long,
      val counters: mutable.HashMap[String, Long]) extends Serializable {
    /** Smallest stored value (lower bound); lets a capacity miss skip
      * the O(k) reap scan unless the offset has actually caught up with
      * some counter — the amortization that keeps a miss-heavy stream
      * O(1) per item instead of O(k). */
    var minStored: Long = Long.MaxValue
  }

  /** Final summary: total processed count + surviving (item, weight)
    * pairs, weight = the MG lower-bound-ish counter (undercounts by at
    * most total/k under this implementation's insert-after-reap step —
    * the classic variant's total/(k+1) does NOT hold here; never
    * overcounts by more than that either). */
  case class MgSummary(total: Long, items: Array[String], weights: Array[Long])

  /** Misra-Gries heavy-hitter summary over a String column with `k`
    * counters. Any item with true count > total/k is guaranteed
    * present in the result (the superset property the exact-recount
    * phase relies on — see the variant note on the object doc). */
  class MisraGries(k: Int)
      extends Aggregator[String, MgBuffer, MgSummary] {
    require(k > 0, "k must be positive")

    override def zero: MgBuffer =
      new MgBuffer(0L, 0L, mutable.HashMap.empty)

    private def reap(b: MgBuffer): Unit = {
      val dead = b.counters.iterator
        .filter { case (_, s) => s <= b.offset }.map(_._1).toList
      dead.foreach(b.counters.remove)
      b.minStored =
        if (b.counters.isEmpty) Long.MaxValue else b.counters.values.min
    }

    override def reduce(b: MgBuffer, item: String): MgBuffer = {
      b.total += 1
      b.counters.get(item) match {
        case Some(s) => b.counters.update(item, s + 1)
        case None =>
          if (b.counters.size < k) {
            val s = b.offset + 1
            b.counters.update(item, s)
            if (s < b.minStored) b.minStored = s
          } else {
            // decrement-all == bump the shared offset; reap (and insert
            // into a freed slot) only once it reaches the smallest
            // counter — each scan then removes ≥1 entry, so the cost
            // amortizes over the increments that built those counters
            b.offset += 1
            if (b.offset >= b.minStored) {
              reap(b)
              if (b.counters.size < k) {
                val s = b.offset + 1
                b.counters.update(item, s)
                if (s < b.minStored) b.minStored = s
              }
            }
          }
      }
      b
    }

    override def merge(a: MgBuffer, c: MgBuffer): MgBuffer = {
      // normalize both sides to true weights, sum pointwise
      val sums = mutable.HashMap.empty[String, Long]
      a.counters.foreach { case (t, s) =>
        val w = s - a.offset; if (w > 0) sums.update(t, w)
      }
      c.counters.foreach { case (t, s) =>
        val w = s - c.offset
        if (w > 0) sums.update(t, sums.getOrElse(t, 0L) + w)
      }
      val out = new MgBuffer(a.total + c.total, 0L, mutable.HashMap.empty)
      out.counters ++= Sketches.cutToK(sums, k)
      if (out.counters.nonEmpty) out.minStored = out.counters.values.min
      out
    }

    override def finish(b: MgBuffer): MgSummary = {
      val alive = b.counters.iterator
        .map { case (t, s) => (t, s - b.offset) }
        .filter(_._2 > 0)
        .toArray.sortBy { case (t, w) => (-w, t) }
      MgSummary(b.total, alive.map(_._1), alive.map(_._2))
    }

    override def bufferEncoder: Encoder[MgBuffer] = Encoders.kryo[MgBuffer]
    override def outputEncoder: Encoder[MgSummary] =
      org.apache.spark.sql.Encoders.product[MgSummary]
  }

  /** The Mergeable-Summaries reduction shared by the Aggregator's merge
    * and [[mergeSummaries]]: keep all weights when they fit `k`
    * counters, else subtract the (k+1)-th largest and keep positives. */
  private[graft] def cutToK(
      sums: scala.collection.Map[String, Long], k: Int): Map[String, Long] =
    if (sums.size <= k) sums.toMap
    else {
      val cut = sums.values.toArray.sorted(Ordering[Long].reverse)(k)
      sums.iterator.collect { case (t, w) if w > cut => t -> (w - cut) }.toMap
    }

  /** Merge two FINISHED summaries (Agarwal et al.: pointwise sum, cut
    * at the (k+1)-th largest). Associative and commutative, so batch
    * summaries can accumulate across micro-batches / days / sources in
    * any order while preserving the superset guarantee for the UNION
    * stream: any item with true total count > (a.total + c.total)/k
    * survives the merged summary ((k+1) would require the classic
    * insert-before-reap per-partial bound, which the amortized
    * insert-after-reap step trades away; heavyHitters' sizing
    * require(k > 1/minShare) is exactly the /k condition). */
  def mergeSummaries(a: MgSummary, c: MgSummary, k: Int): MgSummary = {
    val sums = mutable.HashMap.empty[String, Long]
    a.items.indices.foreach(i =>
      sums.update(a.items(i), sums.getOrElse(a.items(i), 0L) + a.weights(i)))
    c.items.indices.foreach(i =>
      sums.update(c.items(i), sums.getOrElse(c.items(i), 0L) + c.weights(i)))
    val kept = cutToK(sums, k).toArray.sortBy { case (t, w) => (-w, t) }
    MgSummary(a.total + c.total, kept.map(_._1), kept.map(_._2))
  }

  /** Run the summary over one String column of `df`; returns the single
    * [[MgSummary]]. One fixed-memory pass: k counters per partition
    * partial, one tiny merge at the driver-side final. */
  def misraGries(df: DataFrame, colName: String, k: Int): MgSummary = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(colName).cast("string")).na.drop()
      .as[String]
      .select(new MisraGries(k).toColumn.name("mg"))
      .head()
  }
}
