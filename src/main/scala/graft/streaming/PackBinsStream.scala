package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.{Corpus, TextAnalysis}

/** Streaming no-split bin packing — the continuous-ingestion face of
  * [[graft.ops.Corpus.packBins]]: documents arriving on a stream are
  * placed whole into `(shard, bin)` slots by the same greedy next-fit
  * rule, with the per-shard fill level held in keyed state. The
  * padded-layout pipeline can therefore assign stable bin coordinates
  * AT INGESTION and write finished bins downstream as they close,
  * instead of re-packing the corpus per snapshot.
  *
  * Semantics: within a micro-batch a shard's documents are placed in
  * id order (deterministic); ACROSS batches placement follows arrival
  * order — inherent to online packing (the batch operator is the
  * order-free offline answer; for id-ordered arrival the two agree,
  * spec'd in `PackBinsStreamSpec`).
  *
  * 100 TB/day: state is ONE (bin, used) pair per shard — bounded by
  * the shard count forever, no timeout needed; per batch the work is
  * one narrow token-count map plus a groupByKey on shard (the same
  * exchange the batch operator pays). Exactly-once output coordinates
  * come from the state checkpoint: a replayed batch re-derives the
  * same placements because the state store rewinds with the batch. */
object PackBinsStream {

  /** Per-shard packer state: the open bin index and its fill. */
  case class BinState(bin: Long, used: Long, open: Boolean)

  /** One placed document: the batch operator's output row. */
  case class Placed(id: Long, shard: Long, n_tokens: Long, bin: Long)

  /** Internal row shape of the token-count projection (public: the
    * generated encoder projection cannot access a private class). */
  case class DocIn(id: Long, shard: Long, nTokens: Long)

  def apply(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      binTokens: Int): Dataset[Placed] = {
    require(nShards >= 1, s"nShards must be >= 1: $nShards")
    require(binTokens >= 1, s"binTokens must be >= 1: $binTokens")
    // same plan-time guard as the batch twin (Corpus.packBins): a
    // string id would cast to NULL longs here — crashing the
    // long-running stream mid-batch on encoder deserialization, and
    // mis-sharding any partially-numeric ids before that
    Corpus.requireNumericId(df, idCol, "PackBinsStream")
    val spark = df.sparkSession
    import spark.implicits._
    val meta = df.select(
        col(idCol).cast("long").as("id"),
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"),
        TextAnalysis.tokenCount(coalesce(col(textCol), lit("")))
          .as("nTokens"))
      .as[DocIn]
    meta.groupByKey(_.shard)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (shard: Long, docs: Iterator[DocIn], state: GroupState[BinState]) => {
          var st = state.getOption.getOrElse(BinState(-1L, 0L, open = false))
          val placed = docs.toSeq.sortBy(_.id).map { d =>
            st =
              if (!st.open || st.used + d.nTokens > binTokens)
                BinState(st.bin + 1, d.nTokens, open = true)
              else st.copy(used = st.used + d.nTokens)
            Placed(d.id, shard, d.nTokens, st.bin)
          }
          state.update(st)
          placed.iterator
        })
  }
}
