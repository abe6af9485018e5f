package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark SQL does not provide natively, composed from
  * relational primitives so Catalyst keeps optimizing them (SURVEY §7.4
  * decision table: compose before custom physical operators).
  */
object Joins {

  /** AS-OF join: for every left row, the single most recent right row of
    * the same key with `right.ts <= left.ts` (inclusive) — the standard
    * point-in-time lookup (latest state/price/profile as of an event).
    *
    * Spark has no asof join; the naive formulation is a range join
    * (`l.key = r.key AND r.ts <= l.ts` + a per-left top-1) whose
    * candidate set explodes quadratically per key at scale. This
    * implementation is the scalable union-window shape instead:
    *
    *   1. tag both sides and UNION them (right payload as one struct
    *      column, null on left rows);
    *   2. one hash shuffle on the key, sort by (ts, side) — right
    *      before left at equal ts, which is what makes the match
    *      inclusive;
    *   3. `last(payload, ignoreNulls)` over the running window carries
    *      the latest right payload forward to each left row.
    *
    * Cost: ONE shuffle of left+right on the key and a per-key sort —
    * no pairwise candidate blowup, skew governed by AQE like any other
    * keyed exchange. Rows with no prior right row keep a null payload
    * (left-join semantics).
    *
    * Right rows must be unique per (key, ts) — pre-aggregate otherwise
    * (ties would be resolved arbitrarily; the DuckDB ASOF JOIN oracle
    * has the same requirement).
    *
    * Output: every left column, plus each right payload column as
    * `asof_<name>`.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String): DataFrame = {
    requireFresh(left, Seq("__asof_payload", "__side", "__asof"), "asofJoin left")
    val payloadCols = right.columns.filterNot(c => c == key).toSeq
    // a right row with a null ts (or key) can never satisfy the asof
    // predicate r.ts <= l.ts — but null ts sorts FIRST in the window,
    // so its payload would be carried to every left row as a phantom
    // "prior" match (and null keys would co-partition and match each
    // other, unlike equi-join semantics); drop them from the right side
    import graft.operators.StateOps.qcol
    val rTagged = right
      .filter(qcol(ts).isNotNull && qcol(key).isNotNull)
      // qcol, not col: a name containing dots would parse as a
      // nested-field path here (the getField note below covers only the
      // UNPACKING side; packing and the key/ts refs must quote too)
      .select(qcol(key), qcol(ts),
        struct(payloadCols.map(qcol): _*).as("__asof_payload"))
      .withColumn("__side", lit(0))
    val lTagged = left.withColumn("__side", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(qcol(key))
      .orderBy(qcol(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // one projection via getField, not a withColumn-per-payload fold:
    // the fold stacked a Project (and an analysis pass) per column, and
    // col("__asof.name") would mis-parse a payload name containing
    // dots as a nested-field path where getField takes it literally
    carried.select(
      left.columns.toSeq.map(qcol) ++
        payloadCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Refuse inputs that already carry one of an operator's internal
    * column names — silently clobbering (or, worse, unionByName
    * ALIGNING a caller's same-named column into the carry logic and
    * producing phantom matches) is never acceptable; the caller
    * renames and retries. */
  private def requireFresh(df: DataFrame, names: Seq[String],
      what: String): Unit =
    names.find(df.columns.contains).foreach(c =>
      throw new IllegalArgumentException(
        s"$what: input already carries internal column `$c` — rename it " +
          "first"))

  /** Bucketed RANGE join: pair every left row with the right rows whose
    * half-open interval `[lo, hi)` contains `left.value`.
    *
    * Spark plans a bare `l.value >= r.lo AND l.value < r.hi` condition
    * as a broadcast-nested-loop (or cartesian) join — per-row interval
    * scans that collapse at scale. This is the standard bucketization
    * rewrite instead: intervals explode to the fixed-width buckets they
    * overlap, points map to their single bucket, and the join becomes an
    * EQUI-join on the bucket id (hash shuffle, AQE-governed) followed by
    * the exact interval filter. A (point, interval) pair can meet in
    * only the point's bucket, so no dedup pass is needed.
    *
    * `bucketWidth` trades shuffle fan-out (wide intervals explode to
    * `len/width` rows) against candidate precision — pick it near the
    * typical interval length. Negative values are fine (floor division
    * buckets correctly); null values/bounds drop out (no bucket).
    */
  def rangeJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    requireFresh(left, Seq("__bucket"), "rangeJoinBucketed left")
    requireFresh(right, Seq("__bucket", "__lo", "__hi"),
      "rangeJoinBucketed right")
    val lb = left
      // a non-finite point can match no finite [lo, hi) interval — and
      // under ANSI (Spark 4 default) the long cast of floor(NaN/width)
      // would kill the whole JOB instead of dropping the row. Nulls
      // drop too (they satisfy no interval predicate; pruning them
      // before the shuffle is pure savings).
      .filter(col(valueCol).isNotNull && !isnan(col(valueCol)) &&
        col(valueCol) =!= Double.PositiveInfinity &&
        col(valueCol) =!= Double.NegativeInfinity)
      .withColumn("__bucket",
        floor(col(valueCol) / bucketWidth).cast("long"))
    // Interval bounds are REFUSED per row, loudly, when non-finite OR
    // too large for the bucket-id space: +Infinity (and a "finite
    // horizon" like 1e300) would overflow the long cast under ANSI
    // (killing the whole job) or saturate into an impossible
    // sequence() without it — either way one bad row must not take
    // the pipeline down with an opaque error. Encode open intervals
    // with a REALISTIC finite horizon instead. A half-null interval
    // gets NO bucket at all (sequence(null, …) explodes to nothing) —
    // the documented "null bounds drop out", previously true only for
    // null lo. Each guard evaluates ONCE per bound via these derived
    // columns, not once per use site.
    val guard = (c: org.apache.spark.sql.Column) =>
      when(isnan(c) || c === Double.PositiveInfinity ||
        c === Double.NegativeInfinity,
        raise_error(concat(lit("rangeJoinBucketed: non-finite interval " +
          "bound "), c.cast("string"),
          lit(" — encode open intervals with a finite horizon"))))
        .when(abs(c / bucketWidth) > 4.0e18,
          raise_error(concat(lit("rangeJoinBucketed: interval bound "),
            c.cast("string"),
            lit(s" overflows the bucket-id space at bucketWidth=" +
              s"$bucketWidth — use a realistic horizon"))))
        .otherwise(c)
    val bothBounds = !(col(loCol).isNull || col(hiCol).isNull)
    val rb = right
      .withColumn("__lo", when(bothBounds, guard(col(loCol))))
      .withColumn("__hi", when(bothBounds, guard(col(hiCol))))
      .withColumn("__bucket",
        explode(sequence(
          floor(col("__lo") / bucketWidth).cast("long"),
          // hi is EXCLUSIVE: an interval ending exactly on a bucket
          // boundary does not reach into that bucket
          greatest(
            floor(col("__lo") / bucketWidth).cast("long"),
            ceil(col("__hi") / bucketWidth).cast("long") - 1L))))
      .drop("__lo", "__hi")
    lb.join(rb, Seq("__bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Blocked fuzzy self-join — typo-tolerant entity matching (the
    * entity-resolution face of dedup): candidate pairs form only inside
    * a deterministic block (shared `blockLen`-char prefix) and are
    * verified by exact Levenshtein distance ≤ `maxDist`. Returns
    * `(a_id, b_id, dist)` with `a_id < b_id`.
    *
    * The BLOCKED contract is explicit: edits inside the prefix move a
    * record to another block and the pair is not considered — that is
    * the standard blocking trade (recall for tractability) every
    * entity-resolution pipeline makes, and it is what makes the result
    * exactly reproducible in any engine.
    *
    * 100 TB: one hash shuffle on the COMPOSITE block key
    * `(prefix, length-band)`. The length band exploits
    * `levenshtein(a,b) >= |len(a) - len(b)|`: a pair whose lengths
    * differ by more than `maxDist` can never survive the distance
    * filter, so banding by `floor(len / (2·maxDist+1))` drops it from
    * the CANDIDATE set without changing the result — and it bounds the
    * hot-prefix quadratic (one shared prefix no longer forms a single
    * |block|² blob; pairs only form between near-equal lengths). The
    * `b` side explodes to the ≤2 bands reachable within ±maxDist, so a
    * qualifying pair always meets — in exactly one band, since the
    * exploded values are distinct and `a` carries a single band.
    * Verification uses the THRESHOLDED `levenshtein(l, r, maxDist)`
    * kernel, which abandons a pair's DP as soon as the running minimum
    * exceeds `maxDist` (returns -1) — O(maxDist·len) per candidate
    * instead of O(len²). */
  def fuzzyJoinBlocked(
      df: DataFrame,
      idCol: String,
      strCol: String,
      blockLen: Int,
      maxDist: Int): DataFrame = {
    require(blockLen > 0, s"blockLen must be positive: $blockLen")
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    // band width > 2·maxDist ⇒ [len−maxDist, len+maxDist] spans ≤2 bands
    val bandW = 2 * maxDist + 1
    val a = df.select(col(idCol).as("a_id"), col(strCol).as("__a"),
      substring(col(strCol), 1, blockLen).as("__blk"),
      floor(length(col(strCol)) / bandW).cast("long").as("__band"))
    val b = df.select(col(idCol).as("b_id"), col(strCol).as("__b"),
        substring(col(strCol), 1, blockLen).as("__blk"))
      .withColumn("__band", explode(array_distinct(array(
        floor((length(col("__b")) - maxDist) / bandW).cast("long"),
        floor((length(col("__b")) + maxDist) / bandW).cast("long")))))
    a.join(b, Seq("__blk", "__band"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("dist",
        levenshtein(col("__a"), col("__b"), maxDist).cast("long"))
      // thresholded kernel reports “> maxDist” as -1
      .filter(col("dist") >= 0L)
      .select(col("a_id"), col("b_id"), col("dist"))
  }
}
