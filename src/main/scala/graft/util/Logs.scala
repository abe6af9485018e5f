package graft.util

import org.apache.logging.log4j.Level
import org.apache.logging.log4j.core.config.Configurator

/** Targeted log suppression for Spark's WindowExec
  * "No Partition Defined for Window operation!" warning.
  *
  * A handful of graft operators (`StateOps.appendWithSeq`,
  * `Profile.driftBins`, checkpoint-scale id assignment in reference
  * queries) use a deliberately unpartitioned window over inputs that are
  * bounded BY DESIGN (checkpoint rows, histogram bins — dozens to a few
  * thousand rows). Spark warns on every execution of such a window because
  * it cannot know the input is bounded; at WARN log level those lines
  * flood stderr (hundreds per bench run) and have evicted the per-query
  * bench record from bounded log captures three rounds running.
  *
  * The clean fix is NOT `partitionBy(lit(0))` — Spark 4's
  * `EliminateWindowPartitions` optimizer rule strips foldable partition
  * expressions, restoring the unpartitioned window (and its warning) —
  * but to silence the one logger that emits it. A logger-specific level
  * is more specific than the root level, so this survives any
  * `sparkContext.setLogLevel(...)` the consumer picks.
  */
object Logs {
  @volatile private var quieted = false

  /** Idempotent; called by every operator that constructs a deliberate
    * bounded global window, so consumers get clean stderr even at WARN. */
  def quietGlobalWindowWarning(): Unit = if (!quieted) synchronized {
    if (!quieted) {
      Configurator.setLevel(
        "org.apache.spark.sql.execution.window", Level.ERROR)
      quieted = true
    }
  }
}
