package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.spark.sql.functions._
import graft.operators.StateOps

/** The deliberate bounded global windows (appendWithSeq, driftBins) must
  * silence WindowExec's "No Partition Defined" warning at the SOURCE —
  * consumers running at WARN level must see clean stderr (the warning
  * flooded three rounds of bench log captures).
  *
  * The assertion is on the effective logger level: after any of these
  * operators runs, `org.apache.spark.sql.execution.window` is pinned to
  * ERROR via a logger-specific log4j2 config, which is more specific than
  * (and therefore survives) the root-level WARN a consumer may set with
  * `sparkContext.setLogLevel("WARN")`.
  */
class QuietWindowLogSpec extends SparkSpec {

  test("appendWithSeq pins the WindowExec logger below WARN, surviving a consumer's WARN root level") {
    val s = spark
    import s.implicits._
    val state = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    val fresh = Seq((0L, "c"), (0L, "d")).toDF("id", "k")
    // Simulate a consumer that runs at WARN *after* the operator was built
    // once (root-level changes must not undo the specific config).
    StateOps.appendWithSeq(state, fresh, "id", Seq("k")).collect()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val eff = LogManager.getLogger(
        "org.apache.spark.sql.execution.window.WindowExec").getLevel
      assert(eff == Level.ERROR,
        s"WindowExec effective level is $eff; the no-partition warning would reach stderr at WARN")
      // And the operator still numbers rows correctly under that config.
      val out = StateOps.appendWithSeq(state, fresh, "id", Seq("k"))
        .orderBy("id").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    } finally spark.sparkContext.setLogLevel("ERROR")
  }
}
