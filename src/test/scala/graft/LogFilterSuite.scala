package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.impl.Log4jLogEvent
import org.apache.logging.log4j.message.SimpleMessage

/** Pins LocalSession's WindowExec log hygiene (r17, ADVICE r16 #4): the
  * known-benign "No Partition Defined" WARN repeat is DENIED by a
  * message-matched filter, while every OTHER warning from window
  * execution (e.g. spill warnings) still flows — the prior wholesale
  * ERROR raise muted those too. The bench's one-line JSON tail budget
  * (r15 verdict item 4) depends on the deny half; operational
  * observability depends on the pass half. */
class LogFilterSuite extends SparkSuite {

  private val LoggerName = "org.apache.spark.sql.execution.window"

  private def event(msg: String) = Log4jLogEvent.newBuilder()
    .setLoggerName(LoggerName)
    .setLevel(Level.WARN)
    .setMessage(new SimpleMessage(msg))
    .build()

  test("the filter denies the 'No Partition Defined' repeat and passes other window WARNs") {
    spark // force LocalSession.build (installs the filter)
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val lc = ctx.getConfiguration.getLoggerConfig(LoggerName)
    assert(lc.getName === LoggerName,
      "no dedicated logger config installed for WindowExec")
    val f = lc.getFilter
    assert(f != null, "no filter attached to the WindowExec logger config")
    import org.apache.logging.log4j.core.Filter.Result
    assert(f.filter(event(
      "No Partition Defined for Window operation! Moving all data to a " +
        "single partition, this can cause serious performance degradation."
    )) === Result.DENY)
    assert(f.filter(event(
      "Spilling data because memory threshold was reached"
    )) === Result.NEUTRAL)
  }

  test("the logger level itself stays at WARN-or-lower (nothing is muted wholesale)") {
    spark
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val lc = ctx.getConfiguration.getLoggerConfig(LoggerName)
    assert(lc.getLevel.intLevel >= Level.WARN.intLevel,
      s"WindowExec logger raised to ${lc.getLevel} — the r16 wholesale mute returned")
  }
}
