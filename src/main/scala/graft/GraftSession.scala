package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-appropriate defaults used across the
  * engine. On a real cluster only master/memory change; the SQL conf
  * (AQE, partition sizing, broadcast threshold) is the tuned surface.
  */
object GraftSession {
  // SPARK_GRAFT_SHUFFLE_PARTITIONS sizes shuffles independently of
  // core count — the knob a real deployment scales WITH THE DATA
  // (default: one partition per core, right for the driver's sf0.1
  // gate; a 100× scale sweep at 32 partitions forces 40M-key hash
  // maps per task and spills — measured superlinear, see §6).
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int =
                sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS").map(_.toInt)
                  .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt))
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // events.parquet carries TIMESTAMP(NANOS); read as long once here
      // instead of mutating session conf from inside a table loader.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Long-lived sessions accumulate dereferenced shuffle files,
      // broadcasts and localCheckpoint blocks until a JVM GC lets the
      // ContextCleaner reclaim them; the 30-min default lets hours of
      // query traffic pile into executor memory first. 2 min keeps the
      // steady-state footprint flat (observed: later queries in a long
      // registry sweep degrading several-fold under the default).
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // WindowExec warns on every unpartitioned window; in this engine
    // those are all BOUNDED PANELS by convention (1-row aggregates,
    // ≤days/≤groups relations — see SURVEY §4), so the warning is
    // noise that buries real ones. Silence THIS logger only: a future
    // data-sized unpartitioned window should be caught by plan review
    // (InvariantSpec pins the join-heavy set), not by scrolling past
    // ten thousand identical lines.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
