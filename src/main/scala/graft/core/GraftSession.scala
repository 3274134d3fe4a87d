package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory — the engine's `StreamExecutionEnvironment` analog
  * (SURVEY.md §3). Local mode for tests/bench; on a cluster only
  * master/memory change, the SQL confs hold.
  */
object GraftSession {

  def builder(cores: Int = 32, appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      // spark-submit on a real cluster injects spark.master; only default
      // to local[n] when nothing did (hardcoding .master() would silently
      // turn a cluster deploy into a single-JVM run)
      .master(sys.props.getOrElse("spark.master", s"local[$cores]"))
      .appName(appName)
      // default: one shuffle partition per core (right for a single JVM);
      // the env override is the cluster-shape dry run's lever — a 256-way
      // sweep on local[8] stands in for many-task scheduling at 100x
      // (SCALING.md "cluster-shape dry run")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cores.toString))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS): read nanos as Long session-wide
      // (Tables.load rebuilds the µs ts column; see Tables.scala)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // streaming state at scale: RocksDB spills keyed state off-heap,
      // replacing the default in-memory HDFS-backed store (SURVEY §4)
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // checkpoint cadence parity with the reference's 10s checkpoints is a
      // trigger setting per query, not a session conf

  def get(cores: Int = 32): SparkSession = builder(cores).getOrCreate()
}
