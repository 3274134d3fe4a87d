package graft.streaming

import graft.SparkSpec

class SensorSourcesSpec extends SparkSpec {

  test("S1/S2 sensorBatch is deterministic (pure function of offset)") {
    val a = SensorSources.sensorBatch(spark, 1000, numPartitions = 4).collect().toSeq
    val b = SensorSources.sensorBatch(spark, 1000, numPartitions = 4).collect().toSeq
    assert(a == b)
    assert(a.map(_.id).distinct.size == 40) // 10 sensors × 4 partitions
    // temperature stays in a sane band around the 65°F base
    assert(a.forall(r => r.temperature > 20 && r.temperature < 110))
  }

  test("S1 sensorStream is a streaming dataset with the right schema") {
    val ds = SensorSources.sensorStream(spark, numPartitions = 2)
    assert(ds.isStreaming)
    assert(ds.schema.fieldNames.toSeq == Seq("id", "timestamp", "temperature"))
  }

  test("S3 smoke level stream schema + determinism of the level expression") {
    val ds = SensorSources.smokeLevelStream(spark)
    assert(ds.isStreaming)
    assert(ds.schema.fieldNames.toSeq == Seq("level", "timestamp"))
  }

  test("S4 countStream exposes the rate source's value column") {
    val ds = SensorSources.countStream(spark)
    assert(ds.isStreaming)
  }
}
