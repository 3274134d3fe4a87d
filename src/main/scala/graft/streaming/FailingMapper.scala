package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.Dataset

/** T7 — failure injection for recovery demos (reference
  * `chapter8/util/FailingMapper.scala:34-49`, wired at
  * `chapter8/TransactionalSinkExample.scala:91`): an identity map that
  * throws once when it first sees a matching record, so a test can kill a
  * streaming query mid-batch and assert exactly-once output after a restart
  * on the same checkpoint directory.
  *
  * The armed/tripped flag is JVM-global (the reference uses a count inside
  * the operator instance; a restarted Spark query gets fresh task closures,
  * so the flag must outlive them). Only meaningful in local-mode tests —
  * which is the reference's use too.
  */
object FailingMapper {
  val tripped = new AtomicBoolean(false)

  def reset(): Unit = tripped.set(false)

  /** Identity-map `ds`, throwing the first time `shouldFail` matches. */
  def apply[T](ds: Dataset[T])(shouldFail: T => Boolean): Dataset[T] =
    ds.map { t =>
      if (shouldFail(t) && tripped.compareAndSet(false, true))
        throw new RuntimeException(s"injected failure at $t")
      t
    }(ds.encoder)
}
