package graft.streaming

import graft.{SparkSpec, Tables}

/** The ack-barrier replacement (SURVEY §2a R11/R12): listeners observe
  * query completion the way the reference's callbacks counted acks. */
class ListenersSpec extends SparkSpec {

  test("ack listener counts completed writes") {
    val l = Listeners.installAck(spark)
    try {
      val before = l.succeeded.get()
      val out = tmpDir("graft_ack")
      Tables.load(spark, sf(), "nation").write.mode("overwrite").parquet(out)
      // listener callbacks are async — wait briefly
      val deadline = System.currentTimeMillis() + 10000
      while (l.succeeded.get() == before &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(l.succeeded.get() > before)
      assert(l.failed.get() === 0)
    } finally spark.listenerManager.unregister(l)
  }
}
