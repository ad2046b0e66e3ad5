package graft

import org.apache.spark.sql.functions.col

class GraftConfSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("graph driverLimit=0 forces the distributed path, same result") {
    val edges = Seq(1 -> 2, 2 -> 3, 3 -> 4, 5 -> 6).toDF("src", "dst")
    val initial = Seq(1).toDF("node")
    def run() = graft.rec.Graph.bfs(edges, initial)
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    val hybrid = run() // default: driver-side fast path
    val distributed = withConf(GraftConf.GraphDriverLimitKey, "0")(run())
    assert(distributed == hybrid && hybrid.keySet == Set(1, 2, 3, 4))
  }

  test("dedup driverLimit=0 forces distributed min-label, same clusters") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id_a", "id_b")
    def run() = graft.ext.Dedup.connectedComponents(pairs)
      .collect().map(r => r.get(0) -> r.get(1)).toMap
    val hybrid = run()
    val distributed = withConf(GraftConf.DedupDriverLimitKey, "0")(run())
    assert(distributed == hybrid)
    assert(hybrid(2L) == hybrid(3L) && hybrid(7L) == hybrid(8L))
  }

  test("catalog autoCompactEvery comes from the session conf") {
    withConf(GraftConf.AutoCompactEveryKey, "7") {
      assert(new graft.catalog.Catalog(spark).autoCompactEvery == 7)
    }
    assert(new graft.catalog.Catalog(spark).autoCompactEvery == 32)
  }

  test("ivf native-argmax threshold: conf=0 switches to CentroidArgmax") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings").df.limit(50)
    def plan() = {
      val (assigned, _) = graft.ext.Similarity.ivfAssign(emb, nCentroids = 4)
      assigned.queryExecution.analyzed.toString
    }
    assert(!plan().contains("graft_centroid_argmax")) // 4 <= 1024: fold
    withConf(GraftConf.NativeArgmaxThresholdKey, "0") {
      assert(plan().contains("graft_centroid_argmax"))
    }
  }
}
