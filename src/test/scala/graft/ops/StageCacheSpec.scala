package graft.ops

import graft.SparkTestBase
import org.apache.spark.storage.StorageLevel

class StageCacheSpec extends SparkTestBase {
  import spark.implicits._

  test("persisted registers the stage; releaseAll unpersists and clears") {
    StageCache.releaseAll() // isolate from other suites
    val df = Seq(1, 2, 3).toDF("v")
    val p = StageCache.persisted(df)
    assert(p.count() === 3L)
    assert(StageCache.registeredCount === 1)
    assert(p.storageLevel.useMemory || p.storageLevel.useDisk)
    StageCache.releaseAll()
    assert(StageCache.registeredCount === 0)
    assert(p.storageLevel === StorageLevel.NONE)
    // released stages still recompute correctly
    assert(p.count() === 3L)
  }

  test("operators that persist internal stages register them for release") {
    StageCache.releaseAll()
    val docs = Seq((1L, "a b a b"), (2L, "a b a c"))
      .toDF("doc_id", "text")
    graft.text.Scoring.tfidfTopTerms(docs, "doc_id", "text", 2).collect()
    assert(StageCache.registeredCount >= 1,
      "tfidfTopTerms should route its tf stage through StageCache")
    StageCache.releaseAll()
    assert(StageCache.registeredCount === 0)
  }
}
