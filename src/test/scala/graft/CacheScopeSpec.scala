package graft

import org.apache.spark.storage.StorageLevel

class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    df.storageLevel != StorageLevel.NONE

  test("scoped unpersists exactly the tracked frames; outsiders survive") {
    val caller = Seq(1, 2, 3).toDF("a").persist()
    caller.count()
    val (in1, in2) = CacheScope.scoped {
      val x = CacheScope.track(Seq(4).toDF("b").persist())
      val y = CacheScope.track(Seq(5).toDF("c").persist())
      x.count(); y.count()
      assert(cached(x) && cached(y), "tracked frames are live inside the scope")
      (x, y)
    }
    assert(!cached(in1) && !cached(in2),
      "scope exit must unpersist every tracked frame")
    assert(cached(caller),
      "a frame persisted OUTSIDE the scope must survive — the clearCache fix")
    caller.unpersist()
  }

  test("same-plan re-persist is a deduped no-op — the CacheManager " +
    "warning the bench tail suppresses is benign") {
    // guard spec for the Sessions.benignWarnAllowlist CacheManager row:
    // composed pipelines persist shared sub-frames that resolve to the
    // same logical plan; Spark's CacheManager dedupes the entry (the
    // second persist only WARNs). Both handles must read from ONE cached
    // plan and a single unpersist must clear both — i.e. the warning
    // never signals double-caching or a leak.
    val a = Seq(1, 2, 3).toDF("x").filter($"x" > 1).persist()
    a.count()
    val b = Seq(1, 2, 3).toDF("x").filter($"x" > 1).persist() // same plan: WARN + no-op
    assert(cached(a) && cached(b), "both handles report the one cache entry")
    a.unpersist(blocking = true)
    assert(!cached(b),
      "one unpersist clears the shared entry — there was only ever one")
  }

  test("track without an active scope is a no-op (caller-owned cleanup)") {
    val df = CacheScope.track(Seq(1).toDF("a").persist())
    df.count()
    assert(cached(df), "no scope -> nothing may unpersist it")
    df.unpersist()
  }

  test("scopes nest: the inner scope drops only its own frames") {
    CacheScope.scoped {
      val outer = CacheScope.track(Seq(1).toDF("a").persist())
      outer.count()
      val inner = CacheScope.scoped {
        val i = CacheScope.track(Seq(2).toDF("b").persist())
        i.count()
        i
      }
      assert(!cached(inner), "inner scope cleans its own frame at exit")
      assert(cached(outer), "outer frame must outlive the inner scope")
    }
  }

  test("tracked frames unpersist even when the body throws") {
    var leaked: org.apache.spark.sql.DataFrame = null
    intercept[RuntimeException] {
      CacheScope.scoped {
        leaked = CacheScope.track(Seq(1).toDF("a").persist())
        leaked.count()
        throw new RuntimeException("boom")
      }
    }
    assert(!cached(leaked), "cleanup must run on the failure path too")
  }
}
