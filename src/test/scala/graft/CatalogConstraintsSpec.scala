package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Catalog, Constraints, Manifest}

/** Unit pins for the round-7 commit-protocol additions beyond what the
  * io27–io30 oracle gates exercise: catalog time travel and
  * missing-pin refusal, CHECK evaluation corner cases (UNKNOWN passes,
  * empty input, empty constraint list), and quarantine's
  * first-failed-constraint tag ordering.
  */
class CatalogConstraintsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String = {
    val d = System.getProperty("java.io.tmpdir") + s"/graft_ccs_$name"
    new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(d), true)
    d
  }

  test("catalog: time travel resolves historical pin vectors; a reader " +
      "asking for an unpinned table fails instead of falling back") {
    val base = fresh("tt")
    val (a, cat) = (s"$base/a", s"$base/cat")
    Seq(1L, 2L).toDF("k").write.parquet(s"$base/d1")
    Manifest.commit(spark, a, s"$base/d1")
    val c1 = Catalog.pin(spark, cat, Seq(a -> 1))
    Seq(3L).toDF("k").write.parquet(s"$base/d2")
    Manifest.commit(spark, a, s"$base/d2")
    Catalog.pin(spark, cat, Seq(a -> 2))
    // latest pin sees both directories, the historical pin only one
    assert(Catalog.snapshotOf(spark, cat, a).count() == 3)
    assert(Catalog.snapshotOf(spark, cat, a, Some(c1)).count() == 2)
    assert(Catalog.resolve(spark, cat) == Map(a -> 2))
    val e = intercept[IllegalArgumentException] {
      Catalog.snapshotOf(spark, cat, s"$base/other")
    }
    assert(e.getMessage.contains("does not pin"))
  }

  test("shallow clone of a merge-on-read table carries the tombstones: " +
      "the clone masks identically, and folding the clone never " +
      "touches the source") {
    import graft.io.MergeOnRead
    val base = fresh("morclone")
    val (src, cln) = (s"$base/src", s"$base/cln")
    (1L to 10L).toDF("k").write.parquet(s"$base/d1")
    Manifest.commit(spark, src, s"$base/d1")
    MergeOnRead.deleteKeys(spark, src, "k",
      Seq(3L, 7L).toDF("k"), s"$base/t1")
    Manifest.shallowClone(spark, src, cln)
    // the clone's snapshot masks exactly like the source's
    def keys(root: String) = MergeOnRead.snapshot(spark, root, "k")
      .as[Long].collect().toSet
    assert(keys(cln) == (1L to 10L).toSet -- Set(3L, 7L))
    // divergence: a further takedown on the source is invisible to the
    // clone — its pin is the version at clone time
    MergeOnRead.deleteKeys(spark, src, "k",
      Seq(9L).toDF("k"), s"$base/t2")
    assert(keys(src) == (1L to 10L).toSet -- Set(3L, 7L, 9L))
    assert(keys(cln) == (1L to 10L).toSet -- Set(3L, 7L))
    // folding the clone rewrites only CLONE-listed state; the source
    // still masks its own tombstones afterwards
    MergeOnRead.fold(spark, cln, "k", s"$base/fold")
    assert(keys(cln) == (1L to 10L).toSet -- Set(3L, 7L))
    assert(keys(src) == (1L to 10L).toSet -- Set(3L, 7L, 9L))
  }

  test("check: UNKNOWN passes, empty input and empty constraints " +
      "violate nothing, counts are per-constraint") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, null), (3L, -5L), (null, -7L))
      .toDF("id", "x")
    // x >= 0 is UNKNOWN for the null row — passes; two genuine fails
    val vs = Constraints.check(df, Seq(
      "id_not_null" -> col("id").isNotNull,
      "x_nonneg" -> (col("x") >= 0)))
    assert(vs == Seq(
      Constraints.Violation("id_not_null", 1),
      Constraints.Violation("x_nonneg", 2)))
    assert(Constraints.check(df.limit(0),
      Seq("any" -> col("id").isNotNull)).isEmpty)
    assert(Constraints.check(df, Nil).isEmpty)
  }

  test("quarantine: a row failing several constraints is tagged with " +
      "the FIRST in declaration order") {
    val base = fresh("quar")
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (null, -1L)).toDF("id", "x")
    val (v, qv) = Constraints.commitQuarantined(spark, s"$base/t",
      s"$base/q", df, s"$base/b1", s"$base/q1", Seq(
        "id_not_null" -> col("id").isNotNull,
        "x_nonneg" -> (col("x") >= 0)))
    assert(v == 1 && qv == Some(1))
    val quarantined = Manifest.snapshot(spark, s"$base/q")
      .select("violation").as[String].collect().toSeq
    assert(quarantined == Seq("id_not_null"))
    assert(Manifest.snapshot(spark, s"$base/t").count() == 1)
    // the one-pass staging directory is cleaned up either way
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$base/b1.tagged")))
    // at-least-once retry of the SAME ingest is a no-op on both tables
    val (v2, qv2) = Constraints.commitQuarantined(spark, s"$base/t",
      s"$base/q", df, s"$base/b1", s"$base/q1", Seq(
        "id_not_null" -> col("id").isNotNull,
        "x_nonneg" -> (col("x") >= 0)))
    assert(v2 == v && qv2 == qv)
    assert(Manifest.snapshot(spark, s"$base/t").count() == 1)
    assert(Manifest.snapshot(spark, s"$base/q").count() == 1)
  }

  test("timestamp time travel resolves the version committed at or " +
      "before the instant") {
    val base = fresh("asof")
    val root = s"$base/tbl"
    assert(Manifest.versionAt(spark, root,
      System.currentTimeMillis()).isEmpty)
    Seq(1L, 2L).toDF("k").write.parquet(s"$base/d1")
    Manifest.commit(spark, root, s"$base/d1")
    Thread.sleep(1100)
    val between = System.currentTimeMillis()
    Thread.sleep(1100)
    Seq(3L).toDF("k").write.parquet(s"$base/d2")
    Manifest.commit(spark, root, s"$base/d2")
    assert(Manifest.versionAt(spark, root, between) == Some(1))
    assert(Manifest.snapshotAt(spark, root, between).count() == 2)
    assert(Manifest.snapshotAt(spark, root,
      System.currentTimeMillis()).count() == 3)
    val e = intercept[IllegalArgumentException] {
      Manifest.snapshotAt(spark, root, 0L)
    }
    assert(e.getMessage.contains("no version"))
  }

  test("history distinguishes appends, replacing maintenance, and " +
      "no-op re-commits") {
    val base = fresh("hist")
    val root = s"$base/tbl"
    Seq(1L).toDF("k").write.parquet(s"$base/d1")
    Manifest.commit(spark, root, s"$base/d1")
    Seq(2L).toDF("k").write.parquet(s"$base/d2")
    Manifest.commit(spark, root, s"$base/d2")
    Seq(1L, 2L).toDF("k").write.parquet(s"$base/compacted")
    Manifest.rewrite(spark, root, Seq(s"$base/compacted"))
    val h = Manifest.history(spark, root)
    assert(h.map(_.version) == Seq(1, 2, 3))
    assert(h.map(_.kind) == Seq("append", "append", "replace"))
    assert(h(1).added == Seq(s"$base/d2") && h(1).removed.isEmpty)
    assert(h(2).added == Seq(s"$base/compacted") &&
      h(2).removed.toSet == Set(s"$base/d1", s"$base/d2"))
    assert(h.map(_.commitMs).sorted == h.map(_.commitMs),
      "commit instants must be monotone")
    assert(h(2).nDirs == 1)
  }

  test("quarantine refuses an input that already has a 'violation' " +
      "column instead of silently overwriting it") {
    val base = fresh("quarres")
    val df = Seq((1L, "user-data")).toDF("id", "violation")
    val e = intercept[IllegalArgumentException] {
      Constraints.commitQuarantined(spark, s"$base/t", s"$base/q", df,
        s"$base/b1", s"$base/q1",
        Seq("id_not_null" -> col("id").isNotNull))
    }
    assert(e.getMessage.contains("violation"))
    // nothing staged, nothing committed
    assert(Manifest.versions(spark, s"$base/t").isEmpty)
  }

  test("commitChecked retries are idempotent per directory") {
    val base = fresh("retry")
    val df = Seq((1L, 5L)).toDF("id", "x")
    val cs = Seq("id_not_null" -> col("id").isNotNull)
    val v1 = Constraints.commitChecked(spark, s"$base/t", df,
      s"$base/b1", cs)
    val v2 = Constraints.commitChecked(spark, s"$base/t", df,
      s"$base/b1", cs)
    assert(v1 == 1 && v2 == 1,
      "a replayed ingest must re-land the same directory, not append it")
    assert(Manifest.snapshot(spark, s"$base/t").count() == 1)
  }
}
