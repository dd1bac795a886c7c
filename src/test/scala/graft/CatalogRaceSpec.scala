package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Catalog, Manifest}

/** Concurrent-writer race gate for [[Catalog.pinLatest]]: N writers
  * each publish a new version of their own table PAIR into a shared
  * catalog and race the pin step. The stabilization protocol documents
  * what it does and does not give: a vector may capture another
  * writer's publish mid-gap (first table committed, second not yet),
  * but it must never capture a CAUSALLY INVERTED cut — a writer
  * commits `a_i` before `b_i`, so any vector showing the new `b_i`
  * while still pinning the old `a_i` would be a state that never
  * existed (once `b_i`'s new version is visible, a re-read of `a_i`
  * must see its new version, so two consecutive scans can never agree
  * on the inversion). With the fail-loud change, pinLatest either
  * publishes a twice-observed-stable vector or throws — it never
  * silently publishes an unsettled one; writers retry on the refusal.
  */
class CatalogRaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("racing multi-table publishes all land; no catalog version " +
      "pins a causally inverted cut of any writer's publish") {
    val base = System.getProperty("java.io.tmpdir") + "/graft_cat_race"
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(base), true)
    val nWriters = 4
    val rounds = 3
    val cat = s"$base/cat"
    val tables = (0 until nWriters)
      .map(i => (s"$base/a$i", s"$base/b$i"))
    // seed: every table at version 1, catalog pinning the seed vector
    tables.zipWithIndex.foreach { case ((a, b), i) =>
      Seq(i.toLong).toDF("k").write.parquet(s"$base/d_a${i}_1")
      Seq(i.toLong).toDF("k").write.parquet(s"$base/d_b${i}_1")
      Manifest.commit(spark, a, s"$base/d_a${i}_1")
      Manifest.commit(spark, b, s"$base/d_b${i}_1")
    }
    val roots = tables.flatMap(t => Seq(t._1, t._2))
    Catalog.pinLatest(spark, cat, roots)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val pinned = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val threads = (0 until nWriters).map { i =>
      new Thread(() => {
        try {
          val (a, b) = tables(i)
          for (r <- 2 to rounds + 1) {
            Seq(i.toLong * 100 + r).toDF("k")
              .write.parquet(s"$base/d_a${i}_$r")
            Seq(i.toLong * 100 + r).toDF("k")
              .write.parquet(s"$base/d_b${i}_$r")
            Manifest.commit(spark, a, s"$base/d_a${i}_$r")
            Manifest.commit(spark, b, s"$base/d_b${i}_$r")
            // the fail-loud contract: retry the pin while peers are
            // mid-publish rather than accept a torn vector
            var done = false
            var attempts = 0
            while (!done) {
              try { pinned.add(Catalog.pinLatest(spark, cat, roots))
                done = true }
              catch { case e: IllegalArgumentException
                  if e.getMessage.contains("stabilization") =>
                attempts += 1
                if (attempts > 50) throw e
              }
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty,
      s"writer failed: ${Option(errors.peek()).map(_.toString)}")
    assert(pinned.size == nWriters * rounds, "every pin must land")
    // every writer's final versions are pinned by the latest vector
    val latest = Catalog.resolve(spark, cat)
    tables.foreach { case (a, b) =>
      assert(latest(a) == rounds + 1 && latest(b) == rounds + 1)
    }
    // no vector in the whole history inverts any writer's commit order
    // (b_i ahead of a_i), and none pins a version beyond the tables'
    // committed history
    val hist = Catalog.history(spark, cat)
    // idempotent pins may REUSE a version (same vector observed by two
    // writers burns one catalog version), so history can be smaller
    // than the pin count — but every returned version must exist
    val histVersions = hist.map(_._1).toSet
    pinned.forEach(v => assert(histVersions.contains(v),
      s"pinLatest returned $v which is not a catalog version"))
    hist.foreach { case (cv, vec) =>
      tables.foreach { case (a, b) =>
        assert(vec(b) <= vec(a),
          s"catalog@$cv pins inverted cut ($a@${vec(a)}, $b@${vec(b)})")
        assert(vec(a) <= rounds + 1 && vec(b) >= 1)
      }
    }
  }
}
