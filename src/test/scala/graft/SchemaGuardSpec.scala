package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Manifest, SchemaGuard}

/** Append-time schema enforcement: the batch-local, immediate failure
  * that replaces read-time table-wide surprises. */
class SchemaGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(name: String): String = {
    val d = System.getProperty("java.io.tmpdir") + s"/graft_sg_$name"
    new Path(d).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(d), true)
    d
  }

  test("matching append commits; missing column, type change, and " +
      "surprise addition refuse with every problem named") {
    val base = fresh("basic")
    val root = s"$base/tbl"
    val v1 = SchemaGuard.commitAppend(spark, root,
      Seq((1L, "a")).toDF("id", "s"), s"$base/b1")
    assert(v1 == 1)
    // exact match appends fine
    assert(SchemaGuard.commitAppend(spark, root,
      Seq((2L, "b")).toDF("id", "s"), s"$base/b2") == 2)
    // missing column + type change, both reported in one failure
    val e = intercept[SchemaGuard.SchemaMismatchException] {
      SchemaGuard.commitAppend(spark, root,
        Seq(1).toDF("id"), s"$base/bad")
    }
    assert(e.problems.exists(_.contains("missing column s")))
    assert(e.problems.exists(_.contains("column id")))
    // nothing was written or committed by the refused batch
    assert(Manifest.versions(spark, root) == Seq(1, 2))
    val fs = new Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$base/bad")))
    // surprise column refuses without the explicit opt-in...
    val e2 = intercept[SchemaGuard.SchemaMismatchException] {
      SchemaGuard.commitAppend(spark, root,
        Seq((3L, "c", 1.5)).toDF("id", "s", "score"), s"$base/b3")
    }
    assert(e2.problems.exists(_.contains("allowAdd")))
    // ...and evolves the schema with it (older dirs null-fill on a
    // mergeSchema read — io13's read-side discipline)
    assert(SchemaGuard.commitAppend(spark, root,
      Seq((3L, "c", 1.5)).toDF("id", "s", "score"), s"$base/b3",
      allowAdd = true) == 3)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(Manifest.committed(spark, root): _*)
    assert(merged.columns.toSet == Set("id", "s", "score"))
    assert(merged.filter(col("score").isNull).count() == 2)
  }

  test("tighter nullability is not a mismatch; first commit defines " +
      "the schema") {
    val base = fresh("nulls")
    val root = s"$base/tbl"
    val withNulls = Seq[(java.lang.Long, String)]((1L, null))
      .toDF("id", "s")
    SchemaGuard.commitAppend(spark, root, withNulls, s"$base/b1")
    // a non-null batch of the same shape appends fine
    assert(SchemaGuard.commitAppend(spark, root,
      Seq((2L, "x")).toDF("id", "s"), s"$base/b2") == 2)
  }

  test("post-evolution enforcement is deterministic: the table schema " +
      "is the UNION across batches, not an arbitrary footer") {
    val base = fresh("evolve")
    val root = s"$base/tbl"
    SchemaGuard.commitAppend(spark, root,
      Seq((1L, "a")).toDF("id", "s"), s"$base/b1")
    SchemaGuard.commitAppend(spark, root,
      Seq((2L, "b", 1.5)).toDF("id", "s", "score"), s"$base/b2",
      allowAdd = true)
    // a batch missing the evolved column is refused — regardless of
    // which file footer a plain (non-merged) read would infer from
    val e = intercept[SchemaGuard.SchemaMismatchException] {
      SchemaGuard.commitAppend(spark, root,
        Seq((3L, "c")).toDF("id", "s"), s"$base/b3")
    }
    assert(e.problems.exists(_.contains("missing column score")))
    // and a batch carrying the union appends fine
    assert(SchemaGuard.commitAppend(spark, root,
      Seq((3L, "c", 2.0)).toDF("id", "s", "score"), s"$base/b3") == 3)
  }
}
