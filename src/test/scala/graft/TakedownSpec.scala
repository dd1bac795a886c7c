package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextQueries

/** Planted-corpus pin for the index-takedown path (t27): the oracle gate
  * proves Spark and DuckDB agree at sf scale; this pins the STRONGER
  * contract on a corpus built to exercise the stats-compensation edges —
  * a takedown applied to a stored index must answer exactly like a fresh
  * index built over the survivors alone. Edges planted:
  *   - a TOKEN-LESS victim (doc 3, empty text): it has no postings rows,
  *     so only the doclen table knows it existed — the compensating
  *     stats row must still decrement n_docs for it (and add 0 to tl);
  *   - a token-less survivor (doc 5): must keep counting toward n_docs
  *     on both sides;
  *   - a victim present in BOTH ingest increments' id ranges (doc 16,
  *     odd block; doc 42 even block), so tombstones hit both committed
  *     directories.
  */
class TakedownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeDocs(base: String, rows: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
  }

  test("t27: takedown answers exactly like a fresh build over survivors") {
    val vocab = ("alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon").split(" ")
    def text(seed: Int, n: Int): String =
      (0 until n).map(i => vocab((seed * 31 + i * 7) % vocab.length))
        .mkString(" ")
    val all: Seq[(Long, String)] =
      Seq(3L -> "", 5L -> "", 16L -> text(16, 12), 42L -> text(42, 9)) ++
        (0 until 60).filterNot(i => Seq(3, 5, 16, 42).contains(i))
          .map(i => i.toLong -> text(i, 6 + i % 9))
    val victims = all.map(_._1).filter(_ % 13 == 3).toSet
    assert(victims == Set(3L, 16L, 29L, 42L, 55L),
      "the planted corpus must hit the takedown predicate as designed")

    val dirAll = Files.createTempDirectory("graft-t27-all").toString
    val dirSurv = Files.createTempDirectory("graft-t27-surv").toString
    writeDocs(dirAll, all)
    writeDocs(dirSurv, all.filterNot(r => victims.contains(r._1)))

    // tmpDir must differ from any concurrent gate run against the same
    // conf default; point it inside this test's own scratch space
    val prev = spark.conf.getOption("spark.graft.tmpDir")
    spark.conf.set("spark.graft.tmpDir", dirAll + "/tmp")
    try {
      val takedown = TextQueries.queries("t27_bm25_takedown")(spark, dirAll)
        .collect().toSeq
      val fresh = TextQueries.queries("t23_bm25")(spark, dirSurv)
        .collect().toSeq
      assert(takedown == fresh,
        "a takedown through the stored index must be indistinguishable " +
          "from never having ingested the victims")
      assert(takedown.nonEmpty,
        "the parity must be over a non-trivial answer set")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.graft.tmpDir", v)
        case None => spark.conf.unset("spark.graft.tmpDir")
      }
    }
  }
}
