package graft
import org.apache.spark.sql.SparkSession
object DbgDml {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("dbg-dml").toString
    spark.conf.set("spark.sql.catalog.dbg", "graft.io.dsv2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.dbg.root", wh)
    val root = s"$wh/t"
    (0L until 100L).map(i => (i, i % 7)).toDF("id", "grp")
      .write.format("graft").save(root)
    val plan = spark.sql("EXPLAIN EXTENDED DELETE FROM dbg.t WHERE id >= 50")
      .collect()(0).getString(0)
    println("=== PLAN ===")
    println(plan)
  }
}
