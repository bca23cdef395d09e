package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface bootstrap: registers every testdata table as a temp view and
  * graft's native functions, so the whole engine is usable from plain
  * `spark.sql(...)` — `SELECT graft_dot(a.e, b.e) FROM embeddings a, ...`.
  */
object GraftCatalog {
  val TableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    TableNames.foreach(n => Tables(spark, sfDir, n).createOrReplaceTempView(n))
  }
}
