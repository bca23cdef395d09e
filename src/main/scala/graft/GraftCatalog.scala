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

  /** Additionally expose every SparkEntry operator as a lazy temp view
    * named `graft_<key>`, so the complete operator inventory is reachable
    * from SQL: `SELECT * FROM graft_dedup_minhash_lsh WHERE jaccard > 0.8`.
    * Views are logical plans — nothing materializes until queried, and
    * Catalyst optimizes through them (pushdown into the operator plan). */
  def registerOperatorViews(spark: SparkSession, sfDir: String): Unit = {
    registerViews(spark, sfDir)
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, sfDir).createOrReplaceTempView(s"graft_$name")
    }
  }
}
