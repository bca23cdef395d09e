package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Kernels._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(s"STAGE $name rows=$n sec=${(System.nanoTime()-t0)/1e9}")
    }
    val docs0 = Tables.documents(spark, d).select(col("doc_id"), col("text"), col("lang"))
    val docs = docs0.unionAll(docs0.select((col("doc_id")+1000000L).as("doc_id"),
      concat(col("text"), lit(" zz yy")).as("text"), col("lang")))
    val sh = docs.select(col("doc_id"), explode(array_distinct(shingles3(tokens(col("text"))))).as("s"))
    time("sh")(sh.count())
    val h = sh.select(col("doc_id"), hash31(col("s")).as("h"))
    val minAggs = (0 until NumPerms).map(i => min(pmod(col("h")*permA(i)+permB(i), lit(P))).as(s"m$i"))
    val sigs = h.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail:_*)
    time("sigs-forced")(sigs.select(col("m31")).filter(col("m31") >= 0).count())
    val shA = sh.select(col("doc_id").as("doc_a"), col("s"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("s"))
    val overlaps = shA.join(shB, "s").filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    time("overlaps")(overlaps.count())
    time("full")(operators.Dedup.minhashLsh(spark, d).count())
    time("ngram")(operators.Dedup.ngramJaccard(spark, d).count())
    time("emb")(operators.Dedup.embeddingCosine(spark, d).count())
    spark.stop()
  }
}
