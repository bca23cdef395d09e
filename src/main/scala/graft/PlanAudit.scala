package graft

import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight, BuildSide}
import org.apache.spark.sql.execution.joins._

/** Join-strategy audit main: run each named query to completion (so AQE's
  * runtime re-plan — where SMJ→broadcast conversions actually happen — is
  * final) and print every join node with the LEAF RELATIONS under its
  * build side. The r13 lesson: a BroadcastHashJoin whose build side
  * derives from a corpus table (documents/events/lineitem/orders/
  * embeddings) is a latent 100 TB OOM even when small-SF stats make it
  * look cheap — `text_substr_keep` died at sf1 deserializing a
  * LongToUnsafeRowMap exactly this way. Dimension builds (nation, region,
  * supplier, part, customer at TPC-H ratios) and literal model artifacts
  * (codebooks, one-row maps) are the legitimate broadcasts.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.PlanAudit [q1,q2,...]
  * (default: every SparkEntry query). Prints one `[audit]` line per query:
  *   [audit] <name>: BHJ(build=nation.parquet) | SMJ | SHJ
  */
object PlanAudit {
  private def leaves(p: SparkPlan): Seq[String] = p match {
    case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
    case q: QueryStageExec => leaves(q.plan)
    case r: ReusedExchangeExec => leaves(r.child)
    case f: FileSourceScanExec =>
      Seq(f.relation.location.rootPaths.headOption
        .map(_.getName).getOrElse("filescan"))
    case _: LocalTableScanExec => Seq("literal")
    case _: RDDScanExec => Seq("checkpoint")
    case _: InMemoryTableScanExec => Seq("cached")
    case other =>
      val kids = other.children.flatMap(leaves)
      if (kids.isEmpty && other.innerChildren.nonEmpty)
        other.innerChildren.collect { case sp: SparkPlan => sp }.flatMap(leaves)
      else kids
  }

  private def joinLines(p: SparkPlan): Seq[String] = {
    val out = Seq.newBuilder[String]
    def side(b: BuildSide, l: SparkPlan, r: SparkPlan): String = {
      val bp = b match {
        case BuildLeft => l
        case BuildRight => r
      }
      leaves(bp).distinct.mkString("+") match { case "" => "?"; case s => s }
    }
    def walk(q: SparkPlan): Unit = {
      q match {
        case j: BroadcastHashJoinExec =>
          out += s"BHJ(build=${side(j.buildSide, j.left, j.right)})"
        case j: BroadcastNestedLoopJoinExec =>
          out += s"BNLJ(build=${side(j.buildSide, j.left, j.right)})"
        case j: ShuffledHashJoinExec =>
          out += s"SHJ(build=${side(j.buildSide, j.left, j.right)})"
        case _: SortMergeJoinExec => out += "SMJ"
        case _: CartesianProductExec => out += "CARTESIAN"
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case s: QueryStageExec => walk(s.plan); return
        case r: ReusedExchangeExec => walk(r.child); return
        case _ =>
      }
      q.children.foreach(walk)
    }
    walk(p)
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.create("graft-plan-audit")
    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"[audit] $n: UNKNOWN QUERY")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            df.write.format("noop").mode("overwrite").save()
            val js = joinLines(df.queryExecution.executedPlan)
            println(s"[audit] $n: " +
              (if (js.isEmpty) "no joins" else js.mkString(" | ")))
          } catch {
            case e: Throwable => println(s"[audit] $n: FAILED $e")
          }
      }
    }
    spark.stop()
  }
}
