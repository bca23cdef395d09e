package graft

/** Dumps `.explain("formatted")` for the named SparkEntry queries (or all)
  * to one text file per query — the plan evidence the optimization rounds
  * commit under plans/rNN/. Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> [suffix] [q1,q2,...]
  * writes <outDir>/<query><suffix>.txt (suffix e.g. "_before"/"_after").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = if (args.length > 2) args(2) else ""
    val only = if (args.length > 3) Some(args(3).split(",").toSet) else None
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.create("graft-plandump")
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val s = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(outDir.resolve(s"$name$suffix.txt"),
            s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        } catch {
          case e: Throwable => System.err.println(s"[plandump] $name failed: $e")
        }
      }
    spark.stop()
  }
}
