package graft

/** Benchmark main: times every SparkEntry query at the given SF and prints
  * one JSON metrics line (driver contract).
  *
  * Each query is forced through a `noop` write — unlike `count()`, which
  * lets Catalyst prune every computed column off a map-only query, the noop
  * sink evaluates the full result set, so timings measure the real work.
  *
  * Every query runs `SPARK_GRAFT_BENCH_REPS` times (default 2) and reports
  * the fastest rep: the first rep pays codegen compilation + JIT + page
  * cache for that query's tables, so a single-rep number can be several
  * times steady-state (observed up to ~10× on light queries under load);
  * the min is the reproducible figure.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // local-iteration filter (unset by the driver): bench only these queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.create("graft-bench")
    // untimed warmup: JIT, codegen compile, and first-touch of every table
    try Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      }
    // ~3 sig figs per timing keeps the whole line within the collector's
    // 2000-char tail window (full JSON lines at double precision overflowed
    // it and truncated the leading queries out of the round artifacts)
    def fmt3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs,"reps":$reps,"sf":"$sfDir"}"""
    // durable copy first — survives any stdout truncation by the collector
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] bench_out.json: $e") }
    println(line)
    spark.stop()
    // repeat as the very last stdout line: nothing (not even stop()'s log
    // tail) can push the metrics line out of a tail-capture window
    println(line)
  }
}
