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
  *
  * Stall-proofing (the host exhibits multi-minute windows where the JVM is
  * throttled to ~1-2 cores; three rounds of bench artifacts were eaten or
  * contaminated by them):
  *   - One JSONL line is appended to `bench_progress.jsonl` (override via
  *     SPARK_GRAFT_BENCH_PROGRESS) the moment each query finishes, so a
  *     timeout (rc=124) preserves the completed prefix instead of losing
  *     the whole sweep.
  *   - A fixed control probe (q1_pricing, 1 rep, steady state ~0.3 s at
  *     sf0.1) is interleaved every `SPARK_GRAFT_BENCH_CONTROL_EVERY`
  *     (default 10) queries and logged as `{"control":true,...}` lines plus
  *     a `controls` array in the summary — a host stall window is then
  *     visible *in the artifact* (control >> steady state) instead of
  *     requiring post-hoc forensics.
  *   - SPARK_GRAFT_BENCH_RESUME=1 reloads timings for already-completed
  *     queries from the progress file and skips them, so a sweep can be
  *     sharded/resumed across stall windows (combine with
  *     SPARK_GRAFT_BENCH_ONLY for explicit shards).
  *   - Stall self-labeling (r15): the committed previous round's
  *     `bench_out.json` (read at startup, BEFORE this run overwrites it)
  *     provides per-query priors. A reading that exceeds
  *     `max(PRIOR_K × prior, prior + 2 s)` triggers an immediate control
  *     probe; if that control is inflated (> STALL_K × the sweep's min
  *     control) the host was stalling, so ONE extra rep runs (it may land
  *     after the window) and, if the follow-up control is still inflated,
  *     the row is recorded with `"suspect":true` in the JSONL plus a
  *     `"suspect":[names]` array in the summary. A slow reading with a
  *     HEALTHY control is a genuine regression and is never flagged —
  *     the flag marks measurement hazards, not code changes. (r13/r14
  *     both shipped driver artifacts with 3-10× stall-inflated rows that
  *     took judge forensics to identify; now the artifact labels itself.)
  *   - End-of-sweep rescue (r16): the r15 sweep showed the mid-sweep guard
  *     can miss a whole stall window (both reps land inside it and the
  *     follow-up control probes after it ends — ~10 rows inflated 2-7×,
  *     zero labels). So after the sweep finishes, every non-failed row
  *     whose reading still exceeds the prior threshold is re-measured ONCE,
  *     bracketed by control probes taken immediately before AND after. If
  *     both bracketing controls are healthy (≤ RESCUE_K × the sweep's min
  *     control), the clean rep replaces the reading via the usual min; a
  *     clean-but-still-slow reading is a genuine regression and stays
  *     unlabeled. If either bracket control is inflated the row is labeled
  *     `suspect`. Timings remain real full executions through the noop
  *     sink, min over reps — the rescue only adds reps, never invents
  *     numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // local-iteration filter (unset by the driver): bench only these queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val progressPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PROGRESS", "bench_progress.jsonl"))
    val controlEvery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_CONTROL_EVERY", "10").toInt.max(1)
    val resume = sys.env.get("SPARK_GRAFT_BENCH_RESUME").contains("1")

    def fmt3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // Prior completed timings (resume mode): progress lines are
    // {"q":name,"sec":s,...}; control lines are excluded from reuse.
    val qRe = """"q":"([^"]+)"""".r
    val secRe = """"sec":([0-9.]+)""".r
    val prior: Map[String, Double] =
      if (resume && java.nio.file.Files.exists(progressPath)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(progressPath).asScala.iterator
          .filterNot(l => l.contains("\"control\":true") || l.contains("\"failed\":true"))
          .flatMap { l =>
            for {
              m1 <- qRe.findFirstMatchIn(l)
              m2 <- secRe.findFirstMatchIn(l)
            } yield m1.group(1) -> m2.group(1).toDouble
          }.toMap
      } else Map.empty
    // Per-query priors from the PREVIOUS round's committed bench_out.json
    // (this run overwrites it only at the end). Used solely for stall
    // suspicion — never for reported timings.
    val stallK = sys.env.getOrElse("SPARK_GRAFT_BENCH_STALL_K", "4").toDouble
    val priorK = sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR_K", "3").toDouble
    val priorBench: Map[String, Double] = {
      val p = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR", "bench_out.json"))
      if (java.nio.file.Files.exists(p)) try {
        val s = java.nio.file.Files.readString(p)
        val qsRe = """"queries":\{([^}]*)\}""".r
        val kvRe = """"([^"]+)":([0-9.]+)""".r
        qsRe.findFirstMatchIn(s).map(_.group(1)) match {
          case Some(body) =>
            kvRe.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
          case None => Map.empty[String, Double]
        }
      } catch { case _: Throwable => Map.empty[String, Double] }
      else Map.empty[String, Double]
    }
    if (!resume)
      try java.nio.file.Files.deleteIfExists(progressPath)
      catch { case _: Throwable => () }
    // append + flush per line: a kill -9 or rc=124 loses at most the line
    // currently being written
    def appendLine(s: String): Unit =
      try java.nio.file.Files.write(progressPath,
        (s + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Throwable => System.err.println(s"[bench] progress: $e") }

    val spark = GraftSession.create("graft-bench")
    val sweepT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - sweepT0) / 1e9
    // untimed warmup: JIT, codegen compile, and first-touch of every table
    try Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }

    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def runOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
                name: String): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          // a throwing query must NOT masquerade as a fast timing — r7's
          // sweep recorded 0.5-0.8 s rows for two queries that never ran
          failed += name
          System.err.println(s"[bench] $name failed: $e")
      }
      (System.nanoTime() - t0) / 1e9
    }
    val controlFn = SparkEntry.queries.get("q1_pricing")
    val controls = scala.collection.mutable.ArrayBuffer.empty[Double]
    def probeControl(): Unit = controlFn.foreach { fn =>
      val s = runOnce(fn, "control:q1_pricing")
      controls += s
      appendLine(s"""{"q":"q1_pricing","sec":${fmt3(s)},"t":${fmt3(elapsed)},"control":true}""")
    }
    // host-stall detector: the latest control vs the sweep's fastest one
    def controlInflated: Boolean =
      controls.size >= 2 && controls.last > stallK * controls.min

    val toRun = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    var sinceControl = 0
    val suspects = scala.collection.mutable.LinkedHashSet.empty[String]
    probeControl()
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    toRun.foreach { case (name, fn) =>
      results(name) = prior.get(name) match {
        case Some(s) => s // resumed: keep prior timing, don't re-log
        case None =>
          if (sinceControl >= controlEvery) { probeControl(); sinceControl = 0 }
          sinceControl += 1
          var best = (1 to reps).map(_ => runOnce(fn, name)).min
          // stall guard: a reading far above the committed prior round's is
          // either a genuine regression or a host-stall artifact — an
          // immediate control probe disambiguates (regressions don't slow
          // q1_pricing). On a confirmed stall, one extra rep may land past
          // the window; if the follow-up control is STILL inflated, the
          // reading is recorded but self-labeled "suspect".
          val slowVsPrior = !failed.contains(name) && priorBench.get(name)
            .exists(p => best > math.max(priorK * p, p + 2.0))
          if (slowVsPrior) {
            probeControl()
            if (controlInflated) {
              best = best.min(runOnce(fn, name))
              probeControl()
              if (controlInflated &&
                  priorBench.get(name).exists(p => best > math.max(priorK * p, p + 2.0)))
                suspects += name
            }
          }
          val err = if (failed.contains(name)) ""","failed":true""" else ""
          val sus = if (suspects.contains(name)) ""","suspect":true""" else ""
          appendLine(s"""{"q":"$name","sec":${fmt3(best)},"t":${fmt3(elapsed)}$err$sus}""")
          best
      }
    }
    probeControl()

    // End-of-sweep rescue pass (see the header): re-measure every non-failed
    // row whose reading still exceeds the prior-based threshold, bracketed
    // by control probes. Accept the extra rep (usual min) only when BOTH
    // bracketing controls are healthy; otherwise label the row suspect.
    val rescueK = sys.env.getOrElse("SPARK_GRAFT_BENCH_RESCUE_K", "2").toDouble
    val needRescue = results.collect {
      case (name, s)
          if !failed.contains(name) &&
            priorBench.get(name).exists(p => s > math.max(priorK * p, p + 2.0)) =>
        name
    }.toSeq
    needRescue.foreach { name =>
      toRun.get(name).foreach { fn =>
        probeControl(); val c1 = controls.last
        val re = runOnce(fn, name)
        probeControl(); val c2 = controls.last
        if (failed.contains(name)) {
          // the rescue rep itself threw (sweep rep succeeded): keep the sweep
          // timing, drop the spurious failure mark, flag the row
          failed -= name
          suspects += name
        } else {
          val cmin = controls.min
          val healthy = c1 <= rescueK * cmin && c2 <= rescueK * cmin
          if (healthy) {
            results(name) = math.min(results(name), re)
            suspects -= name // clean reading: regression or not, it's real
          } else suspects += name
          val sus = if (suspects.contains(name)) ""","suspect":true""" else ""
          appendLine(s"""{"q":"$name","sec":${fmt3(results(name))},"t":${fmt3(elapsed)},"rescue":true$sus}""")
        }
      }
    }

    // a failed query has no timing: its wall clock (time-to-throw) must not
    // enter the headline total or the queries map — r12's sf1 artifact
    // counted a 220 s OOM as if it were a measurement. Failed names are
    // reported ONLY in the "failed" list.
    val completed = results.filterNot { case (k, _) => failed.contains(k) }
    // ~3 sig figs per timing keeps the whole line within the collector's
    // 2000-char tail window (full JSON lines at double precision overflowed
    // it and truncated the leading queries out of the round artifacts)
    val qs = completed.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    val total = if (completed.nonEmpty) completed.values.sum else 0.0
    // compact control summary only (full per-probe series is in the JSONL):
    // the metrics line must fit the collector's tail window
    val ctl0 =
      if (controls.isEmpty) """"control":null"""
      else s""""control":{"min":${fmt3(controls.min)},"max":${fmt3(controls.max)},"n":${controls.size}}"""
    val ctl1 =
      if (failed.isEmpty) ctl0
      else ctl0 + s""","failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val ctl =
      if (suspects.isEmpty) ctl1
      else ctl1 + s""","suspect":${suspects.map("\"" + _ + "\"").mkString("[", ",", "]")}"""
    val line = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":$qs,$ctl,"reps":$reps,"sf":"$sfDir"}"""
    // durable copy first — survives any stdout truncation by the collector
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] bench_out.json: $e") }
    println(line)
    spark.stop()
    // The collector keeps only the LAST ~2000 chars of stdout and parses it
    // line by line; at 120+ queries the full line is ~3.3k chars, so its
    // head (with "metric") falls out of the window and the round artifact
    // records parsed:null. The very last line must therefore be a
    // SELF-CONTAINED metrics line that fits the window: same total/control/
    // reps/sf, with "queries" trimmed to the slowest rows until it fits
    // (the full map is one line up AND in bench_out.json / the JSONL spool).
    // Budget 1800 leaves room for sbt's trailing "[success] Total time" line.
    val budget = 1800
    val last =
      if (line.length <= budget) line
      else {
        val bySlowest = completed.toSeq.sortBy(-_._2)
        val fixed = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","n_queries":${completed.size},$ctl,"reps":$reps,"sf":"$sfDir","queries":{}}"""
        var room = budget - fixed.length
        val kept = bySlowest.takeWhile { case (k, v) =>
          val entryLen = k.length + fmt3(v).length + 5 // quotes, colon, comma
          val fits = room - entryLen >= 0
          if (fits) room -= entryLen
          fits
        }
        val keptQs = kept.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
          .mkString("{", ",", "}")
        s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","n_queries":${completed.size},"queries_elided":${completed.size - kept.size},$ctl,"reps":$reps,"sf":"$sfDir","queries":$keptQs}"""
      }
    println(last)
  }
}
