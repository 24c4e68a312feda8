package graft

/** Driver benchmark surface: one JSON line of per-query wall seconds.
  * An untimed warmup pass at sf0.001 first exercises every query's
  * codegen/parquet path, so the timed pass measures the engine rather
  * than single-shot JVM/JIT/codegen initialization (first-query cold
  * penalty measured at 4-5s, warm 0.2s).
  *
  * Noise control: each query is timed over `SPARK_GRAFT_BENCH_RUNS`
  * consecutive runs (default 3) and the MEDIAN is reported — PERF.md
  * measured ±50% single-shot scatter on trivial queries, which the
  * median collapses; round-over-round deltas are meaningful at ~±15%.
  *
  * Skew instrumentation: a SparkListener records (stage, task-wall)
  * pairs; for every query the p95/p50 task-time ratio is computed
  * WITHIN the query's dominant stage (the stage with the largest total
  * task time). Within one stage every task runs the same work over one
  * partition, so the ratio isolates partition balance — the straggler
  * property that decides whether the plan survives a 1000-executor
  * 100 TB run. (Ratio across ALL of a query's tasks is meaningless:
  * it compares 1 ms scheduler/metadata tasks of cheap stages against
  * the real work and flags everything.) Queries whose ratio exceeds 2
  * are emitted in the JSON `skew` map (only offenders, to keep the
  * line inside the driver's bounded stdout tail); `max_skew` carries
  * the worst ratio observed so an all-even run is still
  * distinguishable from a missing measurement.
  */
object Bench {

  /** SPARK_GRAFT_PROFILE: re-exec this JVM with the profile's heap when
    * the current -Xmx is off by more than 25% — locally the heap IS the
    * profile's main lever (a live JVM can't resize itself), while on a
    * cluster the same profile maps to an executor pool's memory. Guarded
    * by SPARK_GRAFT_RELAUNCHED so the child never recurses.
    */
  private def relaunchForProfile(profile: GraftSession.Profile): Option[Int] = {
    if (profile.heap.isEmpty || sys.env.contains("SPARK_GRAFT_RELAUNCHED")) return None
    // in-process sbt runMain: java.class.path is just the sbt launcher
    // jar, which cannot load graft.Bench — run here (possibly on the
    // wrong heap) rather than re-exec a child that dies on CNFE
    val cpEntries = System.getProperty("java.class.path")
      .split(java.io.File.pathSeparatorChar)
    if (cpEntries.length == 1 && cpEntries(0).contains("sbt-launch")) {
      System.err.println(s"[bench] profile heap ${profile.heap} requested but the " +
        "classpath is the sbt launcher (in-process runMain) — cannot re-exec; " +
        "running on the current heap. Use a flat-classpath java invocation " +
        "(java -cp 'target/scala-2.13/classes:/opt/spark/jars/*' graft.Bench) " +
        "for profile-faithful heaps.")
      return None
    }
    val want = profile.heap.toLowerCase match {
      case h if h.endsWith("g") => h.dropRight(1).toLong << 30
      case h if h.endsWith("m") => h.dropRight(1).toLong << 20
      case h => h.toLong
    }
    val cur = Runtime.getRuntime.maxMemory
    if (math.abs(cur - want) <= want / 4) return None // close enough — run here
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filterNot(a => a.startsWith("-Xmx") || a.startsWith("-Xms"))
    val cmd = Seq(s"${System.getProperty("java.home")}/bin/java", s"-Xmx${profile.heap}") ++
      jvmArgs ++ Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")
    System.err.println(s"[bench] profile heap ${profile.heap} != current " +
      s"${cur >> 20} MB — re-exec'ing")
    val pb = new ProcessBuilder(cmd: _*).inheritIO()
    pb.environment().put("SPARK_GRAFT_RELAUNCHED", "1")
    Some(pb.start().waitFor())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    // shuffle fan-out override (default = cpus): at a larger SF the
    // per-partition working set must still fit per-task execution
    // memory — raising partitions, not heap, is the scale-correct lever
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTITIONS", "0").toInt
    val profName = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "")
    if (profName.nonEmpty) {
      val prof = GraftSession.profiles.getOrElse(profName,
        sys.error(s"unknown SPARK_GRAFT_PROFILE '$profName' " +
          s"(have: ${GraftSession.profiles.keys.mkString(", ")})"))
      // explicit lambda: `foreach(sys.exit)` auto-APPLIES the
      // default-arg method (exits immediately) instead of eta-expanding
      relaunchForProfile(prof).foreach(code => sys.exit(code))
    }
    val spark = GraftSession.local(cpus, parts, profName)
    // SPARK_GRAFT_CONF: semicolon-separated k=v session-conf overrides
    // applied LAST (experiment lever: e.g. lowering
    // spark.sql.files.maxPartitionBytes to split a coarse scan)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").map(_.trim).filter(_.nonEmpty)
      .foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
        spark.conf.set(kv.take(i), kv.drop(i + 1))
      })
    spark.sparkContext.setLogLevel("WARN")

    // (stageId, task wall ms) of successful tasks since the last clear
    val taskTimes = new scala.collection.mutable.ArrayBuffer[(Int, Long)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful)
          taskTimes.synchronized { taskTimes += ((t.stageId, t.taskInfo.duration)) }
    })

    // SPARK_GRAFT_BENCH_QUERIES narrows the run to a comma-separated
    // subset (the sf1 spot-bench path); unknown names fail fast rather
    // than silently benching nothing
    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some(qs) =>
        val picked = qs.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = picked.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty, s"unknown bench queries: ${unknown.mkString(",")}")
        picked.sorted
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    // warm on the smallest sibling sf if present, else the target data
    // itself — a missing warm dir must never silently skip the warmup
    val warmDir = sys.env.get("SPARK_GRAFT_WARM_DIR")
      .orElse(Some("/root/testdata/sf0.001").filter(p => new java.io.File(p).isDirectory))
      .getOrElse(sfDir)
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case e: Throwable => System.err.println(s"[bench-warm] $name: ${e.getMessage}") }
    }

    def pct(sorted: Vector[Long], p: Double): Long =
      if (sorted.isEmpty) 0L
      else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))

    val results = names.map { name =>
      // per-run snapshots: stage IDs are unique per run, so grouping a
      // multi-run pool by stage silently elects the run with the LARGEST
      // task times — i.e. the disk-cold first run, whose uneven page-cache
      // misses read as 2-2.6 "skew" forever after (measured at sf1: run 1
      // ratio 2.0, runs 2-5 converge to 1.2-1.5 on identical partitions).
      // Skew must ride the same noise control as the timings: measure it
      // within the run whose wall time is the median.
      // a failed run must be VISIBLE, not a fast bogus time: a crashed
      // query's wall is the time-to-crash, which would win a per-tier
      // merge over a tier where it actually completed. But one transient
      // crash (e.g. a single OOM among 5 runs) must not erase the
      // otherwise-valid medians either: failed runs are dropped from the
      // pool and the query is excluded only when failures are the
      // MAJORITY — then no median is trustworthy.
      var failures = 0
      var lastErr: Option[String] = None
      val measured = (1 to runs).flatMap { _ =>
        taskTimes.synchronized(taskTimes.clear())
        val t0 = System.nanoTime()
        val ok =
          try { SparkEntry.queries(name)(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            failures += 1
            lastErr = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
            false
          }
        val wall = (System.nanoTime() - t0) / 1e9
        // listener delivery is async; give the bus a beat to drain so this
        // run's stragglers don't pollute the next snapshot (best-effort;
        // skew is informational)
        Thread.sleep(20)
        if (ok) Some((wall, taskTimes.synchronized(taskTimes.toVector))) else None
      }.sortBy(_._1)
      lastErr.foreach(msg => System.err.println(
        s"[bench] $name: $failures/$runs runs FAILED (last: $msg)"))
      val (median, medianTasks) =
        if (failures * 2 > runs || measured.isEmpty)
          (-1.0, Vector.empty[(Int, Long)]) // sentinel: excluded from totals
        else measured(measured.length / 2)
      val byStage = medianTasks.groupBy(_._1)
      // SPARK_GRAFT_BENCH_TASKSTATS=1: stderr per-stage task profile of
      // the MEDIAN run — the attribution tool for a skew flag (is the
      // dominant stage's p95/p50 a real long-tail task, or millisecond
      // scheduling noise across a tiny stage?)
      if (sys.env.get("SPARK_GRAFT_BENCH_TASKSTATS").contains("1"))
        byStage.toSeq.sortBy(-_._2.map(_._2).sum).take(8).foreach { case (sid, ts) =>
          val s = ts.map(_._2).sorted
          System.err.println(s"[taskstats] $name stage=$sid n=${s.length} " +
            s"p50=${pct(s, 0.50)}ms p95=${pct(s, 0.95)}ms max=${s.last}ms sum=${s.sum}ms")
        }
      val (skew, suppressed) =
        if (byStage.isEmpty) (1.0, false)
        else {
          // dominant stage = where the query's work actually is; within
          // it all tasks run identical work over one partition each
          val ts = byStage.values.maxBy(_.map(_._2).sum).map(_._2).sorted
          if (ts.length < 8) (1.0, false) // too few partitions for a meaningful ratio
          // noise floor: a ratio of two scheduler-granularity numbers is
          // not data skew — the r13 ladder measured q_recursive_cte (6 ms
          // median tasks, p95==max==p50±2ms in 15 dedicated runs)
          // flapping 1.2↔3.0 across windows on one ~10 ms hiccup
          // (SPOT_r13_recursive_cte.json). Suppress only when the WHOLE
          // stage is in noise territory (p95 < 200 ms); a genuine
          // straggler over a small median stays visible via the 50 ms
          // denominator floor. At small SFs most stages sit under the
          // floor, so the gate reader must be able to tell "no skew"
          // from "check inactive": suppressed queries are COUNTED and
          // the count rides the JSON line (`skew_suppressed`).
          else if (pct(ts, 0.95) < 200L) (1.0, true)
          else (pct(ts, 0.95).toDouble / math.max(pct(ts, 0.50), 50L), false)
        }
      (name, median, skew, suppressed, lastErr)
    }

    // Millisecond precision keeps the whole line compact (~2.5KB for 100+
    // queries vs ~5.5KB at full double repr): the round-1 driver captured
    // only a bounded tail of stdout and the JSON start fell outside it
    // (BENCH_r01.json "parsed": null, tail begins mid-JSON). Locale.ROOT
    // so the decimal separator is always '.'.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def r1(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", v)
    // failed queries (median sentinel -1) are EXCLUDED from queries/total
    // and listed under "errors" — a crash must never read as a fast run
    val (bad, good) = results.partition(_._2 < 0)
    val qs = good.map { case (k, v, _, _, _) => "\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val offenders = good.filter(_._3 > 2.0)
    val skewJson = offenders.map { case (k, _, s, _, _) => "\"" + k + "\":" + r1(s) }
      .mkString("{", ",", "}")
    val maxSkew = if (good.isEmpty) 1.0 else good.map(_._3).max
    val skewSuppressed = good.count(_._4)
    // drift index: summed median of pinned, never-touched scalar-fn
    // queries. Same-box totals drift ±20% within hours (PERF.md r13 —
    // four same-tree runs rose 127.8 → 154.7 s), so raw round-over-round
    // totals are uninterpretable; dividing two benches' totals by their
    // drift_control load-normalizes them. The pin set is code frozen
    // since r4-r7 — any change to these queries invalidates the index
    // and must rotate the set (note it in PERF.md).
    val driftPins = Seq("q_string_funcs", "q_string_funcs2", "q_url_funcs",
      "q_window_lag", "q_window_moving", "q_math_funcs", "q_date_funcs",
      "q_cond_funcs", "q_array_funcs", "q_bit_funcs")
    val driftPinsPresent = good.count(r => driftPins.contains(r._1))
    val driftControl = good.filter(r => driftPins.contains(r._1)).map(_._2).sum
    val total = good.map(_._2).sum
    val profJson = if (profName.isEmpty) "" else s""","profile":"$profName""""
    val errJson = if (bad.isEmpty) ""
      else bad.map("\"" + _._1 + "\"").mkString(""","errors":[""", ",", "]")
    // the failure MESSAGE rides the JSON line too — a run whose stderr
    // was discarded (the round-8 sf100 semantic run) must never leave
    // an opaque "errors":[...] with nothing to disposition
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\r' => "\\r"; case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val errMsgJson = {
      val withMsg = bad.flatMap { case (k, _, _, _, m) => m.map(k -> _) }
      if (withMsg.isEmpty) ""
      else withMsg.map { case (k, m) => "\"" + k + "\":" + jstr(m) }
        .mkString(""","error_msgs":{""", ",", "}")
    }
    // drift_control_n guards the index: a pin that errors, is filtered
    // via SPARK_GRAFT_BENCH_QUERIES, or is renamed silently shrinks the
    // sum — cross-round normalization must compare like sums, so any
    // reader of drift_control checks n == 10 first (ADVICE r14)
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","runs":$runs,"queries":$qs,"skew":$skewJson,"max_skew":${r1(maxSkew)},"skew_suppressed":$skewSuppressed,"drift_control":${ms(driftControl)},"drift_control_n":$driftPinsPresent,"sf":"$sfDir"$profJson$errJson$errMsgJson}"""
    println(line)
    // The driver captures a BOUNDED stdout tail; the per-query map above
    // can push the total-first head out of it (every BENCH_r*.json shows
    // "parsed": null). Echo a compact TRAILER after the query map so the
    // headline numbers always survive tail truncation.
    println(s"""{"metric":"total_echo","value":${ms(total)},"unit":"sec","n":${good.size},"n_errors":${bad.size},"max_skew":${r1(maxSkew)},"skew_suppressed":$skewSuppressed,"drift_control":${ms(driftControl)},"drift_control_n":$driftPinsPresent,"runs":$runs,"sf":"$sfDir"$profJson}""")
    // the driver captures a BOUNDED stdout tail — also persist the full
    // per-query map to a file when asked (PERF.md snapshots commit it)
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      // never let the persistence step discard a completed run: the line
      // is already on stdout, so an IO failure here only loses the copy
      try {
        val path = java.nio.file.Paths.get(p)
        Option(path.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(path, line + "\n")
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"SPARK_GRAFT_BENCH_OUT write failed ($p): $e")
      }
    }
    spark.stop()
  }
}
