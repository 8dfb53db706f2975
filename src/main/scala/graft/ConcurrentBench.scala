package graft

import org.apache.spark.sql.SparkSession

/** Mixed-workload throughput bench — `runMain graft.Bench concurrent
  * [streams,...]` (default 1,4,8). Every number Bench ever recorded is a
  * SOLO query on an idle 32-core host; a 1000-executor cluster runs a
  * mixed workload, where the question is not "how fast is one query"
  * but "how much does query B steal from query A". This runs the TPC-H
  * throughput-test shape over a pinned 20-query subset: N interleaved
  * streams, each executing the full subset once in a rotated order (so
  * no two streams hit the same query — or the same input table — at the
  * same time), against one shared SparkSession (Spark's scheduler is
  * thread-safe; concurrent actions interleave at stage granularity,
  * exactly like concurrent queries on a shared cluster).
  *
  * Reported per N: the aggregate WALL for all N streams, queries/sec,
  * and `throughput_x` = (N × sum-of-solo) / wall — the speedup over
  * running the same N×20 queries serially (1.0 = concurrency bought
  * nothing; N = perfect overlap, impossible once a single query already
  * saturates the cores). The host probes from the solo bench (GC delta,
  * multi-thread memory bandwidth) are sampled around every N-run, so a
  * throughput collapse is attributable: flat bw + rising GC = heap
  * contention; collapsing bw = the memory bus, not the scheduler.
  */
object ConcurrentBench {

  /** Pinned subset — one or two per heavyweight family (multi-way join,
    * percentile selection, window suite, sketches, LSH, kNN, curation,
    * CEP, pane windows). Do not reorder: stream rotation assumes this
    * order is the unit of interleave. */
  val subset: Seq[String] = Seq(
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "q9_product_profit", "q18_large_volume", "q_percentiles",
    "q_hll_sketch", "q_window_frames", "a1_window_count_5m",
    "a2b_running_sum_salted", "w2b_sliding_dd_pane", "w3_session_window",
    "j2_asof_join", "j3_interval_join", "d_exact_dedup",
    "d_minhash_lsh_pairs", "d_curate_corpus", "e_knn_brute",
    "t_tfidf", "x8_cep_skip_past")

  def run(spark: SparkSession, sfDir: String, args: Array[String]): Unit = {
    val streams = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(1, 4, 8))
    def num(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // untimed warm-up: table scans + one full subset pass, so codegen/JIT
    // and parquet footers are paid before any timed section
    Tables.all.foreach { t =>
      try Tables.t(spark, sfDir, t).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
    }
    subset.foreach(exec)

    // solo baseline: min of two interleaved passes per query (the same
    // steady-state discipline as Bench)
    val solo = subset.map { name =>
      name -> (1 to 2).map { _ =>
        val t0 = System.nanoTime(); exec(name); (System.nanoTime() - t0) / 1e9
      }.min
    }
    val soloSum = solo.map(_._2).sum
    solo.foreach { case (n, s) => System.err.println(f"[conc] solo $n%-24s $s%7.3f s") }

    val runs = streams.map { n =>
      val gc0 = gcMs()
      val bw0 = Bench.bwGbps()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      val t0 = System.nanoTime()
      val streamSecs =
        try (0 until n).map { i =>
          pool.submit(new java.util.concurrent.Callable[Double] {
            def call(): Double = {
              val s0 = System.nanoTime()
              // rotate so streams traverse the subset out of phase
              val off = i * subset.size / math.max(1, n)
              (subset.drop(off) ++ subset.take(off)).foreach(exec)
              (System.nanoTime() - s0) / 1e9
            }
          })
        }.map(_.get())
        finally pool.shutdown()
      val wall = (System.nanoTime() - t0) / 1e9
      val bw1 = Bench.bwGbps()
      val gcDelta = gcMs() - gc0
      val qps = n * subset.size / wall
      val tput = n * soloSum / wall
      System.err.println(f"[conc] n=$n%-2d wall $wall%7.2f s  ${qps}%5.2f q/s  " +
        f"throughput_x $tput%4.2f  stream secs ${streamSecs.map(s => f"$s%.1f").mkString("/")}  " +
        f"bw $bw0%4.1f->$bw1%4.1f GB/s  gc ${gcDelta}ms")
      s"""{"n":$n,"wall":${num(wall)},"qps":${num(qps)},"throughput_x":${num(tput)},""" +
        s""""stream_sec":[${streamSecs.map(num).mkString(",")}],""" +
        s""""gc_ms":$gcDelta,"bw_gbps":[${num(bw0)},${num(bw1)}]}"""
    }
    println(s"""{"metric":"concurrent","sf":"$sfDir","subset_n":${subset.size},""" +
      s""""solo_sum":${num(soloSum)},"solo":{${solo.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",")}},""" +
      s""""runs":[${runs.mkString(",")}]}""")
    spark.stop()
  }
}
