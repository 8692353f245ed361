package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round empirical profiler (guide §1.1): runs named
  * queries under Bench's exact session conf with a SparkListener
  * counting jobs / stages / tasks and summing task time, then prints
  * per query:  wall(s)  jobs  stages  tasks  taskTime(s)  sched-overhead
  * — wall far above taskTime/parallelism means the query is bound by
  * job/stage scheduling + plan latency, not compute; that's the
  * cross-cutting overhead to attack. Task counts far above data
  * parallelism mean partition-count waste.
  *
  * Usage: sbt "Test/runMain graft.tools.ProbeJobStats q04 q28b ..."
  * (empty args = all queries). SPARK_GRAFT_SF_DIR/CPUS as Bench.
  */
object ProbeJobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SessionTuning so the probe measures the session Bench measures
    // (serialized sort shuffle + tmpfs local dirs) — without it task
    // times include the bypass writer's per-partition file storm that
    // the bench session no longer pays
    val spark = graft.SessionTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1048576")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val taskNanos = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m => taskNanos.addAndGet(m.executorRunTime * 1000000L))
      }
    })
    val names = args.toSet
    val selected = graft.SparkEntry.allQueries
      .filter(q => names.isEmpty || names.contains(q.name) ||
        names.exists(n => q.name.startsWith(n)))
    // SPARK_GRAFT_SAMPLE=1: in-process poor-man's profiler — every
    // 25 ms histogram the deepest interesting frame of every executor
    // task thread; print the histogram at exit. Finds the hot method
    // without external tooling (jstack can't reliably find the forked
    // JVM under sbt's argfile classpaths).
    val sampleCounts = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    if (sys.env.get("SPARK_GRAFT_SAMPLE").contains("1")) {
      val t = new Thread(() => {
        while (true) {
          val all = Thread.getAllStackTraces
          all.forEach { (th, stack) =>
            if (th.getName.startsWith("Executor task launch") &&
                th.getState == Thread.State.RUNNABLE && stack.nonEmpty) {
              // first frame that is "ours"/sparks's logic, else the top
              val frame = stack.take(24).find { e =>
                val c = e.getClassName
                (c.startsWith("org.apache.spark.sql") || c.startsWith("graft")) &&
                  !c.contains("Executor")
              }.getOrElse(stack.head)
              val key = s"${frame.getClassName}.${frame.getMethodName}"
              sampleCounts.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong)
                .incrementAndGet()
            }
          }
          Thread.sleep(25)
        }
      })
      t.setDaemon(true); t.start()
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        println("== executor frame histogram ==")
        sampleCounts.asScala.toSeq.sortBy(-_._2.get).take(40).foreach {
          case (k, v) => println(f"${v.get}%6d $k")
        }
      }
    }
    // Bench-style warm-ups
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    def releasePins(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskT_s"}%8s ${"par"}%6s")
    var rows = List.empty[String]
    selected.foreach { q =>
      try {
        q.run(spark, sfDir).count(); releasePins() // warm-up
        // settle listener events from the warm-up before zeroing
        Thread.sleep(150)
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0)
        val t0 = System.nanoTime()
        q.run(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        releasePins()
        Thread.sleep(150)
        val tt = taskNanos.get / 1e9
        val line = f"${q.name}%-28s $wall%8.3f ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d $tt%8.3f ${tt / wall}%6.2f"
        println(line); rows ::= line
      } catch {
        case e: Throwable => println(s"${q.name} FAILED ${e.getClass.getSimpleName}")
      }
    }
    println("== sorted by wall ==")
    rows.sortBy(r => -r.split("\\s+")(1).toDouble).foreach(println)
    spark.stop()
  }
}
