package graft

import org.apache.spark.sql.SparkSession

/** Session-level performance conf shared by every entry point (Bench,
  * Verify, the test session) — r19 optimization round, each line
  * carries its measured justification. Everything here is
  * environment-overridable and changes HOW work executes, never what
  * any query computes.
  */
object SessionTuning {

  /** Apply the shared tuning to a session builder.
    *
    * 1. `spark.shuffle.sort.bypassMergeThreshold=1` (guide §2.1): at
    *    ≤200 reduce partitions the default bypass writer creates one
    *    file per reduce partition per map task and concatenates them
    *    via FileChannel.map — jstack sampling showed map tasks spending
    *    whole-task CPU in mmap (32 threads serialize on the kernel mmap
    *    lock). Production-sized (>200 partition) shuffles never take
    *    the bypass path, so threshold=1 aligns local runs with the
    *    at-scale serialized sort writer: one sorted file per map task.
    *    Measured (reversed-order A/B, 6 shuffle-heavy queries, min of
    *    3): 12.54 s → 7.11 s.
    *
    * 2. `spark.local.dir=/dev/shm/...` (guide §2.1 "local disk
    *    bandwidth for shuffle files can be the tighter limit"): this
    *    sandbox's root ext4 measures ~210 µs per file create vs ~14 µs
    *    on tmpfs, and frame sampling showed FileOutputStream.open0
    *    dominating RUNNABLE executor samples — every shuffle map task
    *    creates data + index + checksum files. At production scale the
    *    local dirs are provisioned NVMe; tmpfs is the single-box
    *    stand-in. Measured (interleaved A/B, warm): the shuffle-heavy
    *    set 4.07 s → 3.72 s. An explicit `SPARK_LOCAL_DIRS` from the
    *    environment always wins (Spark reads it before
    *    `spark.local.dir`), and a host without a writable /dev/shm
    *    keeps the default.
    */
  def apply(b: SparkSession.Builder): SparkSession.Builder = {
    val b1 = b.config("spark.shuffle.sort.bypassMergeThreshold", "1")
    val shm = new java.io.File("/dev/shm")
    // capacity gate (r19 ADVICE): tmpfs is RAM — a larger-than-expected
    // shuffle (a bigger SF than the bench fixtures) filling /dev/shm
    // would fail mid-job where slow ext4 would merely crawl. Redirect
    // only when the tmpfs has comfortable headroom for the bench-scale
    // shuffles this stands in for (~4 GiB floor, >100× the sf0.1 suite's
    // shuffle footprint); anything bigger must provision SPARK_LOCAL_DIRS
    // explicitly, which always wins (Spark reads it before
    // spark.local.dir).
    val shmFloorBytes = 4L << 30
    if (!sys.env.contains("SPARK_LOCAL_DIRS") && shm.isDirectory &&
        shm.canWrite && shm.getUsableSpace >= shmFloorBytes)
      b1.config("spark.local.dir", "/dev/shm/graft-spark-local")
    else b1
  }
}
