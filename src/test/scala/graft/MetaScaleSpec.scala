package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Hard bounds on the metadata-layer scale counters, via the SAME
  * harness that generates `BENCH_META.json` ([[BenchMeta.run]]) — at a
  * small size so the suite stays fast, with the bounds that make the
  * O(delta) claims falsifiable:
  *
  *  - cold `loadSummary` parses ZERO chunks;
  *  - a cold one-partition `resolveForScan` parses ≤ 2 of the chunks
  *    and reads a fraction of the full-resolve bytes;
  *  - mirror maintenance after an append writes exactly ONE new chunk
  *    manifest and reuses every other.
  */
class MetaScaleSpec extends AnyFunSuite with Matchers {

  test("BenchMeta harness: summary/pruned-resolve/mirror counters hold their bounds") {
    val dir = Files.createTempDirectory("graft-meta-scale-")
    try {
      val r = BenchMeta.run(dir, filesPerChunk = 500, chunks = 6,
        deltaTableChunks = 4)
      // 6 chunk commits + three 100-file appends (warm, cold-state, mirror)
      r.files shouldBe 6 * 500 + 300
      r.chunks should be >= 7

      // the DECLARED-append table: predecessor + three 100-file appends
      r.files1m shouldBe 4 * 500 + 300

      // catalog-serving summary load: zero chunks parsed, zero chunk bytes
      r.coldSummaryChunksParsed shouldBe 0L
      r.coldSummaryBytes shouldBe 0L

      // one-partition cold resolve: only the overlapping chunk(s)
      r.resolveOneChunksParsed should be >= 1L
      r.resolveOneChunksParsed should be <= 2L
      r.resolveFullChunksParsed should be >= 7L
      r.resolveOneBytes.toDouble should be < r.resolveFullBytes / 3.0

      // mirror maintenance: the initial export writes every chunk once;
      // after one append it writes exactly the new chunk
      r.exportInitialChunksWritten shouldBe r.resolveFullChunksParsed
      r.exportAppendChunksWritten shouldBe 1L
      r.exportAppendChunksReused shouldBe r.exportInitialChunksWritten

      // bucket pruning over the synthetic 16-bucket layout: a point
      // predicate keeps exactly the wanted bucket's files (the part
      // index cycles 0..15 per chunk; 500 % 16 = 4, so buckets 0-3
      // hold one extra file per chunk), pure driver CPU
      val b = graft.catalog.IcebergHash.bucketOf(
        7, org.apache.spark.sql.types.IntegerType, 16)
      r.bucketPruneSurvivors shouldBe 6 * (500 / 16 + (if (b < 500 % 16) 1 else 0))

      // index probes: the driver cost of a postings/IVF lookup is the
      // chunk-pruned resolve + per-file stat skip — a probe must parse
      // only the chunks its IN predicate overlaps, never the index
      r.postingsProbeTotal shouldBe 6 * 500
      r.postingsProbeChunksParsed should be >= 1L
      r.postingsProbeChunksParsed should be <= 3L // 3 probed buckets
      r.postingsProbeSurvivors should be >= 1
      // per-file skipping inside the probed chunks: the bucket+tok
      // conjunction keeps a small fraction, never whole chunks
      r.postingsProbeSurvivors should be < r.postingsProbeTotal / 20
      r.ivfProbeTotal shouldBe 6 * 500
      r.ivfProbeChunksParsed should be <= 8L // nprobe = 8 cells
      r.ivfProbeSurvivors should be >= 1
      r.ivfProbeSurvivors should be < r.ivfProbeTotal / 20
    } finally graft.catalog.Fs.deleteRecursively(dir)
  }
}
