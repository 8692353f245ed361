package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.{Maintenance, MergeOnRead}

/** Model-based randomized check of merge-on-read: a random interleaving
  * of appends, equality deletes, upserts, COW DML, materialization, and
  * compaction must keep the table's visible rows equal to a driver-side
  * multiset model at EVERY step. This is the test that catches
  * sequence-number bugs (deletes applying to the wrong file
  * generation) that hand-written scenarios miss. */
class MorModelSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tableRows(t: String): Seq[(Int, String)] =
    spark.table(t).collect().map(r => (r.getInt(0), r.getString(1))).toSeq

  test("random op sequences: table contents always equal the model") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.mormodel")
    (0 until 3).foreach { trial =>
      val rnd = new Random(1234L + trial)
      val t = s"lakehouse.mormodel.t$trial"
      spark.sql(s"CREATE TABLE $t (k INT, v STRING)")
      // multiset model: rows currently visible
      var model = Vector.empty[(Int, String)]
      var step = 0

      def check(): Unit = {
        val actual = tableRows(t).sorted
        val expected = model.sorted
        withClue(s"trial $trial step $step: ") { actual shouldBe expected }
      }

      (0 until 12).foreach { _ =>
        step += 1
        rnd.nextInt(6) match {
          case 0 | 1 => // append a small batch (duplicate keys allowed)
            val rows = (0 until 1 + rnd.nextInt(5))
              .map(_ => (rnd.nextInt(20), s"s$step"))
            rows.toDF("k", "v").createOrReplaceTempView("mm_src")
            spark.sql(s"INSERT INTO $t SELECT * FROM mm_src")
            model = model ++ rows
          case 2 => // merge-on-read delete of a few keys
            val keys = (0 until 1 + rnd.nextInt(3)).map(_ => rnd.nextInt(20)).distinct
            MergeOnRead.morDelete(spark, "lakehouse", Seq("mormodel"), s"t$trial",
              keys.toDF("k"))
            model = model.filterNot(r => keys.contains(r._1))
          case 3 => // merge-on-read upsert (key-unique source)
            val rows = (0 until 1 + rnd.nextInt(3))
              .map(_ => (rnd.nextInt(20), s"u$step")).distinctBy(_._1)
            MergeOnRead.morUpsert(spark, "lakehouse", Seq("mormodel"), s"t$trial",
              rows.toDF("k", "v"), Seq("k"))
            val ks = rows.map(_._1).toSet
            model = model.filterNot(r => ks.contains(r._1)) ++ rows
          case 4 => // COW SQL DELETE with a range predicate
            val lo = rnd.nextInt(20)
            spark.sql(s"DELETE FROM $t WHERE k >= $lo AND k < ${lo + 3}")
            model = model.filterNot(r => r._1 >= lo && r._1 < lo + 3)
          case 5 => // maintenance: fold deletes in / rewrite everything
            if (rnd.nextBoolean())
              MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mormodel"), s"t$trial")
            else
              Maintenance.compact(spark, "lakehouse", Seq("mormodel"), s"t$trial",
                targetFiles = 1 + rnd.nextInt(2))
        }
        check()
      }
      // end state: materialize + vacuum leave the same visible rows
      MergeOnRead.materializeDeletes(spark, "lakehouse", Seq("mormodel"), s"t$trial")
      Maintenance.vacuum(spark, "lakehouse", Seq("mormodel"), s"t$trial",
        retainVersions = 1, retentionMs = 0L)
      step += 1
      check()
      spark.sql(s"DROP TABLE $t")
    }
  }
}
