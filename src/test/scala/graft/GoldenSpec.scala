package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Verbatim golden replay of the reference notebook (BASELINE.md golden
  * e2e gate): ingest the mtcars head through the reference's DDL and
  * compare `.show(truncate=False)` output character-for-character with
  * notebook cell 7 (`SELECT * ... LIMIT 10`), including the int→FLOAT
  * `am` rendering (`1.0`/`0.0`) and Spark's float formatting. */
class GoldenSpec extends AnyFunSuite with Matchers {
  private lazy val spark = TestSpark.spark

  // mtcars rows 1-10 in the reference parquet's source schema
  // (double measures, int32 am) — FIXTURES.md §1.
  private val sourceRows = Seq(
    Row("Mazda RX4", 21.0, 6, 160.0, 110, 3.9, 2.62, 16.46, 0, 1, 4, 4),
    Row("Mazda RX4 Wag", 21.0, 6, 160.0, 110, 3.9, 2.875, 17.02, 0, 1, 4, 4),
    Row("Datsun 710", 22.8, 4, 108.0, 93, 3.85, 2.32, 18.61, 1, 1, 4, 1),
    Row("Hornet 4 Drive", 21.4, 6, 258.0, 110, 3.08, 3.215, 19.44, 1, 0, 3, 1),
    Row("Hornet Sportabout", 18.7, 8, 360.0, 175, 3.15, 3.44, 17.02, 0, 0, 3, 2),
    Row("Valiant", 18.1, 6, 225.0, 105, 2.76, 3.46, 20.22, 1, 0, 3, 1),
    Row("Duster 360", 14.3, 8, 360.0, 245, 3.21, 3.57, 15.84, 0, 0, 3, 4),
    Row("Merc 240D", 24.4, 4, 146.7, 62, 3.69, 3.19, 20.0, 1, 0, 4, 2),
    Row("Merc 230", 22.8, 4, 140.8, 95, 3.92, 3.15, 22.9, 1, 0, 4, 2),
    Row("Merc 280", 19.2, 6, 167.6, 123, 3.92, 3.44, 18.3, 1, 0, 4, 4))

  /** Notebook cell 7 output, verbatim. */
  private val goldenCell7 =
    """+-----------------+----+---+-----+---+----+-----+-----+---+---+----+----+
      ||model            |mpg |cyl|disp |hp |drat|wt   |qsec |vs |am |gear|carb|
      |+-----------------+----+---+-----+---+----+-----+-----+---+---+----+----+
      ||Mazda RX4        |21.0|6  |160.0|110|3.9 |2.62 |16.46|0  |1.0|4   |4   |
      ||Mazda RX4 Wag    |21.0|6  |160.0|110|3.9 |2.875|17.02|0  |1.0|4   |4   |
      ||Datsun 710       |22.8|4  |108.0|93 |3.85|2.32 |18.61|1  |1.0|4   |1   |
      ||Hornet 4 Drive   |21.4|6  |258.0|110|3.08|3.215|19.44|1  |0.0|3   |1   |
      ||Hornet Sportabout|18.7|8  |360.0|175|3.15|3.44 |17.02|0  |0.0|3   |2   |
      ||Valiant          |18.1|6  |225.0|105|2.76|3.46 |20.22|1  |0.0|3   |1   |
      ||Duster 360       |14.3|8  |360.0|245|3.21|3.57 |15.84|0  |0.0|3   |4   |
      ||Merc 240D        |24.4|4  |146.7|62 |3.69|3.19 |20.0 |1  |0.0|4   |2   |
      ||Merc 230         |22.8|4  |140.8|95 |3.92|3.15 |22.9 |1  |0.0|4   |2   |
      ||Merc 280         |19.2|6  |167.6|123|3.92|3.44 |18.3 |1  |0.0|4   |4   |
      |+-----------------+----+---+-----+---+----+-----+-----+---+---+----+----+
      |""".stripMargin

  test("notebook cell 7 replay is verbatim-identical, including coercions") {
    val schema = StructType(Seq(
      StructField("model", StringType), StructField("mpg", DoubleType),
      StructField("cyl", IntegerType), StructField("disp", DoubleType),
      StructField("hp", IntegerType), StructField("drat", DoubleType),
      StructField("wt", DoubleType), StructField("qsec", DoubleType),
      StructField("vs", IntegerType), StructField("am", IntegerType),
      StructField("gear", IntegerType), StructField("carb", IntegerType)))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.golden_ns")
    spark.sql(s"""CREATE TABLE IF NOT EXISTS lakehouse.golden_ns.cars
      (${graft.Pipeline.mtcarsDdl})""")
    // one input partition → one data file → stable scan order, like the
    // reference's single-file ingest (README.md:551, numFiles=1)
    spark.createDataFrame(spark.sparkContext.parallelize(sourceRows, 1), schema)
      .createOrReplaceTempView("golden_cars_src")
    spark.sql("""INSERT INTO lakehouse.golden_ns.cars
      (model, mpg, cyl, disp, hp, drat, wt, qsec, vs, am, gear, carb)
      SELECT * FROM golden_cars_src""")

    val out = new ByteArrayOutputStream()
    Console.withOut(out) {
      spark.sql("SELECT * FROM lakehouse.golden_ns.cars LIMIT 10").show(truncate = false)
    }
    out.toString("UTF-8").replaceAll("\n+$", "\n") shouldBe goldenCell7
    spark.sql("DROP TABLE lakehouse.golden_ns.cars")
  }
}
