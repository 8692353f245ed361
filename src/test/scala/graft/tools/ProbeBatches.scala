package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeBatches {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    val opt = spark.sessionState.optimizer
    val m = opt.getClass.getMethods.find(_.getName == "batches").get
    val batches = m.invoke(opt).asInstanceOf[Seq[_]]
    batches.foreach { b =>
      val name = b.getClass.getMethod("name").invoke(b)
      val rules = b.getClass.getMethod("rules").invoke(b).asInstanceOf[Seq[_]]
      println(s"BATCH $name :: ${rules.map(_.getClass.getSimpleName).mkString(", ")}")
    }
    spark.stop()
  }
}
