object OracleDump extends App {
  val sql = graft.SparkEntry.oracleSql(args(0))
  java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/oracle_one.sql"), sql)
}
