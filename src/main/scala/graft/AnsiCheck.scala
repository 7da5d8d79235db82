package graft
object AnsiCheck {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build("4")
    println("[ansi] spark.sql.ansi.enabled=" + spark.conf.get("spark.sql.ansi.enabled"))
    println("[ansi] version=" + spark.version)
    spark.stop()
  }
}
