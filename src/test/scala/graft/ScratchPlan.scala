package graft
object ScratchPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    println("DIM " + e.select(size(col("embedding"))).distinct().collect().mkString(","))
    println("LABELS " + e.select("label").distinct().collect().map(_.get(0).toString).sorted.mkString(","))
    val ev = spark.read.parquet(s"$d/events.parquet")
    println("TYPES " + ev.select("event_type").distinct().collect().map(_.get(0)).mkString(","))
    println("PROPS " + ev.select("props").limit(3).collect().map(_.get(0)).mkString(" | "))
    println("TSRANGE " + ev.select(min("ts"), max("ts")).collect().mkString)
    println("USERS " + ev.select(countDistinct("user_id")).collect().mkString)
    spark.stop()
  }
}
