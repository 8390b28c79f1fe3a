import graft._
import org.apache.spark.sql.functions._
import graft.functions.Text
object TmpMicro {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("32")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"== $name: ${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val docs = Tables.documents(spark, d)
    time("tokens only") {
      docs.select(Text.tokens(col("text")).as("t")).write.format("noop").mode("overwrite").save()
    }
    time("shingles") {
      docs.select(Text.shingles(col("text")).as("sh")).write.format("noop").mode("overwrite").save()
    }
    time("shingles+explode") {
      docs.select(col("doc_id"), explode(Text.shingles(col("text"))).as("s")).write.format("noop").mode("overwrite").save()
    }
    time("shingles+explode+md5") {
      docs.select(col("doc_id"), explode(Text.shingles(col("text"))).as("s"))
        .select(col("doc_id"), Text.hash60(col("s"), 0).as("h")).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
