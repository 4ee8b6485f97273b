package graft
import org.apache.spark.sql.functions._
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("cc-timing")
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"### $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    docs.count()
    val repr = graft.ops.Dedup.exactDedup(docs, "doc_id", "text")
    val pairs = graft.ops.Dedup.minhashNearDups(repr, "doc_id", "text", 0.9, 16, 4, md5Basis = true)
    time("pairs only")(pairs.write.format("noop").mode("overwrite").save())
    println("### n_pairs=" + pairs.count())
    time("full pipeline (pairs + CC + collapse)") {
      graft.ops.Dedup.collapseNearDups(repr, "doc_id", pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
