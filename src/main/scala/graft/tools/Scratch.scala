package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throwaway experiments (not part of the engine). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get("32", "scratch")
    val dir = "/root/testdata/sf0.1"

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (parts <- Seq("32", "32", "8", "4")) {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val stage = java.nio.file.Files.createTempDirectory("scr_ev")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), stage.resolve("events.parquet"))
      val schema = time(s"p=$parts schema read") {
        spark.read.parquet(s"$dir/events.parquet").schema }
      val stream = spark.readStream.schema(schema).parquet(stage.toString)
        .withColumn("ts", col("ts").cast("timestamp"))
      val agg = stream.withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("n"))
      val sink = s"scr_${parts}_${System.nanoTime()}"
      time(s"p=$parts stream run") {
        val q = agg.writeStream.format("memory").queryName(sink)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }
      time(s"p=$parts sink read") {
        spark.table(sink).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
