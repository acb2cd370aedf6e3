package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming session windows (qs12) must be batching-invariant: the
  * stateful session operator has to MERGE sessions that span micro-batch
  * boundaries (and out-of-order arrivals — round-robin file split, no
  * watermark, complete mode), landing on the same result as (a) the batch
  * `session_window` aggregation and (b) an independently-coded
  * gaps-and-islands fold over the sorted per-user event list. */
class SessionWindowSpec extends SparkSpec {

  private val GapUs = 8L * 3600 * 1000000 // 8 hours

  // deterministic inter-arrival steps in minutes: multiples of 75 in
  // [0, 900] — never exactly 480 (the 8 h boundary), both sides covered
  private def eventsFor(u: Int): Seq[(Int, Long)] = {
    var t = 1577836800000000L + u * 1000000L // 2020-01-01 + u sec
    (0 until 30).map { i =>
      t += ((i * 7 + u * 3) % 13).toLong * 75 * 60 * 1000000L
      (u, t)
    }
  }

  private def expectedSessions(rows: Seq[(Int, Long)])
      : Set[(Int, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (u, evs) =>
      val ts = evs.map(_._2).sorted
      val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
        if (t - acc.head.head >= GapUs) List(t) :: acc
        else (t :: acc.head) :: acc.tail
      }
      sessions.map(s => (u, s.min, s.max + GapUs, s.size.toLong))
    }.toSet

  test("streaming session_window == batch == independent islands fold") {
    val rows = (1 to 3).flatMap(eventsFor)
    val df = spark.createDataFrame(rows.map { case (u, t) =>
      (u, new Timestamp(t / 1000).toInstant
        .plusNanos((t % 1000) * 1000))
    }).toDF("user_id", "ts")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))

    def sessions(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(col("user_id"), session_window(col("ts"), "8 hours").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("sw.start")).as("s"),
        unix_micros(col("sw.end")).as("e"), col("n"))

    val expected = expectedSessions(rows)
    val batch = sessions(df).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(batch == expected, "batch session_window diverges from fold")

    val work = Files.createTempDirectory("graft_sess").toString
    df.repartition(4).write.mode("overwrite").parquet(s"$work/in")
    val schema = spark.read.parquet(s"$work/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$work/in")
    val q = sessions(stream).writeStream.outputMode("complete")
      .format("memory").queryName("graft_sess_spec")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("graft_sess_spec").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == expected,
      s"streaming sessions diverge: missing ${expected -- streamed}, " +
        s"extra ${streamed -- expected}")
  }
}
