package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.operators.TextAnalysis

/** The reference's three example applications re-expressed on the engine
  * (SURVEY §2.5 A3-A8) — they double as acceptance apps.
  */

/** word-count (`/root/reference/examples/word-count/word_count.go`):
  * text → n-grams → running per-ngram counts. The in-txn aggregate cache
  * + RocksDB fold (A3/A9) is exactly Spark's partial hash aggregation +
  * streaming aggregation state; the point/prefix query API (A4) is a
  * filter over the materialized counts.
  */
object WordCountApp {
  def ngramCounts(docs: DataFrame, n: Int, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(textCol).cast("string")).as[String]
      .flatMap(TextAnalysis.ngramIterator(_, n))
      .toDF("n_gram")
      .groupBy("n_gram").agg(count(lit(1)).as("cnt"))
  }

  /** A4's prefix query over the materialized counts table. */
  def prefixQuery(counts: DataFrame, prefix: String): DataFrame =
    counts.filter(col("n_gram").startsWith(prefix))
}

/** stream-sum (`/root/reference/examples/stream-sum/stream_sum.go:76-112`):
  * per-stream running CRC64-ECMA folds; a chunk with empty data finalizes
  * the stream and emits its Sum. Self-verifying: the expected sum equals
  * the one-shot CRC of the concatenated chunk data.
  */
object StreamSumApp {
  case class Chunk(id: String, seqNo: Int, data: Array[Byte])
  case class Sum(id: String, seqNo: Int, value: Long)

  /** Mirrors stream_sum.go Update: sequential SeqNo, running CRC. */
  def update(s: Sum, c: Chunk): Sum = {
    require(c.seqNo == s.seqNo + 1, s"invalid SeqNo (${c.seqNo}; expected ${s.seqNo + 1})")
    Sum(s.id, c.seqNo, Hashes.crc64Update(s.value, c.data))
  }

  /** Fold chunks per stream; emit the final Sum at the empty chunk.
    * Works over batch or streaming Datasets via ConsumerApp.
    */
  def sums(chunks: Dataset[Chunk]): Dataset[Sum] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    ConsumerApp.keyedStateful[Chunk, String, Sum, Sum](
      chunks, _.id, Sum(null, 0, 0L)) { (id, batch, st) =>
      var s = if (st.id == null) st.copy(id = id) else st
      val out = Vector.newBuilder[Sum]
      batch.sortBy(_.seqNo).foreach { c =>
        // EVERY chunk routes through update — the reference's Update
        // validates SeqNo continuity on the finalizing empty chunk too
        // (stream_sum.go), so a chunk lost right before the terminator
        // errors instead of emitting a silently wrong Sum. CRC64 over
        // empty data leaves the value unchanged.
        s = update(s, c)
        if (c.data.isEmpty) out += s
      }
      (s, out.result())
    }
  }
}

/** bike-share (`/root/reference/examples/bike-share/sql_statements.go`):
  * bounded last-N ride retention per bike (A6) and graph-cycle detection
  * over that history (A7). The reference walks rides backward with a
  * recursive CTE; here the ≤N in-state rides are walked with a plain
  * loop inside the keyed state function — equivalent and simpler than
  * SQL recursion.
  */
object BikeShareApp {
  case class Ride(bike: Long, beginStation: Long, endStation: Long, t: Long)
  case class Cycle(bike: Long, t: Long, length: Int, stations: Seq[Long])
  case class History(rides: List[Ride]) // newest first, bounded

  val Retain = 20

  /** Walk backward from the newest ride along the chain where each prior
    * ride's end station is the next ride's begin station (the CTE's join
    * condition, sql_statements.go:73-87); report a cycle when the walk
    * returns to the newest ride's end station with length >= minLen.
    */
  def detectCycle(history: List[Ride], minLen: Int): Option[Cycle] =
    history match {
      case Nil => None
      case newest :: _ =>
        var path = List(newest)
        var found: Option[Cycle] = None
        var continue = true
        while (continue && found.isEmpty && path.length < Retain) {
          val cur = path.head
          history.find(r => r.t < cur.t && r.endStation == cur.beginStation) match {
            case Some(prev) =>
              path ::= prev
              if (prev.beginStation == newest.endStation && path.length >= minLen)
                found = Some(Cycle(newest.bike, newest.t, path.length,
                  path.map(_.beginStation) :+ newest.endStation))
            case None => continue = false
          }
        }
        found
    }

  /** Keyed state: retain last `Retain` rides per bike; emit cycles as
    * they complete. Batch and streaming via ConsumerApp.
    */
  def cycles(rides: Dataset[Ride], minLen: Int = 3): Dataset[Cycle] = {
    val spark = rides.sparkSession
    import spark.implicits._
    ConsumerApp.keyedStateful[Ride, Long, History, Cycle](
      rides, _.bike, History(Nil)) { (_, batch, st) =>
      var h = st
      val out = Vector.newBuilder[Cycle]
      batch.sortBy(_.t).foreach { r =>
        h = History((r :: h.rides).take(Retain))
        detectCycle(h.rides, minLen).foreach(out += _)
      }
      (h, out.result())
    }
  }
}
