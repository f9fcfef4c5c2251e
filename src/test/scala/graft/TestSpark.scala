package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local(cores = 4, shufflePartitions = 4)
    s
  }

  /** Run `f` with a wall-clock bound — for asserting that adversarial input
    * fails FAST rather than spinning (a plain test would just hang the
    * suite). Throws TimeoutException if the deadline passes. */
  def timed[A](millis: Long)(f: => A): A = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future(f), millis.millis)
  }
}
