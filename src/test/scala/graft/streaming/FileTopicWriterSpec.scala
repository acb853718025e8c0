package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** K5 producer-lifecycle contract ([[FileTopicWriter]]): exactly-once per
  * (partition, epoch) on top of at-least-once task execution — replay skip,
  * atomic commit, failed-attempt cleanup, and safety under two concurrent
  * attempts of the same (partition, epoch) (speculation / zombie retry). */
class FileTopicWriterSpec extends AnyFunSuite {

  private def row(s: String): Row = Row(s)

  private def parts(dir: Path): Seq[String] = {
    val l = Files.list(dir)
    try l.iterator().asScala.map(_.getFileName.toString).toSeq.sorted
    finally l.close()
  }

  private def lines(p: Path): Seq[String] =
    Files.readAllLines(p).asScala.toSeq

  test("open/process/close commits one part per (partition, epoch); replay is skipped") {
    val dir = Files.createTempDirectory("ftw-commit-")
    val w = new FileTopicWriter(dir.toString)
    assert(w.open(partitionId = 3, epochId = 7))
    w.process(row("a")); w.process(row("b"))
    w.close(null)
    assert(parts(dir) == Seq("part-7-3"))
    assert(lines(dir.resolve("part-7-3")) == Seq("a", "b"))
    // Replayed epoch: open must decline so Spark skips the partition.
    val replay = new FileTopicWriter(dir.toString)
    assert(!replay.open(partitionId = 3, epochId = 7))
    assert(lines(dir.resolve("part-7-3")) == Seq("a", "b"))
  }

  test("failed attempt leaves no part and no temp; retry commits cleanly") {
    val dir = Files.createTempDirectory("ftw-fail-")
    val w = new FileTopicWriter(dir.toString)
    assert(w.open(0, 0))
    w.process(row("half-written"))
    w.close(new RuntimeException("task failed"))
    assert(parts(dir).isEmpty) // no part, no leftover .tmp
    val retry = new FileTopicWriter(dir.toString)
    assert(retry.open(0, 0)) // dst absent: retry may write
    retry.process(row("good"))
    retry.close(null)
    assert(parts(dir) == Seq("part-0-0"))
    assert(lines(dir.resolve("part-0-0")) == Seq("good"))
  }

  test("two concurrent attempts of one (partition, epoch): exactly one complete part survives") {
    val dir = Files.createTempDirectory("ftw-race-")
    val w1 = new FileTopicWriter(dir.toString)
    val w2 = new FileTopicWriter(dir.toString)
    // Both attempts open before either commits (the speculation window).
    assert(w1.open(1, 5))
    assert(w2.open(1, 5))
    w1.process(row("x")); w1.process(row("y"))
    w2.process(row("x")); w2.process(row("y")) // same epoch ⇒ same rows
    w1.close(null)
    w2.close(null) // loser: replaces with equivalent bytes or discards
    assert(parts(dir) == Seq("part-5-1")) // one part, zero temp files
    assert(lines(dir.resolve("part-5-1")) == Seq("x", "y"))
  }

  test("distinct partitions and epochs commit independently") {
    val dir = Files.createTempDirectory("ftw-multi-")
    for ((p, e) <- Seq((0L, 0L), (1L, 0L), (0L, 1L))) {
      val w = new FileTopicWriter(dir.toString)
      assert(w.open(p, e))
      w.process(row(s"p$p-e$e"))
      w.close(null)
    }
    assert(parts(dir) == Seq("part-0-0", "part-0-1", "part-1-0"))
  }
}
