package graft.bench

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Median-of-N wrapper around [[RuntimeSchemaBenchmark]] — the comparator
  * analog of the query bench's interleaved median-of-3: the O23 harness
  * (whose per-run protocol must stay byte-identical to the reference's for
  * BASELINE comparability) is run `rounds` times back-to-back, and each
  * case's per-run AVERAGE is voted down to min/median/max across rounds.
  * Round-to-round drift on a shared box (the 761 → 1,082 ns/op
  * custom-unordered wobble across rounds 4-7) then reads as a spread in
  * ONE artifact instead of a mystery between rounds.
  *
  * Usage: runMain graft.bench.ComparatorMedianRunner [out.csv] [rounds]
  */
object ComparatorMedianRunner {
  def main(args: Array[String]): Unit = {
    val outputPath = args.headOption.map(Path.of(_))
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val tmp = Files.createTempDirectory("graft_cmp")
    val perRun: Seq[Map[String, Double]] = (1 to rounds).map { r =>
      val csv = tmp.resolve(s"run$r.csv")
      RuntimeSchemaBenchmark.main(Array(csv.toString))
      // tolerate non-data lines (header or truncation) instead of dying in
      // toDouble with an opaque NumberFormatException mid-aggregation
      Files.readAllLines(csv).asScala.flatMap { line =>
        val cols = line.split(',')
        if (cols.length >= 2) cols(1).toDoubleOption.map(cols(0) -> _) else None
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2) else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
    }
    // every round must produce the same case set — a mismatch means a
    // truncated/failed run, and silently dropping cases would publish a
    // partial median as if it were complete
    val names = perRun.head.keys.toSeq.sorted
    perRun.zipWithIndex.foreach { case (m, i) =>
      require(
        m.keys.toSeq.sorted == names,
        s"comparator round ${i + 1} produced case set ${m.keys.toSeq.sorted.mkString(",")} " +
          s"but round 1 produced ${names.mkString(",")} — a run failed or its CSV is malformed"
      )
    }
    val header = "benchmark,median_avg_ns_per_op,min_avg_ns_per_op,max_avg_ns_per_op,rounds"
    val rows = names.map { n =>
      val xs = perRun.map(_(n))
      f"$n,${median(xs)}%.2f,${xs.min}%.2f,${xs.max}%.2f,$rounds"
    }
    val rendered = (header +: rows).mkString("\n")
    outputPath.foreach { p =>
      Option(p.getParent).foreach(Files.createDirectories(_))
      Files.writeString(p, rendered)
    }
    println(rendered)
  }
}
