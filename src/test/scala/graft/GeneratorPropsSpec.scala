package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.pipeline.Generator

/** ScalaCheck properties (SURVEY.md §5): generator determinism and value
  * ranges across arbitrary seeds/rates — pure JVM, no Spark session. */
object GeneratorPropsSpec extends Properties("Generator") {

  private def run(seed: Long, rate: Int, dur: Int): (Int, Map[String, String]) = {
    val dir = java.nio.file.Files.createTempDirectory("genprop")
    val n = Generator.generate(dir.toString, rate, dur, seed)
    val files = java.nio.file.Files.walk(dir).iterator()
    val contents = scala.jdk.CollectionConverters.IteratorHasAsScala(files).asScala
      .filter(p => p.toString.endsWith(".json"))
      .map(p => dir.relativize(p).toString -> new String(java.nio.file.Files.readAllBytes(p)))
      .toMap
    val del = java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
    scala.jdk.CollectionConverters.IteratorHasAsScala(del.iterator()).asScala
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    (n, contents)
  }

  private val seeds = Gen.choose(0L, 10000L)

  property("deterministic: same seed produces byte-identical files") =
    Prop.forAll(seeds) { seed =>
      run(seed, 3, 20) == run(seed, 3, 20)
    }

  property("event count equals rate x duration") =
    Prop.forAll(seeds, Gen.choose(1, 5), Gen.choose(10, 30)) { (seed, rate, dur) =>
      run(seed, rate, dur)._1 == rate * dur
    }

  property("values respect per-sensor ranges and lag is bounded") =
    Prop.forAll(seeds) { seed =>
      val (_, files) = run(seed, 5, 20)
      val lines = files.values.flatMap(_.linesIterator).toSeq
      lines.nonEmpty && lines.forall { l =>
        val v = """"value": ([0-9.]+)""".r.findFirstMatchIn(l).get.group(1).toDouble
        val sensorOk =
          if (l.contains("temperature")) v >= 5.0 && v <= 40.0
          else if (l.contains("vibration")) v >= 0.0 && v <= 10.0
          else v >= 0.0 && v <= 30.0
        sensorOk && l.contains("\"event_time\"") && l.contains("\"ingest_time\"")
      }
    }
}
