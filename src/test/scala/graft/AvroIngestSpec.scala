package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.AvroIngest

/** Contract specs for the Avro container scan: whole-file refusal on
  * any decode fault, and never-throws under random corruption. The
  * value-level cross-writer grade runs through q_avro_read (fixtures
  * hand-encoded per the spec in tools/avro_golden.py). */
class AvroIngestSpec extends AnyFunSuite {

  private def fx(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(Fixtures.path("q_avro_read"), name))

  test("good files decode; corrupt and unknown-codec files refuse whole") {
    val cells = AvroIngest.decode(fx("users-00.avro")).get
    assert(cells.nonEmpty)
    assert(cells.map(_._1).distinct == Vector(0, 1, 2, 3, 4, 5))
    assert(AvroIngest.decode(fx("corrupt-02.avro")).isEmpty,
      "sync-flipped file must refuse whole, not half-ingest")
    assert(AvroIngest.decode(fx("badcodec-03.avro")).isEmpty)
    assert(AvroIngest.decode(Array.emptyByteArray).isEmpty)
    assert(AvroIngest.decode("Objjunk".getBytes).isEmpty)
  }

  test("deflate multi-block file decodes fully") {
    val cells = AvroIngest.decode(fx("users-01.avro")).get
    assert(cells.map(_._1).max == 8) // 9 records across two blocks
    val floats = cells.filter(_._2.vtype == "float")
    assert(floats.forall(_._2.float_bits.isDefined))
  }

  test("fuzz: random corruption never throws") {
    val base = fx("users-01.avro")
    val rnd = new scala.util.Random(77)
    (0 until 300).foreach { _ =>
      val b = base.clone
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      val cut = if (rnd.nextBoolean()) b.take(rnd.nextInt(b.length)) else b
      AvroIngest.decode(cut)
    }
  }
}
