package graft.cdc

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.decode._

/** Property test: the distributed compaction equals a sequential in-memory
  * interpretation of the same event sequence — under random DML mixes,
  * random partition placement, and same-LSN seq tie-breaks. */
class CdcPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Sequential reference semantics: apply events in (lsn, seq) order. */
  private def interpret(events: Seq[ChangeEvent]): Map[String, Map[String, String]] = {
    val state = scala.collection.mutable.Map.empty[String, Map[String, String]]
    events.sortBy(e => (e.lsn, e.seq)).foreach { e =>
      e.op match {
        case "I" | "U" =>
          val key = e.key("id")
          val prev = state.get(key)
          val base = e.after
          val repaired =
            if (e.afterToasted.nonEmpty && prev.isDefined)
              base ++ prev.get.view.filterKeys(e.afterToasted.contains).toMap
            else base
          state(key) = repaired
        case "D" => state.remove(e.key("id"))
        case "T" => // handled via high-water mark in compact; not generated here
      }
    }
    state.toMap
  }

  private def randomEvents(rnd: Random, n: Int, keySpace: Int): Seq[ChangeEvent] = {
    var seq = 0L
    (1 to n).map { i =>
      seq += 1
      val key = (rnd.nextInt(keySpace) + 1).toString
      val lsn = i.toLong * (1 + rnd.nextInt(2)) // occasional same-lsn collisions
      val op = rnd.nextInt(10) match {
        case 0 | 1 => "D"
        case 2 | 3 | 4 => "U"
        case _ => "I"
      }
      val toasted = op == "U" && rnd.nextBoolean()
      val after =
        if (op == "D") null
        else if (toasted) Map("id" -> key)
        else Map("id" -> key, "v" -> s"v$i", "w" -> rnd.nextInt(100).toString)
      ChangeEvent(op, s"$lsn-$seq", lsn, seq, 1, lsn, 0L, "public", "t", 1,
        Map("id" -> key), null, after, Nil, if (toasted) Seq("v", "w") else Nil)
    }
  }

  test("compactFillingToast equals sequential interpretation over 5 random mixes") {
    import spark.implicits._
    (1 to 5).foreach { trial =>
      val rnd = new Random(42 + trial)
      val events = randomEvents(rnd, n = 400, keySpace = 40)
      val expected = interpret(events)
      val df = spark.createDataset(rnd.shuffle(events)).repartition(7).toDF()
      val got = Cdc.compactFillingToast(df, Seq("id")).collect().map { r =>
        val m = r.getMap[String, String](r.fieldIndex("after"))
        m("id") -> m.toMap.map { case (k, v) => k -> v }
      }.toMap
      // normalize: interpreter's repaired map may carry nulls for toasted
      // columns with no prior value; compaction omits what it cannot repair
      val norm = expected.map { case (k, m) => k -> m.filter(_._2 != null) }
      val gotNorm = got.map { case (k, m) => k -> m.filter(_._2 != null) }
      assert(gotNorm === norm, s"trial $trial")
    }
  }

  test("plain compact agrees on which keys survive (ignoring TOAST repair)") {
    import spark.implicits._
    val rnd = new Random(7)
    val events = randomEvents(rnd, n = 300, keySpace = 25)
    val expectedKeys = interpret(events).keySet
    val df = spark.createDataset(rnd.shuffle(events)).repartition(5).toDF()
    val gotKeys = Cdc.compact(df, Seq("id")).collect()
      .map(r => r.getMap[String, String](r.fieldIndex("key"))("id")).toSet
    assert(gotKeys === expectedKeys)
  }
}
