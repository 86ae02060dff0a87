package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Property over [[EventStreams.netLatestByKey]]: for ANY change feed —
  * several post-images and deletes per key, colliding `ordCol` values
  * across commits, delete+insert pairs inside one commit — the netted
  * frame must equal a trivial per-key maxBy over the documented order
  * (ordCol, then `_commit_snapshot_id`, then post-image-over-delete).
  * This is the sink's correctness core: a wrong winner here silently
  * corrupts every equality-upsert mirror downstream.
  */
class NetLatestPropertySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // one event: (key, ord, commit, isDelete). Triples (ord, commit,
  // rank) are deduped per key so the documented order is a TOTAL
  // order on each key's events (a full tie would make any winner
  // valid — nothing to test).
  private case class Ev(key: Long, ord: Long, commit: Long, del: Boolean)

  private val genFeed: Gen[List[Ev]] = for {
    nKeys <- Gen.choose(1, 6)
    evs <- Gen.listOfN(nKeys * 4, for {
      k <- Gen.choose(0L, nKeys.toLong - 1)
      ord <- Gen.choose(0L, 2L)
      commit <- Gen.choose(1L, 3L)
      del <- Gen.oneOf(true, false)
    } yield Ev(k, ord, commit, del))
  } yield evs
    .groupBy(e => (e.key, e.ord, e.commit, e.del)).map(_._2.head).toList
    // delete and post-image at the SAME (ord, commit) stay — that is
    // exactly the UPDATE delete+insert pair the rank term resolves
    .groupBy(e => (e.key, e.ord, e.commit)).values.flatMap(_.take(2))
    .toList

  test("PROPERTY: netLatestByKey ≡ per-key maxBy over " +
      "(ord, commit, post-image-over-delete)") {
    val prop = Prop.forAll(genFeed) { evs0 =>
      val evs = evs0 match {
        case Nil => List(Ev(0L, 0L, 1L, del = false))
        case xs  => xs
      }
      val rows = evs.map(e => (e.key, e.ord, e.commit,
        if (e.del) "delete" else "update_postimage",
        s"v${e.key}-${e.ord}-${e.commit}-${e.del}"))
      val cdc = rows.toDF("key", "ord", "_commit_snapshot_id",
        graft.store.TableStore.ChangeTypeCol, "v")
      val got = EventStreams.netLatestByKey(cdc, Seq("key"), "ord")
        .as[(Long, Long, Long, String, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val want = evs.groupBy(_.key).map { case (k, es) =>
        val w = es.maxBy(e => (e.ord, e.commit, if (e.del) 0 else 1))
        k -> ((w.ord, w.commit,
          if (w.del) "delete" else "update_postimage",
          s"v${w.key}-${w.ord}-${w.commit}-${w.del}"))
      }
      if (got != want) println(s"MISMATCH evs=$evs got=$got want=$want")
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.status.toString)
  }
}
