package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BoundedExtremes => BE, BoundedExtremesAggregate}

/** State-machine properties of the bounded min/max synopsis
  * ([[graft.plans.BoundedExtremes]]) against a naive multiset model —
  * the pure logic behind incremental MIN/MAX view maintenance
  * ([[graft.layers.IncrementalView]], ql11). Same manual ScalaCheck
  * sampling as PropertySpec (no scalatestplus bridge offline).
  *
  * The invariants under test are the class contract:
  *   - retained `vals` are sorted, <= k, and a sub-multiset of the group;
  *   - `tau = None` means NOTHING was ever discarded (vals IS the group);
  *   - every unretained value is `>= lo.tau` / `<= hi.tau`;
  *   - while `vals` is nonempty its head/last is the EXACT group min/max;
  *   - vals empty with tau set ⇔ exhausted (rescan required).
  */
class BoundedExtremesSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(4242L + i)))

  /** Remove each retained value (one instance) from the model; asserts
    * retained ⊆ model and returns the unretained remainder.
    */
  private def unretained(model: Vector[Long], retained: Vector[Long]): Vector[Long] =
    retained.foldLeft(model) { (m, v) =>
      val i = m.indexOf(v)
      assert(i >= 0, s"retained value $v is not in the group $m")
      m.patch(i, Nil, 1)
    }

  private def checkInvariants(st: BE.State, model: Vector[Long], k: Int): Unit = {
    assert(st.lo.vals.size <= k && st.hi.vals.size <= k, "synopsis bounded by k")
    assert(st.lo.vals == st.lo.vals.sorted, "lo sorted asc")
    assert(st.hi.vals == st.hi.vals.sorted, "hi sorted asc")
    val loRest = unretained(model, st.lo.vals)
    val hiRest = unretained(model, st.hi.vals)
    st.lo.tau match {
      case None => assert(loRest.isEmpty, s"lo tau=None but unretained $loRest exist")
      case Some(t) => assert(loRest.forall(_ >= t), s"unretained below lo tau $t: $loRest")
    }
    st.hi.tau match {
      case None => assert(hiRest.isEmpty, s"hi tau=None but unretained $hiRest exist")
      case Some(t) => assert(hiRest.forall(_ <= t), s"unretained above hi tau $t: $hiRest")
    }
    if (st.lo.vals.nonEmpty)
      assert(st.lo.vals.head == model.min, s"lo head ${st.lo.vals.head} != min ${model.min}")
    if (st.hi.vals.nonEmpty)
      assert(st.hi.vals.last == model.max, s"hi last ${st.hi.vals.last} != max ${model.max}")
    if (model.isEmpty && st.lo.tau.isEmpty && st.hi.tau.isEmpty)
      assert(st.lo.vals.isEmpty && st.hi.vals.isEmpty, "empty group, no discards => empty synopsis")
  }

  test("insert/delete sequences maintain every invariant against a naive multiset model") {
    // a delete op targets an EXISTING instance (idx into the model) — the
    // feed-consistency contract applyChangesExtremes runs under
    val opGen = Gen.listOfN(300, for {
      del <- Gen.prob(0.45)
      v <- Gen.choose(-40L, 40L) // small domain => plenty of duplicate/tie cases
      idx <- Gen.choose(0, Int.MaxValue - 1)
    } yield (del, v, idx))
    for (k <- Seq(1, 2, 3, 8); ops <- samples(opGen, 8)) {
      var model = Vector.empty[Long]
      var st = BE.empty
      ops.foreach { case (del, v, idx) =>
        // deletes apply even mid-exhaustion: within one feed application
        // every delta folds before the rescan decision, so a present-value
        // delete on an exhausted side must hold (it sits beyond tau)
        if (del && model.nonEmpty) {
          val target = model(idx % model.size)
          model = model.patch(model.indexOf(target), Nil, 1)
          st = BE.delete(st, target)
        } else if (!del) {
          model = model :+ v
          st = BE.insert(st, v, k)
        }
        checkInvariants(st, model, k)
      }
    }
  }

  test("merge is exact for build-phase partials: invariants + exact extremes, order-independent vals") {
    val valsGen = Gen.listOfN(120, Gen.choose(-40L, 40L))
    for (k <- Seq(1, 2, 3, 8); seed <- 0 until 8) {
      val Seq(xs, ys) = samples(valsGen, 2).map(_.toVector) match {
        case s if s.size == 2 => s
        case s => Seq(s.head, s.head.reverse) // degenerate sampling fallback
      }
      val a = xs.foldLeft(BE.empty)((s, v) => BE.insert(s, v, k))
      val b = ys.drop(seed).foldLeft(BE.empty)((s, v) => BE.insert(s, v, k))
      val model = xs ++ ys.drop(seed)
      val m = BE.merge(a, b, k)
      checkInvariants(m, model, k)
      assert(m.lo.vals.head == model.min && m.hi.vals.last == model.max)
      // retained sets are order-independent (taus may legally differ —
      // both are valid bounds on the same unretained mass)
      val m2 = BE.merge(b, a, k)
      assert(m2.lo.vals == m.lo.vals && m2.hi.vals == m.hi.vals,
        "merged retained values must not depend on merge order")
    }
  }

  test("exhaustion: draining the retained tail with discarded mass remaining flags exhausted") {
    val k = 2
    var st = (1L to 5L).foldLeft(BE.empty)((s, v) => BE.insert(s, v, k))
    assert(st.lo.vals == Vector(1L, 2L) && st.lo.tau.contains(3L))
    assert(st.hi.vals == Vector(4L, 5L) && st.hi.tau.contains(3L))
    st = BE.delete(st, 1L)
    assert(!BE.exhausted(st) && st.lo.vals == Vector(2L), "one retained value left — still exact")
    st = BE.delete(st, 2L)
    assert(BE.exhausted(st), "lo drained with tau set => group must rescan")
    assert(st.hi.vals.last == 5L, "hi side stays answerable independently")
  }

  test("a small group never exhausts: tau=None means the synopsis IS the group") {
    val k = 4
    var st = Seq(7L, 3L, 9L).foldLeft(BE.empty)((s, v) => BE.insert(s, v, k))
    Seq(3L, 9L, 7L).foreach { v => st = BE.delete(st, v) }
    assert(st == BE.empty, "fully deleted never-overflowed group returns to empty, not exhausted")
    assert(!BE.exhausted(st))
  }

  test("delete of a value neither retained nor beyond tau throws — feed inconsistency is loud") {
    val st = (10L to 15L).foldLeft(BE.empty)((s, v) => BE.insert(s, v, 2))
    // lo retained (10,11), tau=12: value 5 was never in the group
    val e = intercept[IllegalArgumentException](BE.delete(st, 5L))
    assert(e.getMessage.contains("change feed inconsistent with the synopsis"), e.getMessage)
  }

  test("aggregate buffer serialize/deserialize roundtrip") {
    val agg = BoundedExtremesAggregate(
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 4)
    assert(agg.deserialize(agg.serialize(BE.empty)) == BE.empty)
    samples(Gen.listOfN(50, Gen.choose(-9L, 9L)), 12).foreach { vs =>
      val built = vs.foldLeft(BE.empty)((s, v) => BE.insert(s, v, 4))
      val drained = vs.distinct.take(2).foldLeft(built)((s, v) => BE.delete(s, v))
      Seq(built, drained).foreach { st =>
        assert(agg.deserialize(agg.serialize(st)) == st, s"roundtrip broke $st")
      }
    }
  }
}
