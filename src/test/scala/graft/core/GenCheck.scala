package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property runner over ScalaCheck generators
  * (the scalatestplus bridge isn't on the offline classpath). */
object GenCheck {
  def forAll[T](g: Gen[T], n: Int = 300)(f: T => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
}
