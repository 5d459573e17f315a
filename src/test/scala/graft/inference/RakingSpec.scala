package graft.inference

import graft.SparkSpecBase

class RakingSpec extends SparkSpecBase {
  import spark.implicits._

  private def rake(sample: Seq[(String, String)],
      pop: Seq[(String, String)], iters: Int = 10) =
    Raking.rakeWeights(sample.toDF("d1", "d2"), pop.toDF("d1", "d2"),
      "d1", "d2", iters)
      .collect().map(r => (r.getAs[String]("d1"), r.getAs[String]("d2"))
        -> (r.getAs[Long]("n"), r.getAs[Long]("weight_micro"))).toMap

  test("uniform undersampling rakes to the exact expansion factor") {
    val pop = for (a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 4) yield (a, b)
    val sample = for (a <- Seq("x", "y"); b <- Seq("p", "q"))
      yield (a, b)
    val m = rake(sample, pop)
    assert(m.values.forall(_._2 === 4000000L))
  }

  test("biased sample: raked margins hit the population targets") {
    // population: x-heavy on p; sample over-represents (y, q)
    val pop = Seq.fill(6)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(2)(("y", "p")) ++ Seq.fill(2)(("y", "q"))
    val sample = Seq(("x", "p"), ("x", "q"), ("y", "p"),
      ("y", "q"), ("y", "q"), ("y", "q"))
    val m = rake(sample, pop)
    def margin1(g: String) = m.collect {
      case ((d1, _), (n, w)) if d1 == g => n * w }.sum
    def margin2(g: String) = m.collect {
      case ((_, d2), (n, w)) if d2 == g => n * w }.sum
    // the LAST-scaled dimension matches its targets exactly up to the
    // per-cell floor; the other is within IPF convergence tolerance
    assert(math.abs(margin2("p") - 8000000L) <= 4L)
    assert(math.abs(margin2("q") - 4000000L) <= 4L)
    assert(math.abs(margin1("x") - 8000000L) <= 2000L)
    assert(math.abs(margin1("y") - 4000000L) <= 2000L)
  }

  test("a sample dim level with zero population mass is zeroed") {
    val pop = Seq.fill(4)(("x", "p"))
    val sample = Seq(("x", "p"), ("z", "p"))
    val m = rake(sample, pop)
    assert(m(("z", "p"))._2 === 0L)
    // x absorbs the full population mass: 4 units over 1 sample row
    assert(math.abs(m(("x", "p"))._2 - 4000000L) <= 2L)
  }

  test("deterministic: reruns are bit-identical") {
    val pop = Seq.fill(5)(("x", "p")) ++ Seq.fill(3)(("y", "q"))
    val sample = Seq(("x", "p"), ("x", "p"), ("y", "q"))
    assert(rake(sample, pop) === rake(sample, pop))
  }
}
