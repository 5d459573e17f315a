package graft.sim

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RetrievalEvalSpec extends SparkSpecBase {
  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)
  private def term(gain: Long, rank: Int): Long =
    math.floor(gain * 1000000.0 / log2(rank + 1.0)).toLong

  test("hand fixture: partial hit set yields exact recall/MRR/DCG/nDCG") {
    // q1: relevant A(3), B(2), C(1); run retrieves A at 1, C at 3, B missed
    val run = Seq((1L, 1, 10L), (1L, 2, 99L), (1L, 3, 12L))
      .toDF("qid", "rank", "neighbor")
    val qrels = Seq((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L))
      .toDF("qid", "neighbor", "gain")
    val r = RetrievalEval.evaluateRun(run, qrels, k = 10).head()
    assert(r.getAs[Long]("n_rel") === 3L)
    assert(r.getAs[Long]("hits") === 2L)
    assert(r.getAs[Long]("recall_micro") === 2000000L / 3L)
    assert(r.getAs[Long]("mrr_micro") === 1000000L)
    val dcg = term(3, 1) + term(1, 3)
    val idcg = term(3, 1) + term(2, 2) + term(1, 3)
    assert(r.getAs[Long]("dcg_micro") === dcg)
    assert(r.getAs[Long]("idcg_micro") === idcg)
    assert(r.getAs[Long]("ndcg_micro") === dcg * 1000000L / idcg)
  }

  test("perfect run scores nDCG exactly 1e6; zero-hit run scores zeros") {
    val qrels = Seq((1L, 10L, 3L), (1L, 11L, 1L),
        (2L, 20L, 2L), (2L, 21L, 1L))
      .toDF("qid", "neighbor", "gain")
    // q1 retrieves the ideal order exactly; q2 retrieves nothing relevant
    val run = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 98L), (2L, 2, 99L))
      .toDF("qid", "rank", "neighbor")
    val out = RetrievalEval.evaluateRun(run, qrels, k = 10)
      .orderBy("qid").collect()
    assert(out(0).getAs[Long]("ndcg_micro") === 1000000L)
    assert(out(0).getAs[Long]("recall_micro") === 1000000L)
    assert(out(0).getAs[Long]("mrr_micro") === 1000000L)
    assert(out(1).getAs[Long]("hits") === 0L)
    assert(out(1).getAs[Long]("recall_micro") === 0L)
    assert(out(1).getAs[Long]("mrr_micro") === 0L)
    assert(out(1).getAs[Long]("ndcg_micro") === 0L)
  }

  test("rank cut: relevant items beyond k do not count") {
    val run = Seq((1L, 1, 99L), (1L, 6, 10L)).toDF("qid", "rank", "neighbor")
    val qrels = Seq((1L, 10L, 1L)).toDF("qid", "neighbor", "gain")
    val r5 = RetrievalEval.evaluateRun(run, qrels, k = 5).head()
    assert(r5.getAs[Long]("hits") === 0L)
    val r10 = RetrievalEval.evaluateRun(run, qrels, k = 10).head()
    assert(r10.getAs[Long]("hits") === 1L)
    assert(r10.getAs[Long]("mrr_micro") === 1000000L / 6L)
  }
}
