package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.JoinAdvisor

/** The advisor's contract: profiles are exact where exactness is free
  * (rows, dist_exact, max_freq; dist_est falls back to exact below the
  * sketch's k), the containment estimate is the System-R formula in
  * pure integers, and each strategy rule fires on the regime built to
  * trigger it — broadcast beats the skew rule when both would apply
  * (a broadcastable small side already neutralizes skew). */
class JoinAdvisorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = JoinAdvisor.Config(broadcastRows = 10L, skewFactor = 4L)

  test("keyProfile: exact fields; dist_est == dist_exact below k") {
    val df = Seq(1L, 1L, 1L, 2L, 2L, 3L, -1L).toDF("k")
      .unionByName(Seq(Option.empty[Long]).toDF("k"))
    val p = df.as("d")
    val row = JoinAdvisor.keyProfile(p.toDF(), "k").collect().head
    assert(row.getAs[Long]("rows") == 7L, "null keys are dropped")
    assert(row.getAs[Long]("dist_exact") == 4L)
    assert(row.getAs[Long]("max_freq") == 3L)
    assert(row.getAs[Long]("dist_est") == 4L, "4 distinct < k=16 -> exact")
  }

  test("broadcast: small side within budget, even when skewed") {
    val small = Seq.fill(8)(1L).toDF("k") // 8 rows <= 10, ALSO 100% hot
    val big = (1L to 100L).toDF("k")
    val r = JoinAdvisor.advise("j", small, "k", big, "k", cfg).collect().head
    assert(r.getAs[String]("strategy") == "broadcast")
    assert(r.getAs[Long]("exact_out") == 8L)
  }

  test("shuffle_salted: hot key >= skewFactor x mean per-key load") {
    // 100 keys, one carrying 50% of 200 rows: max_freq*dist = 100*100 >= 4*200
    val skewed = ((1L to 100L) ++ Seq.fill(100)(1L)).toDF("k")
    val other = (1L to 50L).flatMap(k => Seq.fill(2)(k)).toDF("k")
    val r = JoinAdvisor.advise("j", skewed, "k", other, "k", cfg).collect().head
    assert(r.getAs[String]("strategy") == "shuffle_salted")
  }

  test("shuffle: uniform keys, both sides over budget; exact containment estimate") {
    // both sides uniform: a = keys 1..12 x3 rows, b = keys 1..12 x2 rows
    val a = (1L to 12L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val b = (1L to 12L).flatMap(k => Seq.fill(2)(k)).toDF("k")
    val r = JoinAdvisor.advise("j", a, "k", b, "k", cfg).collect().head
    assert(r.getAs[String]("strategy") == "shuffle")
    // 12 distinct < k=16 -> dist_est exact -> est = 36*24/12 = 72 = exact
    assert(r.getAs[Long]("est_out") == 72L)
    assert(r.getAs[Long]("exact_out") == 72L)
    assert(r.getAs[Long]("err_ppm") == 0L)
  }
}
