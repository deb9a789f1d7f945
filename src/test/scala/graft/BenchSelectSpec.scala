package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchSelectSpec extends AnyFunSuite {

  test("empty args select the full inventory") {
    assert(Bench.select(Array.empty).map(_.name) == Queries.all.map(_.name))
  }

  test("valid names select the subset in declaration order") {
    val names = Queries.all.map(_.name)
    val picked = Array(names.last, names.head)
    assert(Bench.select(picked).map(_.name) == Seq(names.head, names.last))
  }

  test("a misspelled name fails fast instead of silently running nothing") {
    val e = intercept[IllegalArgumentException] {
      Bench.select(Array("q_agg_sum", "q_no_such_query"))
    }
    assert(e.getMessage.contains("q_no_such_query"))
    assert(!e.getMessage.contains("q_agg_sum,"))
  }
}
