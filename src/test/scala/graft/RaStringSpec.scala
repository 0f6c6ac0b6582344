package graft

import org.apache.spark.sql.functions._
import graft.api.Engine

/** The reference's RA-string goldens (`tests/test_ra2mr.py:144-273`)
  * ported VERBATIM as query strings through the `Engine.ra` text door —
  * the same counts the reference's Luigi/MR evaluator asserts, produced
  * here by parsing the radb syntax and lowering to Relation combinators.
  */
class RaStringSpec extends SparkSpec {

  private lazy val engine = new Engine(spark, pizzaDd, pizzaDir, format = "csv")

  private def count(q: String): Long = engine.ra(q).count()

  // ── σ variants (test_ra2mr.py:144-158, 176-199) ──────────────────────

  test("""\select_{Person.gender='female'}(Person); = 3""") {
    assert(count("""\select_{Person.gender='female'}(Person);""") === 3)
  }

  test("""\select_{gender='female'}(Person); = 3 (bare attr)""") {
    assert(count("""\select_{gender='female'}(Person);""") === 3)
  }

  test("""\select_{'female'=Person.gender}(Person); = 3 (literal on left)""") {
    assert(count("""\select_{'female'=Person.gender}(Person);""") === 3)
  }

  test("""\select_{Person.age=21}(Person); = 2""") {
    assert(count("""\select_{Person.age=21}(Person);""") === 2)
  }

  test("""\select_{price=9}(Serves); = 1""") {
    assert(count("""\select_{price=9}(Serves);""") === 1)
  }

  test("""\select_{gender and age conjunction} = 1""") {
    assert(count(
      """\select_{Person.gender='female' and Person.age=16}(Person);""") === 1)
  }

  test("""\select_{age=3}(Person); = 0""") {
    assert(count("""\select_{age=3}(Person);""") === 0)
  }

  // ── ρ (test_ra2mr.py:160-174) ────────────────────────────────────────

  test("""\rename_{P:*} (Person); = 9 and qualifies as P""") {
    val df = engine.ra("""\rename_{P:*} (Person);""")
    assert(df.count() === 9)
    assert(df.filter(col("P.name") === "Amy").count() === 1)
  }

  test("""\select_{P.gender='female'} \rename_{P:*} (Person); = 3""") {
    assert(count(
      """\select_{P.gender='female'} \rename_{P:*} (Person);""") === 3)
  }

  // ── π with implicit dedup (test_ra2mr.py:201-205, 212-216) ───────────

  test("""\project_{pizza} \select_{pizza='mushroom'} Eats; = 1""") {
    assert(count("""\project_{pizza} \select_{pizza='mushroom'} Eats;""") === 1)
  }

  test("""\project_{Person.gender} Person; = 2 (set semantics)""") {
    assert(count("""\project_{Person.gender} Person;""") === 2)
  }

  test("""\project_{Person.name, Eats.pizza} over join = 20""") {
    assert(count(
      """\project_{Person.name, Eats.pizza} (Person \join_{Person.name = Eats.name} Eats);""") === 20)
  }

  // ── ⨝ shapes (test_ra2mr.py:207-210, 218-273) ────────────────────────

  test("""Person join filtered Eats mushroom = 4 with 5 attributes""") {
    val df = engine.ra(
      """Person \join_{Person.name = Eats.name} (\select_{pizza='mushroom'} Eats);""")
    assert(df.count() === 4)
    assert(df.columns.length === 5)
  }

  test("""filtered Person join Eats = 5, names agree""") {
    val df = engine.ra(
      """(\select_{gender='female'} Person) \join_{Person.name = Eats.name} Eats;""")
    assert(df.count() === 5)
    assert(df.filter(col("Person.name") === col("Eats.name")).count() === 5)
    assert(df.filter(col("Person.gender") === "female").count() === 5)
  }

  test("""empty join Person.name = Serves.pizzeria = 0""") {
    assert(count(
      """Person \join_{Person.name = Serves.pizzeria} Serves;""") === 0)
  }

  test("""3-way join = 42 in all three associativity orders""") {
    assert(count(
      """(Person \join_{Person.name = Eats.name} Eats) \join_{Eats.name = Frequents.name} Frequents;""") === 42)
    assert(count(
      """(Eats \join_{Person.name = Eats.name} Person) \join_{Eats.name = Frequents.name} Frequents;""") === 42)
    assert(count(
      """Person \join_{Person.name = Eats.name} (Eats \join_{Eats.name = Frequents.name} Frequents);""") === 42)
  }

  test("""unparenthesized left-assoc chain with filtered tail = 8""") {
    assert(count(
      """Person \join_{Person.name = Eats.name} Eats \join_{Eats.pizza = Serves.pizza} \select_{price=8}Serves;""") === 8)
  }

  test("""Dominos join = 9""") {
    assert(count(
      """(Person \join_{Person.name = Eats.name} Eats) \join_{Eats.pizza = Serves.pizza} (\select_{pizzeria='Dominos'} Serves);""") === 9)
  }

  test("""self-join through rename = 94""") {
    assert(count(
      """(\rename_{A:*} Eats) \join_{A.pizza = B.pizza} (\rename_{B:*} Eats);""") === 94)
  }

  test("""multi-key conjunctive self-join = 9""") {
    assert(count(
      """(\rename_{P:*} Person) \join_{P.gender = Q.gender and P.age = Q.age} (\rename_{Q:*} Person);""") === 9)
  }

  // ── × and breadth beyond the goldens ─────────────────────────────────

  test("""Person \cross Eats; = 180""") {
    assert(count("""Person \cross Eats;""") === 180)
  }

  test("""rename with attribute list renames positionally""") {
    val df = engine.ra("""\rename_{E2: (person, pie)} Eats;""")
    assert(df.columns.toSeq === Seq("person", "pie"))
    assert(df.filter(col("E2.pie") === "mushroom").count() === 4)
  }

  test("""extended comparators: range select""") {
    assert(count("""\select_{price<=8}(Serves);""") === 5)
    assert(count("""\select_{age<>21}(Person);""") === 7)
  }

  test("malformed input fails with a parse error, not a Spark error") {
    intercept[IllegalArgumentException](engine.ra("""\select_{(Person);"""))
    intercept[IllegalArgumentException](engine.ra("""\frobnicate_{x} Person;"""))
    intercept[IllegalArgumentException](engine.ra("""Person \join_{} Eats;"""))
    intercept[IllegalArgumentException](engine.ra("""(Person;"""))
  }

  // The door is user-facing through the CLI (`--lang ra`), so the ERROR
  // MESSAGES are part of the contract: a user typing a bad query must see
  // what went wrong and where, not a Catalyst stack trace. Pin the
  // messages the parser promises for each failure site.

  test("""error message: unterminated { names the operator""") {
    val e = intercept[IllegalArgumentException](
      engine.ra("""\select_{gender='female'(Person);"""))
    assert(e.getMessage.contains("unterminated"))
    assert(e.getMessage.contains("select"))
  }

  test("error message: missing comparator quotes the condition") {
    val e = intercept[IllegalArgumentException](
      engine.ra("""\select_{gender 'female'}(Person);"""))
    assert(e.getMessage.contains("no comparator in condition"))
    assert(e.getMessage.contains("gender 'female'"))
  }

  test("error message: trailing input after a complete expression") {
    val e = intercept[IllegalArgumentException](
      engine.ra("""(Person) Eats;"""))
    assert(e.getMessage.contains("trailing input"))
  }

  test("error message: unexpected character reports position and query") {
    val e = intercept[IllegalArgumentException](
      engine.ra("""\select_{age=21}(Person) @;"""))
    assert(e.getMessage.contains("unexpected character '@'"))
    assert(e.getMessage.contains("RA parse error at"))
  }

  test("error message: missing ) after parenthesized expression") {
    val e = intercept[IllegalArgumentException](engine.ra("""(Person;"""))
    assert(e.getMessage.contains("expected )"))
  }
}
