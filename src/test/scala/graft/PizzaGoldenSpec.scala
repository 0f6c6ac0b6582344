package graft

import org.apache.spark.sql.functions._
import graft.api.{Engine, Relation}

/** The reference's de-facto correctness contract: exact row counts on the
  * pizza corpus, reproduced through BOTH our doors —
  *  - SQL text via `Engine.sqlDistinct` (reference `tests/test_e2e.py`),
  *  - RA combinators via `Relation` (reference `tests/test_ra2mr.py`).
  * Counts cited per-test from the reference files.
  */
class PizzaGoldenSpec extends SparkSpec {

  private lazy val engine = new Engine(spark, pizzaDd, pizzaDir, format = "csv")

  private def sqlCount(q: String): Long = engine.sqlDistinct(q).count()

  // ───────────────── SQL door (tests/test_e2e.py:50-106) ──────────────────

  test("e2e: select * from Person = 9") {
    assert(sqlCount("select * from Person") === 9)
  }

  test("e2e: Person where age = 16 = 1") {
    assert(sqlCount("select * from Person where Person.age = 16") === 1)
  }

  test("e2e: Person where gender and age = 1") {
    assert(sqlCount(
      "select * from Person where Person.gender='female' and Person.age=16") === 1)
  }

  test("e2e: project name = 9 (implicit distinct)") {
    assert(sqlCount("select Person.name from Person") === 9)
  }

  test("e2e: project name, age = 9 and contains Amy/16") {
    val df = engine.sqlDistinct("select Person.name, Person.age from Person")
    assert(df.count() === 9)
    assert(df.filter(col("name") === "Amy" && col("age") === 16).count() === 1)
  }

  test("e2e: Person join Eats = 20") {
    assert(sqlCount(
      "select * from Person, Eats where Person.name = Eats.name") === 20)
  }

  test("e2e: project over 3-way join = 20") {
    assert(sqlCount(
      """select Person.name, Serves.pizza from Person, Eats, Serves
         where Person.name = Eats.name and Eats.pizza = Serves.pizza""") === 20)
  }

  test("e2e: aliased scan X.name = 9") {
    val df = engine.sqlDistinct("select X.name from Person X")
    assert(df.count() === 9)
    assert(df.filter(col("name") === "Amy").count() === 1)
  }

  test("e2e: mushroom lovers = 8 (the reference's flagship query)") {
    assert(sqlCount(
      """select Person.name, Serves.pizzeria from Person, Eats, Serves
         where Person.name = Eats.name and Eats.pizza = Serves.pizza
         and Eats.pizza = 'mushroom'""") === 8)
  }

  test("e2e: 3-way join with two residual filters = 2") {
    assert(sqlCount(
      """select * from Person, Eats, Serves
         where Person.name = Eats.name and Eats.pizza = Serves.pizza
         and Person.age = 16 and Serves.pizzeria = 'Little Ceasars'""") === 2)
  }

  // ─────────────── RA-combinator door (tests/test_ra2mr.py) ───────────────

  private def scan(rel: String): Relation = engine.scan(rel)

  test("ra: select gender=female = 3 (test_ra2mr.py:223-230)") {
    assert(scan("Person").select(col("gender") === "female").toDF.count() === 3)
  }

  test("ra: empty join Person.name = Serves.pizzeria = 0 (test_ra2mr.py:233)") {
    assert(scan("Person").join(scan("Serves"),
      col("Person.name") === col("Serves.pizzeria")).toDF.count() === 0)
  }

  test("ra: 3-way join = 42 in all three associativity orders (test_ra2mr.py:238-251)") {
    val p = scan("Person"); val e = scan("Eats"); val f = scan("Frequents")
    val onPE = col("Person.name") === col("Eats.name")
    val onEF = col("Eats.name") === col("Frequents.name")
    assert(p.join(e, onPE).join(f, onEF).toDF.count() === 42)
    assert(e.join(p, onPE).join(f, onEF).toDF.count() === 42)
    assert(p.join(e.join(f, onEF), onPE).toDF.count() === 42)
  }

  test("ra: join with filtered side price=8 = 8 (test_ra2mr.py:253-257)") {
    val filtered = scan("Serves").select(col("price") === 8)
    assert(scan("Person")
      .join(scan("Eats"), col("Person.name") === col("Eats.name"))
      .join(filtered, col("Eats.pizza") === col("Serves.pizza"))
      .toDF.count() === 8)
  }

  test("ra: Dominos join = 9 (test_ra2mr.py:259-263)") {
    val dominos = scan("Serves").select(col("pizzeria") === "Dominos")
    assert(scan("Person")
      .join(scan("Eats"), col("Person.name") === col("Eats.name"))
      .join(dominos, col("Eats.pizza") === col("Serves.pizza"))
      .toDF.count() === 9)
  }

  test("ra: self-join through rename = 94 (test_ra2mr.py:265-268)") {
    val a = scan("Eats").rename("A")
    val b = scan("Eats").rename("B")
    assert(a.join(b, col("A.pizza") === col("B.pizza")).toDF.count() === 94)
  }

  test("ra: multi-key conjunctive self-join = 9 (test_ra2mr.py:270-273)") {
    val p = scan("Person").rename("P")
    val q = scan("Person").rename("Q")
    assert(p.join(q, col("P.gender") === col("Q.gender") &&
      col("P.age") === col("Q.age")).toDF.count() === 9)
  }

  test("ra: project deduplicates (set semantics)") {
    assert(scan("Eats").project("pizza").toDF.count() === 5)
    assert(scan("Eats").projectAll("pizza").toDF.count() === 20)
  }

  test("ra: rename with attribute list") {
    val r = scan("Eats").rename("E2", Seq("person", "pie"))
    assert(r.toDF.columns.toSeq === Seq("person", "pie"))
    assert(r.toDF.filter(col("E2.pie") === "mushroom").count() === 4)
  }

  test("ra: cross product = |Person| * |Eats| = 180") {
    assert(scan("Person").cross(scan("Eats")).toDF.count() === 180)
  }

  test("dd: CSV dotted headers are stripped and types cast from the dd") {
    val df = pizzaDd.load(spark, pizzaDir, "Serves", "csv")
    assert(df.columns.toSeq === Seq("pizzeria", "pizza", "price"))
    assert(df.schema("price").dataType ===
      org.apache.spark.sql.types.DoubleType)
    // float values survive the cast (reference dd lies and says integer;
    // SURVEY §7.4 documents our deliberate typed divergence)
    assert(df.filter(col("price") === 7.75).count() === 1)
  }
}
