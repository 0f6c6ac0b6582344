package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Dedup, Skew, TextOps}

/** Property-based algebraic laws over small random relations — the layer
  * the reference has none of (SURVEY §5 "our test plan"). Generators are
  * ScalaCheck's, driven with fixed seeds (each law samples several
  * deterministic inputs, so failures reproduce exactly); laws pin
  * SEMANTICS (result sets), not plans.
  */
class PropertySpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default.withSize(12), Seed(seed))
      .getOrElse(sys.error("generator failed"))

  private def check[A](g: Gen[A], n: Int = 5)(law: A => Unit): Unit =
    (1 to n).foreach(i => law(sample(g, 0x67AF7L + i)))

  private val rows: Gen[List[(Long, Int)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 9)))

  test("triangles: degree-ordered orientation == naive 3-way join on random graphs") {
    // the scalable algorithm must find EXACTLY the definitional
    // triangle set on arbitrary graphs — duplicates, self-loops and
    // both edge directions included in the generator so symmetrize/
    // dedup is exercised, and small node domain (0..9) forces dense
    // random graphs with many shared-edge triangles
    val edges: Gen[List[(Long, Long)]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    check(edges) { es =>
      val df = es.toDF("s", "t")
      val fast = graft.ops.Graph.triangles(df, "s", "t")
        .as[(Long, Long, Long)].collect().toSeq.sorted
      // naive definition: canonical undirected edge set, a < b < c
      val canon = es.filter { case (u, v) => u != v }
        .map { case (u, v) => (math.min(u, v), math.max(u, v)) }.toSet
      val nodes = canon.flatMap { case (u, v) => Set(u, v) }.toSeq.sorted
      val naive = for {
        a <- nodes; b <- nodes if a < b && canon((a, b))
        c <- nodes if b < c && canon((b, c)) && canon((a, c))
      } yield (a, b, c)
      assert(fast === naive.sorted)
    }
  }

  test("capBlockRows: oversized groups vanish, survivors pass untouched, audit is the exact complement") {
    val rows: Gen[List[(String, Long)]] =
      Gen.listOf(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0L, 99L)))
    check(rows) { rs =>
      val df = rs.toDF("blk", "id")
      val maxBlock = 4
      val sizes = rs.groupBy(_._1).view.mapValues(_.size).toMap
      val kept = Dedup.capBlockRows(df, Seq("blk"), maxBlock)
        .as[(String, Long)].collect().toSeq.sorted
      val expected = rs.filter(r => sizes(r._1) <= maxBlock).sorted
      assert(kept === expected)
      val audit = Dedup.oversizedBlocks(df, Seq("blk"), maxBlock)
        .as[(String, Long)].collect().toMap
      assert(audit === sizes.filter(_._2 > maxBlock)
        .map { case (k, v) => (k, v.toLong) })
    }
  }

  test("goldenRecord: per-column latest-non-null, independent of row order") {
    // each id gets versioned rows with randomly-null payloads; the
    // golden value per column must be the value at the highest version
    // where it is non-null, regardless of input order (aggregate
    // commutativity — the shuffle can deliver rows in any order)
    val hist: Gen[List[(Long, Long, Option[String])]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 9L),
        Gen.option(Gen.oneOf("x", "y", "z"))))
    check(hist) { h0 =>
      // versions unique per id (the documented caller contract)
      val h = h0.groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val df = h.toDF("id", "version", "payload")
      val out = graft.ops.Snapshot
        .goldenRecord(df, "id", "version", Seq("payload"))
        .select("id", "payload", "n_versions", "latest_version")
        .as[(Long, Option[String], Long, Long)].collect().toSeq.sorted
      val expect = h.groupBy(_._1).toSeq.map { case (id, rows) =>
        val nonNull = rows.filter(_._3.isDefined)
        val pick = if (nonNull.isEmpty) None
          else nonNull.maxBy(_._2)._3
        (id, pick, rows.size.toLong, rows.map(_._2).max)
      }.sorted
      assert(out === expect)
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(h)
      val out2 = graft.ops.Snapshot
        .goldenRecord(shuffled.toDF("id", "version", "payload"),
          "id", "version", Seq("payload"))
        .select("id", "payload", "n_versions", "latest_version")
        .as[(Long, Option[String], Long, Long)].collect().toSeq.sorted
      assert(out2 === out)
    }
  }

  test("filter-then-join == join-then-filter (selection pushdown soundness)") {
    check(Gen.zip(rows, rows)) { case (l, r) =>
      val lf = l.toDF("k", "v")
      val rf = r.toDF("k", "w")
      val a = lf.filter($"v" > 4).join(rf, Seq("k"))
        .as[(Long, Int, Int)].collect().sorted.toSeq
      val b = lf.join(rf, Seq("k")).filter($"v" > 4)
        .as[(Long, Int, Int)].collect().sorted.toSeq
      assert(a === b)
    }
  }

  test("join associativity (the reference's 42-count law, arbitrary inputs)") {
    check(Gen.zip(rows, rows, rows)) { case (x, y, z) =>
      val xf = x.toDF("k", "a"); val yf = y.toDF("k", "b")
      val zf = z.toDF("k", "c")
      val left = xf.join(yf, Seq("k")).join(zf, Seq("k"))
      val right = xf.join(yf.join(zf, Seq("k")), Seq("k"))
      assert(left.count() === right.count())
    }
  }

  test("RA-string select equals the combinator door on arbitrary predicates") {
    // The parser must be a pure LOWERING: for any comparator and
    // threshold, \select_{age <op> n}(Person) through the text door and
    // scan("Person").select(...) through the combinator door agree.
    lazy val engine =
      new graft.api.Engine(spark, pizzaDd, pizzaDir, format = "csv")
    val ops = Seq(
      ("=", (c: org.apache.spark.sql.Column, n: Int) => c === n),
      ("<>", (c: org.apache.spark.sql.Column, n: Int) => c =!= n),
      ("<", (c: org.apache.spark.sql.Column, n: Int) => c < n),
      ("<=", (c: org.apache.spark.sql.Column, n: Int) => c <= n),
      (">", (c: org.apache.spark.sql.Column, n: Int) => c > n),
      (">=", (c: org.apache.spark.sql.Column, n: Int) => c >= n))
    check(Gen.zip(Gen.oneOf(ops), Gen.choose(10, 50)), n = 10) {
      case ((opStr, opFn), n) =>
        val viaText =
          engine.ra(s"""\\select_{Person.age $opStr $n}(Person);""").count()
        val viaCombinator =
          engine.scan("Person").select(opFn(col("age"), n)).toDF.count()
        assert(viaText === viaCombinator, s"op $opStr n=$n")
    }
  }

  test("project-distinct is idempotent (reference set semantics)") {
    check(rows) { l =>
      val once = l.toDF("k", "v").select("k").distinct()
      assert(once.count() === once.distinct().count())
    }
  }

  test("union/intersect/except agree with Scala set algebra") {
    check(Gen.zip(rows, rows)) { case (l, r) =>
      val lf = l.toDF("k", "v").distinct()
      val rf = r.toDF("k", "v").distinct()
      val ls = l.toSet; val rs = r.toSet
      assert(lf.union(rf).distinct().count() === (ls | rs).size.toLong)
      assert(lf.intersect(rf).count() === (ls & rs).size.toLong)
      assert(lf.except(rf).count() === (ls -- rs).size.toLong)
    }
  }

  test("saltedJoin equals plain join for any inputs and salt") {
    check(Gen.zip(rows, rows, Gen.choose(2, 9))) { case (l, r, salt) =>
      val lf = l.toDF("k", "v")
      val rf = r.map { case (k, w) => (k, s"w$w") }.distinct.toDF("k", "name")
      val plain = lf.join(rf, Seq("k"))
        .as[(Long, Int, String)].collect().sorted.toSeq
      val salted = Skew.saltedJoin(lf, rf, "k", salt)
        .as[(Long, Int, String)].collect().sorted.toSeq
      assert(salted === plain)
    }
  }

  test("exactByKey partitions the input: group sizes sum to row count") {
    check(rows) { l =>
      if (l.nonEmpty) {
        val df = l.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
          .toDF("k", "v", "id")
        val agg = Dedup.exactByKey(df, Seq("k"), "id")
        assert(agg.agg(sum($"n_dups")).as[Long].head() === l.size.toLong)
      }
    }
  }

  test("jaccard is 1 on self, symmetric, in [0,1]") {
    val texts = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e"))
      .map(_.mkString(" "))
    check(Gen.zip(texts, texts)) { case (t1, t2) =>
      val df = Seq((t1, t2)).toDF("x", "y").select(
        TextOps.jaccard(TextOps.shingles(col("x"), 1),
          TextOps.shingles(col("y"), 1)).as("xy"),
        TextOps.jaccard(TextOps.shingles(col("y"), 1),
          TextOps.shingles(col("x"), 1)).as("yx"),
        TextOps.jaccard(TextOps.shingles(col("x"), 1),
          TextOps.shingles(col("x"), 1)).as("xx"))
      val (xy, yx, xx) = df.as[(Double, Double, Double)].head()
      assert(xy === yx)
      assert(xx === 1.0)
      assert(xy >= 0.0 && xy <= 1.0)
    }
  }

  private val docTexts: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
      .map(_.mkString(" "))

  test("chunk reconstructs the document: de-overlapped chunks == words") {
    // every word appears exactly once after removing the `overlap` words
    // each non-first chunk repeats — the law that pins boundary math for
    // ANY window/overlap/doc-length combination
    val gen = Gen.zip(docTexts, Gen.choose(2, 6), Gen.choose(0, 1))
    check(gen, n = 8) { case (text, window, overlap) =>
      val df = Seq((1L, text)).toDF("id", "text")
      val chunks = TextOps.chunk(df, "id", "text", window, overlap)
        .orderBy("chunk_idx")
        .select("chunk_text").as[String].collect()
      val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
        val w = c.split(" ")
        if (i == 0) w else w.drop(overlap)
      }
      assert(rebuilt.toSeq === text.split(" ").toSeq,
        s"window=$window overlap=$overlap text='$text'")
    }
  }

  test("mixtureSample keep-sets are nested as the weight grows") {
    // content-keyed sampling must be MONOTONE: raising a source's weight
    // only ADDS documents, never swaps them (fingerprint bucket < pct)
    check(Gen.listOf(docTexts), n = 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s") }
        .toDF("id", "text", "source")
      val at30 = TextOps.mixtureSample(df, "text", "source", Map("s" -> 30))
        .select("id").as[Long].collect().toSet
      val at70 = TextOps.mixtureSample(df, "text", "source", Map("s" -> 70))
        .select("id").as[Long].collect().toSet
      assert(at30.subsetOf(at70))
      val at100 = TextOps.mixtureSample(df, "text", "source", Map("s" -> 100))
        .select("id").as[Long].collect().toSet
      assert(at100.size === texts.size)
    }
  }

  test("shuffleShard is a permutation: unique (shard,pos), dense, hash-keyed") {
    // for ANY corpus and shard count: every row gets exactly one slot,
    // slots are dense per shard, and the shard equals the salted
    // fingerprint mod n computed independently — the law that makes the
    // export order reproducible across engines
    val gen = Gen.zip(Gen.nonEmptyListOf(docTexts), Gen.choose(1, 5))
    check(gen, n = 5) { case (texts, nShards) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = TextOps.shuffleShard(df, "doc_id", "text", nShards)
        .select(col("doc_id"), col("shard"), col("pos"),
          pmod(TextOps.fingerprint(concat(lit("shard:"), col("text"))),
            lit(nShards.toLong)).as("expect"))
        .as[(Long, Long, Long, Long)].collect()
      assert(out.length === texts.size)
      assert(out.forall(r => r._2 === r._4), "shard == salted fp mod n")
      assert(out.map(r => (r._2, r._3)).distinct.length === out.length,
        "slots are unique")
      out.groupBy(_._2).foreach { case (_, rs) =>
        assert(rs.map(_._3).sorted.toSeq === (1L to rs.length).toSeq) }
    }
  }

  test("packSequences conserves tokens: offsets gap-free, spans tile the shard") {
    // per shard: offsets are the exclusive prefix sum (no gaps, no
    // overlaps) and the last span ends at the shard's total token count
    // — packing never loses or duplicates a token, for ANY corpus
    val gen = Gen.zip(Gen.nonEmptyListOf(docTexts), Gen.choose(1, 3),
      Gen.choose(2, 9))
    check(gen, n = 5) { case (texts, nShards, ctx) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = TextOps.packSequences(
        TextOps.shuffleShard(df, "doc_id", "text", nShards),
        "text", "shard", "pos", ctx)
        .select("shard", "pos", "n_tokens", "tok_offset", "seq_first", "seq_last")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      out.groupBy(_._1).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_._2)
        assert(sorted.head._4 === 0L)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(b._4 === a._4 + a._3, "gap-free")
          case _ => ()
        }
        val last = sorted.last
        assert(last._4 + last._3 === rs.map(_._3).sum, "spans tile the shard")
      }
      out.foreach { case (_, _, n, off, first, last) =>
        assert(first === off / ctx && last === (off + n - 1) / ctx)
      }
    }
  }

  test("admitBatch ∪ flagged partitions the batch for any corpora") {
    // incremental dedup never loses a document: every batch id is either
    // flagged against the base or admitted, never both, never neither
    val gen = Gen.zip(Gen.nonEmptyListOf(docTexts), Gen.nonEmptyListOf(docTexts))
    check(gen, n = 4) { case (baseTexts, batchTexts) =>
      val base = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val batch = batchTexts.zipWithIndex
        .map { case (t, i) => (1000L + i, t) }.toDF("id", "text")
      val pairs = Dedup.crossNearDup(batch, base, "id", "text",
        threshold = 0.3, shingleN = 1)
      val flagged = pairs.select("new_id").as[Long].collect().toSet
      val admitted = Dedup.admitBatch(batch, "id", pairs)
        .select("id").as[Long].collect().toSet
      val all = batchTexts.indices.map(i => 1000L + i).toSet
      assert((flagged union admitted) === all)
      assert((flagged intersect admitted) === Set.empty[Long])
    }
  }

  test("native portable_fingerprint == interpreted HOF on arbitrary strings") {
    // the native expression replaced `aggregate(split(text, ""), …)`
    // (round-7 verdict #1); this law pins them IDENTICAL — same split
    // semantics (one element per code point, surrogate pairs together),
    // same ascii() code-point value, same mod arithmetic — so the swap
    // can never drift from the q27/q55/q59 DuckDB oracles
    val hof = (text: org.apache.spark.sql.Column) =>
      aggregate(split(text, ""), lit(0L),
        (acc, c) => (acc * 31 + ascii(c)) % 1000000007L)
    val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf(" ", "\t", "\n", "  "),
      Gen.oneOf("é", "日", "本", "😀", "ß", "é", "é")))
      .map(_.mkString)
    check(anyText, n = 12) { text =>
      val (nat, interp) = Seq(Tuple1(text)).toDF("text")
        .select(TextOps.fingerprint($"text"), hof($"text"))
        .as[(Long, Long)].head()
      assert(nat === interp, s"fingerprint mismatch for ${text.take(40)}")
    }
    // and the empty string, which the generator rarely emits
    val (n0, i0) = Seq(Tuple1("")).toDF("text")
      .select(TextOps.fingerprint($"text"), hof($"text"))
      .as[(Long, Long)].head()
    assert(n0 === 0L && i0 === 0L)
  }

  test("native text_canon == independent Java-regex model; idempotent on arbitrary strings") {
    // the independent formulation: JDK Normalizer + ROOT lowercase +
    // java.util.regex trim/collapse (regex \s == the expression's
    // explicit whitespace set). Pinning the codegen'd loop against this
    // model is what lets the q115 oracle replay it with nfc_normalize +
    // lower + regexp_replace in DuckDB
    def model(s: String): String =
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        .toLowerCase(java.util.Locale.ROOT)
        .replaceAll("^\\s+|\\s+$", "").replaceAll("\\s+", " ")
    val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf(" ", "\t", "\n", "  "),
      Gen.oneOf("é", "é", "Å", "Å", "日", "ß", "X", "QU")))
      .map(_.mkString)
    check(anyText, n = 12) { text =>
      val (nat, again) = Seq(Tuple1(text)).toDF("text")
        .select(TextOps.canonText($"text"),
          TextOps.canonText(TextOps.canonText($"text")))
        .as[(String, String)].head()
      assert(nat === model(text), s"canon mismatch for ${text.take(40)}")
      assert(again === nat, "text_canon must be idempotent")
    }
    val hand = Seq(Tuple1("  CaFÉ\t \nx ")).toDF("t")
      .select(TextOps.canonText($"t")).as[String].head()
    assert(hand === "café x")
  }

  test("native rolling_fingerprints == naive per-window fold on arbitrary token arrays") {
    // the native expression computes stride-1 window fingerprints with an
    // O(tokens) ROLLING update (drop leading token via P^(w-1), shift,
    // add entering token); this law pins it against the O(tokens×window)
    // naive recompute — the exact fold the DuckDB oracle replays with
    // list_reduce — so the rolling shortcut can never drift from the
    // q103 oracle arithmetic
    val M = 1000000007L; val P = 1000003L
    def ph(s: String): Long = {
      var acc = 0L; var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % M
        i += Character.charCount(cp)
      }
      acc
    }
    def naive(tokens: List[String], w: Int): Seq[(Int, Long)] = {
      val b = tokens.map(t => ph(t) + 1)
      (0 to tokens.length - w).map(s =>
        (s, b.slice(s, s + w).foldLeft(0L)((acc, x) => (acc * P + x) % M)))
    }
    val token: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)), Gen.const(""), Gen.const("日本"),
      Gen.oneOf("the", "a", "doc"))
    val input: Gen[(List[String], Int)] =
      Gen.zip(Gen.listOf(token), Gen.choose(1, 5))
    check(input, n = 12) { case (tokens, w) =>
      val native = Seq(Tuple1(tokens)).toDF("toks")
        .select(call_function("rolling_fingerprints", $"toks", lit(w)))
        .as[Seq[(Int, Long)]].head()
      assert(native === naive(tokens, w),
        s"rolling mismatch for w=$w tokens=${tokens.take(8)}")
    }
  }

  test("native pq_adc == HOF lookup-sum on arbitrary codes and luts") {
    // pq_adc(codes, lut, ksub) = Σ_j lut[j*ksub + codes[j]] — the law pins
    // the codegen'd loop against an element_at/aggregate combinator
    // formulation, plus the null contracts the combinator can't express
    // (out-of-range code, length-mismatched lut → NULL, never garbage)
    val gen = for {
      m <- Gen.choose(1, 8)
      ksub <- Gen.choose(1, 16)
      codes <- Gen.listOfN(m, Gen.choose(0, ksub - 1))
      lut <- Gen.listOfN(m * ksub, Gen.choose(-10.0, 10.0))
    } yield (ksub, codes, lut)
    check(gen, n = 10) { case (ksub, codes, lut) =>
      val df = Seq((codes, lut)).toDF("code", "lut")
      val hof = aggregate(
        zip_with(col("code"), sequence(lit(0), lit(codes.length - 1)),
          (c, j) => element_at(col("lut"), j * ksub + c + 1)),
        lit(0.0), (a, x) => a + x)
      val (nat, interp) = df.select(
        call_function("pq_adc", col("code"), col("lut"), lit(ksub)),
        hof).as[(Double, Double)].head()
      assert(math.abs(nat - interp) < 1e-12,
        s"pq_adc mismatch: $nat vs $interp (ksub=$ksub codes=$codes)")
    }
    // corruption contract: out-of-range code and short lut are NULL
    val bad = Seq((Seq(0, 5), Seq(1.0, 2.0, 3.0, 4.0))).toDF("code", "lut")
    assert(bad.select(call_function("pq_adc", col("code"), col("lut"), lit(2))
      .isNull).as[Boolean].head())
    val short = Seq((Seq(0, 1), Seq(1.0, 2.0, 3.0))).toDF("code", "lut")
    assert(short.select(call_function("pq_adc", col("code"), col("lut"), lit(2))
      .isNull).as[Boolean].head())
  }

  test("native word_tokens == regex split formulation on arbitrary strings") {
    // tokens() swapped the two-regex-engine formulation for a native
    // single-pass scan; this law pins them IDENTICAL — edge stripping,
    // interior \s+ runs, and the empty/all-whitespace → [""] degenerate
    // case — so the swap can never drift from the q38/q60 oracles
    val regexForm = (text: org.apache.spark.sql.Column) =>
      split(regexp_replace(text, "^\\s+|\\s+$", ""), "\\s+")
    val messyText: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "\r\n", "  ", "", "\f")))
      .map(_.mkString)
    check(messyText, n = 12) { text =>
      val (nat, regex) = Seq(Tuple1(text)).toDF("text")
        .select(TextOps.tokens($"text"), regexForm($"text"))
        .as[(Seq[String], Seq[String])].head()
      assert(nat === regex, s"tokens mismatch for ${text.replace("\n", "\\n")}")
    }
    val (n0, r0) = Seq(Tuple1("")).toDF("text")
      .select(TextOps.tokens($"text"), regexForm($"text"))
      .as[(Seq[String], Seq[String])].head()
    assert(n0 === Seq("") && r0 === Seq(""))
  }

  test("native stopword_stats == interpreted filter formulation on arbitrary strings") {
    // stopwordRatio swapped a per-token interpreted filter lambda for a
    // one-pass native scan; this law pins the ratio identical —
    // including the empty/all-whitespace degenerate denominator of 1
    val combinator = (text: org.apache.spark.sql.Column) =>
      size(filter(TextOps.tokens(text),
        t => t.isin("the", "a", "an", "of", "and", "is", "to")))
        .cast("double") /
        greatest(size(TextOps.tokens(text)), lit(1)).cast("double")
    val stopwordy: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.oneOf("the", "a", "an", "of", "and", "is", "to"),
      Gen.oneOf("word", "query", "spark", "THE", "a,"),
      Gen.oneOf(" ", "\t", "\n", "  ", "")))
      .map(_.mkString(" "))
    check(stopwordy, n = 12) { text =>
      val (nat, interp) = Seq(Tuple1(text)).toDF("text")
        .select(TextOps.stopwordRatio($"text"), combinator($"text"))
        .as[(Double, Double)].head()
      assert(nat === interp, s"stopword ratio mismatch for '$text'")
    }
    val (n0, i0) = Seq(Tuple1("")).toDF("text")
      .select(TextOps.stopwordRatio($"text"), combinator($"text"))
      .as[(Double, Double)].head()
    assert(n0 === 0.0 && i0 === 0.0)
  }

  test("native bpe_encode == reference greedy-merge implementation on arbitrary inputs") {
    // the codegen'd BpeEncode loop vs a straight-line Scala transcription
    // of Sennrich's algorithm (chars + </w>, each merge one greedy
    // left-to-right non-overlapping pass, rank order) — random texts AND
    // random merge tables, so the law covers OOV words, degenerate
    // merges that never fire, and chained merges over merged symbols
    def reference(text: String, merges: Seq[(String, String)]): Seq[String] = {
      def word(w: String): Seq[String] = {
        var syms: Seq[String] = w.map(_.toString) :+ "</w>"
        merges.foreach { case (a, b) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          syms = out.toSeq
        }
        syms
      }
      val ws = text.trim.split("\\s+", -1).toSeq
      (if (text.trim.isEmpty) Seq("") else ws).flatMap(word)
    }
    val sym: Gen[String] = Gen.oneOf("a", "b", "c", "ab", "bc", "</w>",
      "a</w>", "b</w>")
    val cases = Gen.zip(
      Gen.listOf(Gen.oneOf("ab", "abc", "aab", "cab", "bba", "a", ""))
        .map(_.mkString(" ")),
      Gen.listOf(Gen.zip(sym, sym)).map(_.take(6)))
    check(cases, n = 12) { case (text, merges) =>
      val nat = Seq(Tuple1(text)).toDF("text")
        .select(TextOps.bpeEncode($"text", merges))
        .as[Seq[String]].head()
      assert(nat === reference(text, merges),
        s"bpe_encode mismatch for '$text' under $merges")
    }
  }

  test("bpeMerges round-r decision is reproducible from the encoder state after r-1") {
    // the learner≡encoder consistency law the BpeEncode scaladoc
    // promises: re-encode the corpus words under the FIRST r-1 learned
    // merges, count adjacent pairs weighted by word frequency, and the
    // (n desc, a, b) argmax must be exactly merge r with its recorded
    // count — if the encoder's replay semantics drifted from the
    // learner's training-state evolution, some round would disagree
    val corpus = Gen.nonEmptyListOf(
      Gen.oneOf("low", "lower", "lowest", "newest", "new", "wide"))
      .map(ws => Seq((1L, ws.mkString(" "))))
    check(corpus, n = 4) { rows =>
      val df = rows.toDF("doc_id", "text")
      val learned = TextOps.bpeMerges(df, "text", numMerges = 4)
        .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
      learned.foreach { case (r, a, b, n) =>
        val prefix = learned.take(r - 1).map(m => (m._2, m._3))
        val replayed = df
          .select(explode(TextOps.tokens($"text")).as("word"))
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .select($"cnt", TextOps.bpeEncode($"word", prefix).as("s"))
          .filter(size($"s") > 1)
          .select($"cnt", explode(zip_with(
            slice($"s", lit(1), size($"s") - 1),
            slice($"s", lit(2), size($"s") - 1),
            (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
          .groupBy($"p.a".as("a"), $"p.b".as("b"))
          .agg(sum($"cnt").as("n"))
          .orderBy($"n".desc, $"a".asc, $"b".asc)
          .limit(1).as[(String, String, Long)].head()
        assert(replayed === ((a, b, n)),
          s"round $r: learner chose ($a,$b,$n), replay says $replayed")
      }
    }
  }

  test("stratifiedSample prune is invisible for arbitrary corpora and n") {
    // texts built from a tiny alphabet maximize suffix/prefix clustering
    // — the adversarial shape for the threshold prune
    val corpora = Gen.zip(
      Gen.nonEmptyListOf(Gen.zip(
        Gen.oneOf("s1", "s2", "s3"),
        Gen.nonEmptyListOf(Gen.oneOf("aa", "ab", "b")).map(_.mkString(" ")))),
      Gen.choose(1, 4))
    check(corpora, n = 5) { case (rows, k) =>
      val df = rows.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("doc_id", "src", "text")
      val out = TextOps.stratifiedSample(df, "src", "doc_id", "text", n = k)
        .select("src", "rnk", "doc_id")
        .as[(String, Int, Long)].collect().toSet
      val fp0 = TextOps.fingerprint(concat(lit("strat:"), $"text"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"src")
        .orderBy(pmod(fp0 * fp0, lit(1000000007L)).asc, $"doc_id".asc)
      val naive = df.withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= k).select("src", "rnk", "doc_id")
        .as[(String, Int, Long)].collect().toSet
      assert(out === naive)
    }
  }

  test("sourceDrift equals a Scala reference implementation on arbitrary corpora") {
    val corpora = Gen.nonEmptyListOf(Gen.zip(
      Gen.oneOf("s1", "s2", "s3"),
      Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))))
    check(corpora, n = 5) { rows =>
      val df = rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("doc_id", "src", "text")
      val out = TextOps.sourceDrift(df, "src", "text")
        .as[(String, Long, Double)].collect()
        .map { case (s, n, k) => s -> ((n, k)) }.toMap
      // plain-Scala reference: MLE KL with the operator's 9dp/4dp rounds
      val toks = rows.map { case (s, t) => s -> t.split("\\s+").toSeq }
      val corpusCnt = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      val tc = toks.map(_._2.size).sum.toDouble
      def r(x: Double, sc: Int) = BigDecimal(x)
        .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ref = toks.groupBy(_._1).map { case (s, docs) =>
        val words = docs.flatMap(_._2)
        val ts = words.size.toDouble
        val kl = words.groupBy(identity).map { case (w, occ) =>
          val ps = occ.size / ts
          r(ps * math.log(ps / (corpusCnt(w) / tc)), 9)
        }.sum
        s -> ((words.size.toLong, r(kl, 4)))
      }
      assert(out === ref)
      out.values.foreach { case (_, kl) =>
        assert(kl >= -0.0001, s"KL must be ~non-negative, got $kl") }
    }
  }

  test("vocabOovRate: full vocabulary means zero OOV for any corpus") {
    val corpora = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf("aa", "bb", "cc")).map(_.mkString(" ")))
    check(corpora, n = 5) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = TextOps.vocabOovRate(df, "doc_id", "text", vocabSize = 3)
        .as[(Long, Long, Long, Double)].collect()
      assert(out.length === texts.length)
      out.foreach { case (_, n, oov, frac) =>
        assert(oov === 0L && frac === 0.0 && n >= 1L,
          "a vocabulary covering every term admits no OOV") }
    }
  }

  test("rrfFuse order is invariant under self-duplication of a ranking") {
    // fusing a system with itself doubles every score — the ORDER (and
    // so the top-k membership and ranks) must not move
    val rankings = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 3L), Gen.choose(1L, 30L)))
      .map(_.distinct.groupBy(_._1).toSeq.flatMap { case (q, ds) =>
        ds.map(_._2).distinct.zipWithIndex.map { case (d, i) => (q, i + 1, d) }
      })
    check(rankings, n = 5) { rows =>
      val r = rows.toDF("query_id", "rnk", "doc_id")
      val once = graft.ops.Retrieval.rrfFuse(Seq(r), topK = 5)
        .select("query_id", "rnk", "doc_id")
        .as[(Long, Int, Long)].collect().toSet
      val twice = graft.ops.Retrieval.rrfFuse(Seq(r, r), topK = 5)
        .select("query_id", "rnk", "doc_id")
        .as[(Long, Int, Long)].collect().toSet
      assert(once === twice)
    }
  }

  test("repetitionStats fractions are in [0,1] for any whitespace shape") {
    // regression class: the first cut mixed a literal-space tokenizer
    // with the \s+ tokenizer and produced NEGATIVE dup fractions on
    // multi-space/tab texts
    val messy = Gen.nonEmptyListOf(
      Gen.oneOf("a", "b", "c", "a  b", "a\tb", " a", "b "))
      .map(_.mkString(" "))
    check(messy, n = 8) { text =>
      val (d, t) = TextOps.repetitionStats(
        Seq((1L, text)).toDF("id", "text"), "id", "text")
        .select("dup_word_frac", "top2gram_frac")
        .as[(Double, Double)].head()
      assert(d >= 0.0 && d <= 1.0, s"dup_word_frac=$d for '$text'")
      assert(t >= 0.0 && t <= 1.0, s"top2gram_frac=$t for '$text'")
    }
  }

  test("vec_nearest_k == reference argsort prefix; k=1 head == vec_nearest") {
    // native insertion selection vs a plain Scala sort on the SAME
    // left-to-right distance sums (bit-identical arithmetic), ties to
    // the lower index on both sides
    val vec = Gen.listOfN(4, Gen.choose(-5.0, 5.0))
    val gen = Gen.zip(Gen.listOfN(6, vec), Gen.listOfN(5, vec))
    check(gen, n = 8) { case (vs, cs) =>
      val csLit = typedLit(cs.map(_.toSeq))
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
        .select(col("id"),
          call_function("vec_nearest", col("v"), csLit).as("n1"),
          call_function("vec_nearest_k", col("v"), csLit, lit(3)).as("nk"))
        .orderBy("id").collect()
      rows.zip(vs).foreach { case (r, v) =>
        def d2(c: Seq[Double]): Double =
          v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + (x - y) * (x - y) }
        val ref = cs.indices.sortBy(i => (d2(cs(i)), i)).take(3)
        assert(r.getSeq[Int](2) === ref)
        assert(r.getInt(1) === ref.head)
      }
    }
  }

  test("dedup_units == the index-aware filter combinator on arbitrary texts") {
    // native one-pass hash-set keep-first vs the interpreted
    // array_position formulation it replaced — including empty units
    // from leading/trailing/double separators and the empty document
    val unit = Gen.oneOf("a", "b", "aa", "", "c d")
    val texts = Gen.listOf(Gen.listOf(unit).map(_.mkString("\n")))
    check(Gen.zip(texts, Gen.oneOf("\n", " ", "."))) { case (ts, sep) =>
      val df = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = Dedup.intraDocDedup(df, "doc_id", "text", sep)
        .as[(Long, Int, Int, String)].collect().toSet
      val hof = Dedup.intraDocDedupHof(df, "doc_id", "text", sep)
        .as[(Long, Int, Int, String)].collect().toSet
      assert(native === hof)
    }
  }

  test("jaro_winkler laws: range, symmetry, identity iff equal, empty convention, codegen == object method") {
    import graft.expr.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.compute(UTF8String.fromString(a),
        UTF8String.fromString(b))
    val strs = Gen.listOfN(2,
      Gen.stringOf(Gen.oneOf(('a' to 'e') ++ Seq('-', '1', '2'))))
    check(strs, n = 40) { case List(a, b) =>
      val s = jw(a, b)
      // range
      assert(s >= 0.0 && s <= 1.0, s"jw('$a','$b') = $s out of [0,1]")
      // symmetry — matching is greedy but the measure is symmetric
      assert(s === jw(b, a), s"asymmetric on '$a'/'$b'")
      // identity on nonempty; DuckDB's empty convention otherwise
      if (a.nonEmpty) assert(jw(a, a) === 1.0)
      if (a.isEmpty || b.isEmpty) assert(s === 0.0)
      // equality detection: 1.0 only for equal strings
      if (s == 1.0 && a.nonEmpty) assert(a === b)
      case _ =>
    }
    // the expression matches the object method through codegen
    val pairs = (1 to 20).map(i =>
      (sample(strs, 0xBEEFL + i): @unchecked) match {
        case List(a, b) => (a, b)
      })
    val viaExpr = pairs.toDF("a", "b")
      .selectExpr("jaro_winkler(a, b)").as[Double].collect().toSeq
    assert(viaExpr === pairs.map(p => jw(p._1, p._2)))
  }

  test("hammingNearDup == brute force at every radius <= 3 on random fingerprints") {
    import graft.ops.Multimodal
    // random 64-bit hashes as 32-bit halves, biased to collide (few
    // distinct values) so pairs at every distance 0..3+ populate
    val hashes: Gen[List[(Long, Long, Long)]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 30L),
        Gen.choose(0L, 15L).map(_ * 0x11111111L % 0xFFFFFFFFL),
        Gen.oneOf(Seq(0L, 1L, 2L, 3L, 7L, 0x10000L, 0x30001L,
          0xFFFFFFFFL, 0xAAAA5555L))))
    check(hashes, n = 8) { rows =>
      // one row per id (the operator's id contract)
      val byId = rows.groupBy(_._1).map(_._2.head).toList
      val df = byId.toDF("id", "hi", "lo")
      for (d <- 0L to 3L) {
        val got = Multimodal.hammingNearDup(df, "id", "hi", "lo",
            d.toInt, maxBucket = 10000)
          .as[(Long, Long, Long)].collect().toSet
        val want = (for {
          a <- byId; b <- byId if a._1 < b._1
          h = java.lang.Long.bitCount(a._2 ^ b._2) +
            java.lang.Long.bitCount(a._3 ^ b._3)
          if h <= d
        } yield (a._1, b._1, h.toLong)).toSet
        assert(got === want,
          s"radius $d mismatch on ${byId.size} fingerprints")
      }
    }
  }

  test("containmentJoin == brute force at random thresholds on random token sets") {
    import graft.ops.Dedup
    val sets: Gen[(List[(Long, List[String])], Long)] = Gen.zip(
      Gen.listOf(Gen.zip(Gen.choose(0L, 12L),
        Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f")))),
      Gen.choose(1L, 10000L))
    check(sets, n = 8) { case (rows, bp) =>
      val byId = rows.groupBy(_._1).map(_._2.head).toList
        .map { case (id, ts) => (id, ts.distinct) }
        .filter(_._2.nonEmpty)
      val df = byId.toDF("id", "toks")
      val got = Dedup.containmentJoin(df, "id", "toks", bp,
          maxPosting = 10000)
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = (for {
        a <- byId; b <- byId if a._1 != b._1
        i = a._2.toSet.intersect(b._2.toSet).size.toLong
        if i * 10000L >= bp * a._2.size
      } yield (a._1, b._1, i, i * 10000L / a._2.size)).toSet
      assert(got === want, s"bp=$bp mismatch on ${byId.size} sets")
    }
  }

  test("deltaJoinRetract/applyBagDelta == bag recompute on random bags with random sub-bag deletes") {
    import graft.ops.Incremental
    // random duplicate-bearing bags on a small key domain; deletes are
    // random SUB-BAGS of each base (element-indexed take, so duplicate
    // copies delete partially); inserts arbitrary — every signed
    // provenance class appears across the seeds
    val gen: Gen[(List[(Long, Int)], List[(Long, Int)],
        List[(Long, Int)], List[(Long, Int)], Int, Int)] =
      Gen.zip(
        Gen.listOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0, 3))),
        Gen.listOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0, 3))),
        Gen.listOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0, 3))),
        Gen.listOf(Gen.zip(Gen.choose(0L, 4L), Gen.choose(0, 3))),
        Gen.choose(0, 100), Gen.choose(0, 100))
    check(gen, n = 8) { case (a0, b0, insA0, insB0, pctA, pctB) =>
      def bagJoin(x: List[(Long, String)], y: List[(Long, String)]) =
        for ((k1, av) <- x; (k2, bv) <- y if k1 == k2)
          yield (k1, av, bv)
      def counts(rows: List[(Long, String, String)]) =
        rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val a = a0.map { case (k, v) => (k, s"a$v") }
      val b = b0.map { case (k, v) => (k, s"b$v") }
      val insA = insA0.map { case (k, v) => (k, s"ai$v") }
      val insB = insB0.map { case (k, v) => (k, s"bi$v") }
      val delsA = a.take(a.size * pctA / 100)
      val delsB = b.take(b.size * pctB / 100)
      val aPost = a.diff(delsA) ++ insA
      val bPost = b.diff(delsB) ++ insB
      val stored = Incremental.bagState(a.toDF("k", "av").join(
        b.toDF("k", "bv"), Seq("k")))
      val delta = Incremental.deltaJoinRetract(
        a.toDF("k", "av"), delsA.toDF("k", "av"), insA.toDF("k", "av"),
        b.toDF("k", "bv"), delsB.toDF("k", "bv"), insB.toDF("k", "bv"),
        Seq("k"))
      val maintained = Incremental.applyBagDelta(stored, delta)
        .as[(Long, String, String, Long)].collect()
        .map(r => ((r._1, r._2, r._3), r._4)).toMap
      assert(maintained === counts(bagJoin(aPost, bPost)),
        s"maintained != recompute (|a|=${a.size} |b|=${b.size} " +
          s"dels=${delsA.size}/${delsB.size})")
      // deletes are genuine sub-bags -> no phantoms anywhere
      assert(Incremental.bagDeltaAudit(stored, delta).count() === 0L)
    }
  }

  test("videoFingerprintInline == columnar videoFingerprint on random blobs of random lengths") {
    import graft.ops.Multimodal
    // random byte blobs: some multi-frame, some with trailing partial
    // slices, some below one frame — the inline row-local vote and the
    // sampleFrames-explode + aggregate form must compute the same
    // function on all of them (8x8 frames, every in {1, 2})
    val gen: Gen[(List[(Long, List[Int])], Int)] = Gen.zip(
      Gen.listOf(Gen.zip(Gen.choose(0L, 20L),
        Gen.listOfN(200, Gen.choose(0, 255)))),
      Gen.choose(1, 2))
    check(gen, n = 6) { case (rows, every) =>
      val blobs = rows.groupBy(_._1).map(_._2.head).toList
        .map { case (id, px) =>
          // vary length by id so partial and sub-frame blobs appear
          val len = (id % 4 match {
            case 0 => 0      // empty
            case 1 => 40     // sub-frame (< 64)
            case 2 => 150    // 2 frames + partial
            case _ => 192    // exactly 3 frames
          }).toInt
          (id, px.take(len).map(_.toByte).toArray)
        }
      val df = blobs.toDF("media_id", "content")
        .withColumn("kind", org.apache.spark.sql.functions.lit("video"))
      val inline = Multimodal.videoFingerprintInline(df, 8, 8, every)
        .as[(Long, Long, Long, Long)].collect().toSet
      val columnar = Multimodal.videoFingerprint(df, 8, 8, every)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(inline === columnar,
        s"inline != columnar at every=$every on ${blobs.size} blobs")
    }
  }

  test("linkPrediction == naive neighborhood arithmetic on random graphs") {
    import graft.ops.Graph
    val edges: Gen[List[(Long, Long)]] =
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    check(edges, n = 8) { es =>
      val got = Graph.linkPrediction(es.toDF("s", "t"), "s", "t",
          maxNeighbors = 1000)
        .as[(Long, Long, Long, Long)].collect().toSet
      val canon = es.filter { case (u, v) => u != v }
        .map { case (u, v) => (math.min(u, v), math.max(u, v)) }.toSet
      val nb = canon.toSeq.flatMap { case (u, v) => Seq(u -> v, v -> u) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val nodes = nb.keys.toSeq.sorted
      val want = (for {
        a <- nodes; b <- nodes if a < b && !canon((a, b))
        shared = nb(a).intersect(nb(b))
        if shared.nonEmpty
      } yield (a, b, shared.size.toLong,
        shared.toSeq.map(z => 10000L / nb(z).size).sum)).toSet
      assert(got === want, s"mismatch on ${canon.size} edges")
    }
  }
}
