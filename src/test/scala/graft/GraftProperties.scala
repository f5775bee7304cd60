package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.SortedOverlapCount
import graft.ext.Dedup

/** ScalaCheck properties over the engine's algorithmic kernels (SURVEY
  * §5.2.3) — pure expression evaluation, no Spark session, so thousands
  * of cases run in milliseconds.
  */
object GraftProperties extends Properties("graft") {

  private def overlap(a: Seq[Long], b: Seq[Long]): Int =
    SortedOverlapCount(
      Literal.create(a, ArrayType(LongType)),
      Literal.create(b, ArrayType(LongType))
    ).eval(null).asInstanceOf[Int]

  private val hashSetGen: Gen[Seq[Long]] =
    Gen.listOf(Gen.chooseNum(0L, (1L << 32) - 1)).map(_.distinct.sorted)

  property("sorted_overlap == set intersection size") =
    Prop.forAll(hashSetGen, hashSetGen) { (a, b) =>
      overlap(a, b) == a.toSet.intersect(b.toSet).size
    }

  property("sorted_overlap is symmetric and bounded") =
    Prop.forAll(hashSetGen, hashSetGen) { (a, b) =>
      val ov = overlap(a, b)
      ov == overlap(b, a) && ov <= math.min(a.size, b.size) && ov >= 0
    }

  property("jaccard by inclusion-exclusion is in [0,1], 1 on self") =
    Prop.forAll(hashSetGen, hashSetGen) { (a, b) =>
      val ov = overlap(a, b)
      val denom = a.size + b.size - ov
      val jac = if (denom == 0) 1.0 else ov.toDouble / denom
      (jac >= 0.0 && jac <= 1.0) &&
        (a.isEmpty || overlap(a, a) == a.size)
    }

  private val h32Gen = Gen.chooseNum(0L, (1L << 32) - 1)

  // mirrors Dedup.shingleHashes: Horner rolling polynomial, mod each step
  private def horner(hs: Seq[Long]): Long =
    hs.tail.foldLeft(hs.head) { (acc, h) =>
      val step = acc * Dedup.ShingleA + h
      assert(step >= 0, s"overflow: $acc * ShingleA + $h")
      step % Dedup.MinhashP
    }

  property("shingle-combination hash is overflow-free and in [0, p)") =
    Prop.forAll(h32Gen, h32Gen, h32Gen) { (h1, h2, h3) =>
      val m = horner(Seq(h1, h2, h3))
      m >= 0 && m < Dedup.MinhashP
    }

  property("shingle hash is position-distinct for n=4 (leading-pair swap)") =
    Prop.forAll(h32Gen, h32Gen, h32Gen, h32Gen) { (h1, h2, h3, h4) =>
      // swapping the two LEADING tokens must change the hash (the failure
      // mode of a flat-coefficient scheme); collisions only when the token
      // hashes are congruent mod p
      (h1 - h2) % Dedup.MinhashP == 0 ||
        horner(Seq(h1, h2, h3, h4)) != horner(Seq(h2, h1, h3, h4))
    }

  // mirrors Layout.zorder2 (sum of disjoint bit positions == OR)
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(j => (((x >> j) & 1L) << (2 * j)) | (((y >> j) & 1L) << (2 * j + 1)))
      .reduce(_ | _)

  property("morton interleave is a bijection on the 16-bit grid") =
    Prop.forAll(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)) { (x, y) =>
      val z = morton(x, y, 16)
      def lane(off: Int): Long =
        (0 until 16).map(j => ((z >> (2 * j + off)) & 1L) << j).reduce(_ | _)
      lane(0) == x && lane(1) == y
    }

  property("minhash affine sig: min over multiset == min over distinct set") =
    Prop.forAll(Gen.nonEmptyListOf(h32Gen), Gen.chooseNum(0, Dedup.MinhashK - 1)) {
      (hs, i) =>
        def sig(xs: Seq[Long]): Long =
          xs.map(x => Math.floorMod(Dedup.minhashA(i) * x + Dedup.minhashB(i),
            Dedup.MinhashP)).min
        sig(hs) == sig(hs.distinct)
    }

  private def simhashNative(hs: Seq[Long]): Long =
    graft.functions.Simhash32(Literal.create(hs, ArrayType(LongType)))
      .eval(null).asInstanceOf[Long]

  property("Simhash32 native == sign-of-±1-sum definition") =
    Prop.forAll(Gen.listOf(h32Gen)) { hs =>
      val expect = (0 until 32).map { j =>
        val s = hs.map(h => ((h >> j) & 1L) * 2 - 1).sum
        if (s >= 0) 1L << j else 0L
      }.sum
      simhashNative(hs) == expect
    }

  property("simhash banding has exact recall at hamming radius 3") =
    // flip up to 3 random bit positions: the two sketches must still agree
    // on at least one of the 4 8-bit bands (pigeonhole: 3 flips can touch
    // at most 3 bands)
    Prop.forAll(h32Gen, Gen.listOfN(3, Gen.chooseNum(0, 31))) { (sk, flips) =>
      val other = flips.distinct.foldLeft(sk)((s, j) => s ^ (1L << j))
      (0 until 4).exists(b => ((sk >> (b * 8)) & 255L) == ((other >> (b * 8)) & 255L))
    }

  // ---- DataSourceV2 connector kernels (sources/EventsSource) ----

  private val cfgGen: Gen[graft.sources.EventsConfig] = for {
    rate <- Gen.chooseNum(1.0, 100000.0)
    start <- Gen.chooseNum(0L, 2000000000000L)
    size <- Gen.chooseNum(0, 400)
  } yield graft.sources.EventsConfig(0L, rate, start, size, 4)

  property("EventsSource pacing: created_ts follows the absolute schedule, monotone") =
    Prop.forAll(Gen.chooseNum(0L, 1000000L), cfgGen) { (i, cfg) =>
      val r0 = graft.sources.EventsSource.row(i, cfg)
      val r1 = graft.sources.EventsSource.row(i + 1, cfg)
      val ts0 = r0.getLong(1)
      ts0 == cfg.startMs + (i * 1000.0 / cfg.rateEps).toLong &&
        ts0 <= r1.getLong(1) &&
        r0.getInt(2) == (i % 10000).toInt &&
        r0.getDouble(4) == (i % 1000) / 10.0
    }

  property("EventsOffset json round-trips count AND pacing epoch") =
    Prop.forAll(Gen.chooseNum(0L, Long.MaxValue / 2), Gen.chooseNum(0L, Long.MaxValue / 2)) {
      (c, e) =>
        val o = graft.sources.EventsOffset(c, e)
        graft.sources.EventsOffset.parse(o.json()) == o
    }

  // --- native text scalars vs their regex reference semantics (r6) ---
  // punct_count / normalize_text replaced regexp_extract_all /
  // regexp_replace spellings (java.util.regex degrades under task
  // concurrency — see TextExpressions); these props pin bit-identity
  // against the regex semantics over a mixed alphabet including every
  // whitespace class char, punctuation, and multi-byte code points
  // (é, К, 中, 😀) plus the two special-cased ones (U+212A, U+0130).
  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    3 -> Gen.oneOf(' ', '\t', '\n', '\u000b', '\f', '\r'),
    3 -> Gen.oneOf('.', ',', '!', '_', '-', '#', '(', '\\', '"'),
    1 -> Gen.oneOf('\u00e9', '\u041a', '\u4e2d', '\u212a', '\u0130'),
    1 -> Gen.const('\ud83d'))).map { cs =>
    // pair any high surrogate into a valid emoji so the string is well-formed
    cs.mkString.replace("\ud83d", "😀")
  }

  private def utf8(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)

  property("punct_count == size(regexp_extract_all(text, class, 0))") =
    Prop.forAll(textGen) { s =>
      val expected = java.util.regex.Pattern.compile("[^a-zA-Z0-9\\s]")
        .matcher(s).results().count().toInt
      graft.functions.TextExprUtil.punctCount(utf8(s)) == expected
    }

  property("normalize_text == trim(collapse(strip(lower(text))))") =
    Prop.forAll(textGen) { s =>
      val expected = s.toLowerCase
        .replaceAll("[^a-z0-9\\s]", "").replaceAll("\\s+", " ").trim
      graft.functions.TextExprUtil.normalize(utf8(s)).toString == expected
    }

  property("EventsRange.split partitions [lo,hi) exactly: disjoint, ordered, complete") =
    Prop.forAll(Gen.chooseNum(0L, 100000L), Gen.chooseNum(0L, 100000L),
      Gen.chooseNum(1, 64)) { (a, len, n) =>
      val cfg = graft.sources.EventsConfig(0L, 1000.0, 0L, 200, n)
      val rs = graft.sources.EventsRange.split(a, a + len, n, cfg)
        .map(_.asInstanceOf[graft.sources.EventsRange])
      val covered = rs.map(r => r.hi - r.lo).sum
      val contiguous = rs.isEmpty ||
        (rs.head.lo == a && rs.last.hi == a + len &&
          rs.sliding(2).forall { w => w.length < 2 || w(0).hi == w(1).lo })
      covered == len && contiguous && rs.forall(r => r.hi > r.lo)
    }
}
