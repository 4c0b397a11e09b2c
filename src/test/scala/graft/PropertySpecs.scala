package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.TextHash

/** ScalaCheck properties over the pure sketch/text kernels (SURVEY.md
  * §5c): invariants that must hold for any input, not just fixtures. */
object TextHashProps extends Properties("TextHash") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  property("h32 is a 32-bit unsigned value") = forAll(word) { w =>
    val h = TextHash.h32(w)
    h >= 0L && h <= 0xffffffffL
  }

  property("h32 is deterministic") = forAll(word) { w =>
    TextHash.h32(w) == TextHash.h32(w)
  }

  property("shingles have exactly 3 tokens and are distinct") =
    forAll(text) { t =>
      val sh = TextHash.shingles(t)
      sh.forall(_.split(" ", -1).length == 3) && sh.distinct.length == sh.length
    }

  property("shingle count bounded by token count - 2") = forAll(text) { t =>
    TextHash.shingles(t).length <= math.max(0, TextHash.tokens(t).length - 2)
  }

  property("minhash signature is permutation-invariant (set semantics)") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      val a = hs.toArray
      val b = scala.util.Random.shuffle(hs).toArray
      TextHash.minhashSig(a).toSeq == TextHash.minhashSig(b).toSeq
    }

  property("identical hash sets share every minhash band") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      TextHash.minhashBands(hs.toArray) == TextHash.minhashBands(hs.toArray)
    }

  property("simhash of identical multisets is identical (hamming 0)") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      val a = TextHash.simhash32(hs.toArray)
      val b = TextHash.simhash32(scala.util.Random.shuffle(hs).toArray)
      java.lang.Long.bitCount(a ^ b) == 0
    }

  property("simhash stays within 32 bits") =
    forAll(Gen.nonEmptyListOf(Gen.posNum[Long])) { hs =>
      (TextHash.simhash32(hs.toArray) >>> 32) == 0L
    }
}

/** Freshness-operator property from SURVEY §5c: staleness is monotone
  * in the bound — relaxing the freshness window can only shrink the
  * violation set. Checked on the pure predicate (timestamps as longs). */
object FreshnessProps extends Properties("Freshness") {
  private val ts = Gen.choose(0L, 4102444800L)
  property("stale-set monotone in bound") =
    forAll(ts, ts, ts) { (lastSeen, b1, b2) =>
      val lo = math.min(b1, b2); val hi = math.max(b1, b2)
      // stale under the tighter (earlier) bound implies stale under the later
      !(lastSeen < lo) || (lastSeen < hi) || lo == hi
    }
}

/** Cron next-fire invariants: for ANY parseable expression and any
  * instant, the resolved fire is strictly later, minute-aligned, and
  * itself matches the expression; iterating fires is strictly
  * monotone. Expressions are generated from random field subsets so
  * the walk logic is exercised across minute/hour/dom/month/dow
  * restrictions (not just the reference's five strings). */
object CronProps extends Properties("Cron") {
  import graft.ops.Cron

  private def pick(lo: Int, hi: Int): Gen[String] = Gen.oneOf(
    Gen.const("*"),
    Gen.choose(lo, hi).map(_.toString),
    for { a <- Gen.choose(lo, hi - 1); b <- Gen.choose(a, hi) } yield s"$a-$b",
    Gen.choose(2, 6).map(n => s"*/$n"))
  private val cronExpr: Gen[String] = for {
    m <- pick(0, 59); h <- pick(0, 23); dom <- pick(1, 28)
    mon <- pick(1, 12); dow <- pick(0, 6)
  } yield s"$m $h $dom $mon $dow"
  private val instant = Gen.choose(0L, 4102444800L)
    .map(java.time.Instant.ofEpochSecond)

  property("nextFire is strictly after, minute-aligned, and matches") =
    forAll(cronExpr, instant) { (e, t) =>
      val c = Cron.parse(e)
      val f = c.nextFire(t)
      f.isAfter(t) && f.getEpochSecond % 60 == 0 && c.matches(f)
    }

  property("fire sequence is strictly increasing") =
    forAll(cronExpr, instant) { (e, t) =>
      val fires = Cron.parse(e).fireTimes(t).take(4).toList
      fires.zip(fires.tail).forall { case (a, b) => b.isAfter(a) }
    }

  property("no fire exists strictly between t and nextFire(t)") =
    forAll(cronExpr, instant) { (e, t) =>
      val c = Cron.parse(e)
      val f = c.nextFire(t)
      // walk every aligned minute in between (bounded: only check
      // gaps up to 3 hours to keep the property cheap)
      val gapMin = java.time.Duration.between(t, f).toMinutes
      gapMin > 180 || {
        val start = t.plusSeconds(60 - t.getEpochSecond % 60)
          .truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
        Iterator.iterate(start)(_.plusSeconds(60))
          .takeWhile(_.isBefore(f)).forall(m => !c.matches(m))
      }
    }
}

/** WAV parse properties: for ANY PCM16 stream the RIFF walker must
  * recover the written facts exactly — including odd-length unknown
  * chunks whose word-alignment pad byte shifts every later chunk. */
object WavProps extends Properties("ParseWav") {
  import graft.ops.Multimodal

  private val params = for {
    rate <- Gen.oneOf(8000, 16000, 22050, 44100)
    ch <- Gen.choose(1, 2)
    n <- Gen.choose(1, 400)
    samples <- Gen.listOfN(n * ch, Gen.choose(-12000, 12000))
    junkLen <- Gen.choose(0, 9) // odd lengths exercise the pad byte
  } yield (rate, ch, n, samples.toArray, junkLen)

  private def wav(rate: Int, ch: Int, n: Int, samples: Array[Int],
      junkLen: Int): Array[Byte] = {
    val dataLen = n * ch * 2
    val junkPadded = junkLen + (junkLen & 1)
    val bb = java.nio.ByteBuffer.allocate(44 + junkPadded + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + junkPadded + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    // unknown chunk with a possibly-odd declared length (pad byte
    // written but not declared — the RIFF alignment rule)
    bb.put("LIST".getBytes("US-ASCII")).putInt(junkLen)
    (0 until junkPadded).foreach(i => bb.put((i % 7).toByte))
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  property("recovers rate/channels/frames/peak/clip through junk chunks") =
    forAll(params) { case (rate, ch, n, samples, junkLen) =>
      val m = Multimodal.parseWav("p.wav", wav(rate, ch, n, samples, junkLen))
      val peak = samples.map(math.abs).max
      val clipped = samples.count(s => math.abs(s) >= 10000)
      m.sample_rate == rate && m.channels == ch && m.n_frames == n &&
        m.duration_ms == n.toLong * 1000 / rate &&
        m.peak == peak && m.n_clipped == clipped
    }

  property("rms is the exact floor sqrt of the mean square") =
    forAll(params) { case (rate, ch, n, samples, junkLen) =>
      val m = Multimodal.parseWav("p.wav", wav(rate, ch, n, samples, junkLen))
      val ms = samples.map(s => s.toLong * s).sum / samples.length
      m.rms * m.rms <= ms && (m.rms + 1) * (m.rms + 1) > ms
    }
}

/** Image-kernel properties: the fit-224 planner and nearest-neighbor
  * resize must hold for ANY source dimensions, and isqrt must be the
  * exact floor square root for any non-negative input. */
object ImageKernelProps extends Properties("ImageKernels") {
  import graft.ops.Multimodal

  property("isqrt is the exact floor sqrt for any non-negative long") =
    forAll(Gen.oneOf(
      Gen.choose(0L, 1000L),
      Gen.choose(0L, Long.MaxValue / 4),
      // adversarial: exact squares and their neighbors, where a naive
      // double sqrt misrounds
      Gen.choose(0L, 3037000498L).map(r => r * r),
      Gen.choose(1L, 3037000498L).map(r => r * r - 1))) { v =>
      val r = Multimodal.isqrt(v)
      r >= 0 && r * r <= v && (r + 1) * (r + 1) > v
    }

  private val dims = Gen.choose(1, 500)

  property("fitDims stays in the 224 box (unless upscaling a tiny side) and positive") =
    forAll(dims, dims) { (w, h) =>
      val (ow, oh) = Multimodal.fitDims(w, h)
      ow >= 1 && oh >= 1 && ow <= 224 && oh <= 224
    }

  property("fitDims preserves aspect ratio within one floor step") =
    forAll(dims, dims) { (w, h) =>
      val (ow, oh) = Multimodal.fitDims(w, h)
      // both dims come from the SAME scale: cross products differ by
      // at most one rounding step on each side
      math.abs(ow.toLong * h - oh.toLong * w) <= (w.toLong max h.toLong)
    }

  property("resizeNearest emits exactly the target dims, pixels from source") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 40), Gen.choose(1, 60),
      Gen.choose(1, 60), Gen.choose(0, 255)) { (w, h, ow, oh, seed) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = Math.floorMod(x * 31 + y * 17 + seed, 256)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = Multimodal.resizeNearest(img, ow, oh)
      val srcPixels =
        (for (y <- 0 until h; x <- 0 until w) yield img.getRGB(x, y)).toSet
      out.getWidth == ow && out.getHeight == oh &&
        (0 until oh).forall(y => (0 until ow).forall(x =>
          srcPixels.contains(out.getRGB(x, y))))
    }

  property("aHash total on tiny/thin images (empty 8x8 blocks hash to 0)") =
    forAll(Gen.choose(1, 12), Gen.choose(1, 12), Gen.choose(0, 255)) {
      (w, h, seed) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = Math.floorMod(x * 31 + y * 17 + seed, 256)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      // must not divide by an empty block's zero count (w or h < 8
      // leaves blocks with no pixels); empty blocks contribute 0 bits
      val hash = Multimodal.aHash(img)
      val emptyBlocks = (for {
        by <- 0 until 8; bx <- 0 until 8
        if !(0 until h).exists(y => (0 until w).exists(x =>
          (y * 8 / h) * 8 + (x * 8 / w) == by * 8 + bx))
      } yield by * 8 + bx).toSet
      emptyBlocks.forall(b => (hash & (1L << b)) == 0L)
    }
}

/** The RIFF walker's multi-chunk contract: a payload split across
  * several data chunks must parse identically to the same samples in
  * one chunk — stats and windows can never disagree about content. */
object WavMultiChunkProps extends Properties("ParseWavMultiChunk") {
  import graft.ops.Multimodal

  private def wavChunks(rate: Int, ch: Int,
      chunks: Seq[Array[Int]]): Array[Byte] = {
    // chunksLen = every data chunk's 8-byte header + payload; the
    // RIFF size counts from after its own 8-byte header: 'WAVE' (4)
    // + fmt header+body (8 + 16) + the data chunks
    val chunksLen = chunks.map(c => 8 + c.length * 2).sum
    val bb = java.nio.ByteBuffer.allocate(36 + 8 + chunksLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(28 + chunksLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(ch.toShort).putInt(rate)
      .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
    chunks.foreach { c =>
      bb.put("data".getBytes("US-ASCII")).putInt(c.length * 2)
      c.foreach(s => bb.putShort(s.toShort))
    }
    java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  private val params = for {
    ch <- Gen.choose(1, 2)
    n1 <- Gen.choose(1, 50)
    n2 <- Gen.choose(1, 50)
    all <- Gen.listOfN((n1 + n2) * ch, Gen.choose(-11000, 11000))
  } yield (ch, n1 * ch, all.toArray)

  property("split data chunks parse identically to one chunk") =
    forAll(params) { case (ch, cut, all) =>
      val one = Multimodal.parseWav("a.wav",
        wavChunks(8000, ch, Seq(all)))
      val two = Multimodal.parseWav("b.wav",
        wavChunks(8000, ch, Seq(all.take(cut), all.drop(cut))))
      one.copy(file = "x") == two.copy(file = "x")
    }

  property("negative declared chunk length fails loudly, never loops") =
    forAll(Gen.oneOf("LIST", "fmt ", "data"), Gen.choose(1, 1000)) {
      (id, mag) =>
      // a negative length once made the skip path seek BACKWARD and
      // re-read the same header forever (executor hang on corrupt
      // input); all three chunk paths must raise the file-named require
      val bb = java.nio.ByteBuffer.allocate(20)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(12)
        .put("WAVE".getBytes("US-ASCII"))
      bb.put(id.getBytes("US-ASCII")).putInt(-mag)
      try { Multimodal.wavSamples("neg.wav", bb.array()); false }
      catch {
        case e: IllegalArgumentException => e.getMessage.contains("neg.wav")
        case _: Throwable => false
      }
    }

  property("any truncation fails with the file-named require") =
    forAll(params, Gen.choose(0, 10000)) { case ((ch, _, all), cutSeed) =>
      val whole = wavChunks(8000, ch, Seq(all))
      // cut ANYWHERE after the RIFF/WAVE preamble: mid-fmt-header,
      // mid-fmt-payload, mid-data-header, mid-data-payload — every
      // case must surface the parser's own IllegalArgumentException
      // naming the file, never a raw BufferUnderflowException or a
      // silent short parse
      val keep = 12 + cutSeed % (whole.length - 12)
      val short = java.util.Arrays.copyOf(whole, keep)
      try { Multimodal.wavSamples("t.wav", short); false }
      catch {
        case e: IllegalArgumentException => e.getMessage.contains("t.wav")
        case _: Throwable => false
      }
    }
}

/** The Misra–Gries superset guarantee both heavy-hitter paths lean on:
  * any key with frequency > n/cap survives the summary, whether folded
  * in one pass or resumed across arbitrary stream splits (the
  * streaming processor's persisted-counters contract). */
object MisraGriesProps extends Properties("MisraGries") {
  import graft.functions.MisraGries

  // zipfish streams: draw from a small skewed domain so heavy keys
  // genuinely occur, plus uniform noise from a wide domain
  private val stream: Gen[List[Long]] = for {
    n <- Gen.choose(1, 400)
    ks <- Gen.listOfN(n, Gen.frequency(
      (4, Gen.choose(0L, 3L)),       // skew mass
      (2, Gen.choose(0L, 30L)),      // mid
      (1, Gen.choose(0L, 10000L)))) // noise tail
  } yield ks

  private val cap: Gen[Int] = Gen.choose(2, 20)

  property("every > n/cap key survives a one-pass fold") =
    forAll(stream, cap) { (ks, c) =>
      val counters = MisraGries.fold(
        scala.collection.mutable.LongMap.empty[Long], ks, c)
      val freq = ks.groupBy(identity).view.mapValues(_.size.toLong)
      freq.forall { case (k, f) =>
        f * c <= ks.size || counters.contains(k)
      }
    }

  property("state never exceeds cap") = forAll(stream, cap) { (ks, c) =>
    MisraGries.fold(
      scala.collection.mutable.LongMap.empty[Long], ks, c).size <= c
  }

  property("resuming from a split equals the unbroken stream") =
    forAll(stream, cap, Gen.choose(0, 400)) { (ks, c, cut0) =>
      val cut = math.min(cut0, ks.size)
      val (a, b) = ks.splitAt(cut)
      val whole = MisraGries.fold(
        scala.collection.mutable.LongMap.empty[Long], ks, c)
      val resumed = MisraGries.fold(
        MisraGries.fold(
          scala.collection.mutable.LongMap.empty[Long], a, c), b, c)
      whole.toMap == resumed.toMap
    }
}

/** The BPE runtime's CSR-trie greedy walk vs an independent reference:
  * the trie is an optimization of greedy longest-match over the vocab
  * SET — any divergence for any input is a bug, whatever the fixtures
  * happen to cover. Also pins the byte-level contract (learned
  * byte-sequence pieces; one token per unmatched BYTE) on arbitrary
  * unicode, seeded and unseeded scripts alike. */
object BpeRuntimeProps extends Properties("BpeRuntime") {
  import graft.functions.{BpeRuntime, BpeVocab}
  import org.apache.spark.unsafe.types.UTF8String

  private val vocabSet = BpeVocab.piecesRaw.toSet
  private val maxLen = BpeVocab.maxLen

  /** Reference greedy longest-match per BYTE position over the text's
    * UTF-8 bytes — the byte-level definition, written without the
    * trie: longest matching byte-sequence piece wins, an unmatched
    * byte costs 1 token (the GPT-2 byte fallback). ISO-8859-1 decode
    * is the byte-per-char embedding piecesRaw uses. */
  private def refCount(s: String): Long = {
    val bs = s.getBytes("UTF-8")
    var i = 0; var n = 0L
    while (i < bs.length) {
      if (bs(i) == ' ') i += 1
      else {
        var step = 1
        var l = math.min(maxLen, bs.length - i)
        var found = false
        while (!found && l >= 2) {
          if (vocabSet(new String(bs, i, l, "ISO-8859-1"))) {
            step = l; found = true
          } else l -= 1
        }
        i += step; n += 1
      }
    }
    n
  }

  private val asciiText: Gen[String] = Gen.listOf(Gen.frequency(
    (8, Gen.alphaLowerChar), (2, Gen.const(' ')),
    (1, Gen.oneOf('0', '7', '-', '.')))).map(_.mkString)

  property("trie walk equals reference greedy on ascii-ish text") =
    forAll(asciiText) { t =>
      BpeRuntime.count(UTF8String.fromString(t)) == refCount(t)
    }

  private val uniText: Gen[String] = Gen.listOf(Gen.frequency(
    (6, Gen.alphaLowerChar), (2, Gen.const(' ')),
    (2, Gen.oneOf('é', '中', 'Ж')),
    (1, Gen.const(new String(Character.toChars(0x1d11e)))))) // astral
    .map(_.mkString)

  property("multi-byte contract: unicode counts match the reference") =
    forAll(uniText) { t =>
      BpeRuntime.count(UTF8String.fromString(t)) == refCount(t)
    }

  property("count bounded by [cp/maxLen, code points] on spaceless words") =
    forAll(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)) { w =>
      val n = BpeRuntime.count(UTF8String.fromString(w))
      n >= (w.length + maxLen - 1) / maxLen && n <= w.length
    }
}

/** Properties of the mojibake-repair kernel (r17): invariants over
  * arbitrary text, not just the planted fixture kinds. */
object EncodingRepairProps extends Properties("EncodingRepair") {
  import graft.functions.EncodingRepair

  private val asciiText = Gen.listOf(Gen.oneOf(
    Gen.alphaLowerChar, Gen.const(' '), Gen.numChar)).map(_.mkString)
  // accented NFC words whose UTF-8 bytes round-trip through cp1252
  private val accented = Gen.oneOf("café", "naïve", "jalapeño", "über",
    "crème", "señor", "déjà", "touché", "résumé")
  private val mixedText = for {
    pre <- asciiText; w <- accented; post <- asciiText
  } yield java.text.Normalizer.normalize(s"$pre $w $post",
    java.text.Normalizer.Form.NFC)
  private def corrupt(s: String): String = new String(
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")

  property("ASCII text is a fixed point with zero passes") =
    forAll(asciiText) { t => EncodingRepair.repair(t) == ((t, 0)) }

  property("repair inverts one corruption (passes == 1)") =
    forAll(mixedText) { t =>
      EncodingRepair.repair(corrupt(t)) == ((t, 1))
    }

  property("repair inverts double corruption (passes == 2)") =
    forAll(mixedText) { t =>
      EncodingRepair.repair(corrupt(corrupt(t))) == ((t, 2))
    }

  property("repair is idempotent") = forAll(mixedText) { t =>
    val once = EncodingRepair.repair(corrupt(t))._1
    EncodingRepair.repair(once) == ((once, 0))
  }

  property("clean accented text is untouched") = forAll(mixedText) { t =>
    EncodingRepair.repair(t) == ((t, 0))
  }
}
