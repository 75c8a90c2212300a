package graft

import org.apache.spark.sql.functions._

import graft.ext._

class ExtSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet").cache()
  lazy val emb  = spark.read.parquet(s"$sf0001/embeddings.parquet").cache()

  test("hash48 matches the documented DuckDB twin value") {
    // DuckDB: md5('abc') = 900150983cd24fb0... -> first 12 hex = 0x900150983cd2
    import spark.implicits._
    val v = Seq("c").toDF("x")
      .select(TextHash.hash48(lit("abc"), lit("s")).as("h")).head().getLong(0)
    val expected = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex("s:abc").substring(0, 12), 16)
    assert(v === expected)
  }

  test("exact dedup finds injected duplicates") {
    val dup = docs.limit(10).withColumn("doc_id", col("doc_id") + 100000)
    val summary = Dedup.exactDedupSummary(docs.unionByName(dup))
    val r = summary.head()
    assert(r.getAs[Long]("docs") === docs.count() + 10)
    assert(r.getAs[Long]("dups") === 10L)
  }

  test("capBuckets windowed form ≡ the census-join-back on random frames") {
    // the r16 advisor fix swapped the groupBy census joined back over
    // a recomputed pipeline for ONE windowed count — pin exact row-set
    // parity of the two forms on seeded random bucket populations
    // (hot buckets, singletons, empties) across cap values
    import spark.implicits._
    val rnd = new scala.util.Random(1234L)
    val rows = (0 until 500).map { i =>
      (rnd.nextInt(7), s"sig${rnd.nextInt(9)}", s"payload$i")
    }.toDF("band", "sig", "payload")
    for (cap <- Seq(0, 1, 3, 10, 1000)) {
      val windowed = Dedup.capBuckets(rows, cap, "band", "sig")
      val census = rows.groupBy("band", "sig")
        .agg(count(lit(1)).as("__n")).filter(col("__n") <= math.max(cap, 0))
        .select("band", "sig")
      val joined =
        if (cap <= 0) rows else rows.join(census, Seq("band", "sig"))
      assert(windowed.exceptAll(joined.select(windowed.columns.map(col): _*))
          .isEmpty &&
        joined.select(windowed.columns.map(col): _*).exceptAll(windowed)
          .isEmpty,
        s"cap $cap diverged between the windowed and census forms")
    }
  }

  test("hot-bucket cap drops degenerate buckets, keeps true dup pairs") {
    import spark.implicits._
    // 40 docs: ids 0..19 share one payload pairwise (2k, 2k+1 — true
    // dups in cold buckets); ids 100..119 all share ONE payload → one
    // 20-member hot bucket contributing C(20,2)=190 degenerate pairs
    val cold = (0L until 20L).toDF("doc_id")
    val hot = (100L until 120L).map(i => (i, 100L)).toDF("doc_id", "base")
    val media = Multimodal.ingestWavDup(cold).unionByName(
      hot.select(col("doc_id")).as[Long]
        .mapPartitions(_.map(id => (id, Multimodal.syntheticWav(100L, 512, 1))))
        .toDF("doc_id", "blob"))
    val uncapped = Multimodal.audioNearDup(media)
    val capped = Multimodal.audioNearDup(media, maxBucket = 10)
    val coldPairs = (0L until 20L by 2).map(k => (k, k + 1)).toSet
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(coldPairs.subsetOf(pairs(uncapped)))
    assert(pairs(uncapped).count { case (a, b) => a >= 100 && b >= 100 } == 190)
    // the cap removes exactly the hot cluster's pairs; cold dups survive
    val cp = pairs(capped)
    assert(coldPairs.subsetOf(cp))
    assert(!cp.exists { case (a, b) => a >= 100 && b >= 100 })
    uncapped.unpersist(blocking = false)
    capped.unpersist(blocking = false)
  }

  test("minhash LSH finds an injected near-duplicate pair") {
    // doc 100001 = copy of doc 1 with a few tokens changed -> high jaccard
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(100001L))
      .withColumn("text", concat(col("text"), lit(" xyzzy plugh")))
    val pairs = Dedup.minHashNearDups(docs.unionByName(near), threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 100001L)))
  }

  test("simhash of identical docs is identical; near dup is close") {
    val fps = Dedup.simHashFingerprints(docs.limit(20)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.size === 20)
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(100001L))
    val fps2 = Dedup.simHashFingerprints(
      docs.filter(col("doc_id") === 1).unionByName(near)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps2(1L) === fps2(100001L))
  }

  test("simhash banding equals brute pairs and plans no nested-loop join") {
    val banded = Dedup.simHashNearDups(docs, maxHamming = 6)
    // brute twin, computed inline (the pre-banding all-pairs form)
    val fps = Dedup.simHashFingerprints(docs)
    val a = fps.select(col("doc_id").as("i"), col("simhash").as("fi"))
    val b = fps.select(col("doc_id").as("j"), col("simhash").as("fj"))
    val brute = a.join(b, col("i") < col("j"))
      .withColumn("hamming", bit_count(col("fi").bitwiseXOR(col("fj"))))
      .filter(col("hamming") <= 6)
      .select("i", "j", "hamming")
    assert(banded.exceptAll(brute).isEmpty && brute.exceptAll(banded).isEmpty)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded simhash must equi-join on segments, got:\n$plan")
    // normal-corpus parity: the hot-bucket cap (the 100 TB opt-in,
    // capSimBuckets — capTextBuckets' simhash twin) changes NOTHING
    // when no segment bucket is hot
    val capped = Dedup.simHashNearDups(docs, maxHamming = 6,
      maxBucket = 1000)
    assert(banded.exceptAll(capped).isEmpty &&
      capped.exceptAll(banded).isEmpty)
  }

  test("nearDupGroups returns empty on zero pairs (no NPE)") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Dedup.nearDupGroups(none).count() === 0L)
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(ann).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall $recall too low")
  }

  test("LSH near-dup pairs are a sound subset of brute pairs with recall") {
    val brute = Similarity.embeddingNearDups(emb, 0.45)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embeddingNearDupsLsh(emb, 0.45)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH pairs must pass the same exact verify")
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      assert(recall >= 0.3, s"LSH pair recall $recall too low")
    }
    // normal-corpus parity: the hot-bucket cap changes nothing when no
    // (tbl, bucket) is hot
    val capped = Similarity.embeddingNearDupsLsh(emb, 0.45,
        maxBucket = 100000)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == lsh)
  }

  test("cosine of identical vectors is 1") {
    val sim = emb.limit(5)
      .select(round(Similarity.cosine(col("embedding"), col("embedding")), 9).as("s"))
      .collect().map(_.getDouble(0))
    assert(sim.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("langId predicts en on the-heavy text") {
    import spark.implicits._
    val d = Seq((1L, "the cat and the dog of the house"),
                (2L, "der und die der und die der")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(d).collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    assert(out(1L) === "en" && out(2L) === "de")
  }

  test("multimodal pipeline: ingest -> extract -> frames") {
    val media = Multimodal.ingest(docs.limit(10))
    assert(media.schema("blob").dataType.typeName === "binary")
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 10)
    feats.foreach { f =>
      assert(f.n_frames === (f.blob_len + 255) / 256)
    }
    val frames = Multimodal.sampleFrames(media)
    assert(frames.count() > 0)
    assert(frames.filter(col("frame_idx") % 4 =!= 0).count() === 0)
  }

  test("memorizedSpans reports duplicated windows with canonical first occurrence") {
    import spark.implicits._
    val tiny = Seq(
      1L -> "a b c d e f",
      2L -> "x a b c d y"
    ).toDF("doc_id", "text")
    val got = Dedup.memorizedSpans(tiny, k = 3, topN = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // shared 3-grams: "a b c" and "b c d", both ×2; tie breaks seg asc
    assert(got.toSeq === Seq(
      (1L, "a b c", 2L, 2L, 1L, 0L),
      (2L, "b c d", 2L, 2L, 1L, 1L)))
  }

  test("uncertaintySample picks the tied-vote query first, unanimous last") {
    import spark.implicits._
    // labeled corpus: two clean label clusters on the axes; query 10
    // sits BETWEEN them (k=2 → one vote each → margin 0), query 11
    // sits inside label 0 (both votes label 0 → margin 2)
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(0f, 1f), 1),
      (3L, Array(0.1f, 0.9f), 1),
      (10L, Array(0.6f, 0.55f), -1),
      (11L, Array(1f, 0.05f), -1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.uncertaintySample(emb, col("vec_id") >= 10L, k = 2, m = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length === 2)
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(10L)._4 === 0L && byId(10L)._5 === 1L, "tied query is most uncertain")
    assert(byId(11L)._2 === 0 && byId(11L)._4 === 2L && byId(11L)._5 === 2L,
      "unanimous label-0 query has margin k")
  }

  test("windowPpl surfaces the rare-token window a whole-doc mean hides") {
    import spark.implicits._
    // doc 1: 32 common tokens then 32 corpus-unique tokens — window 1
    // must be the worst; doc 2 is all common (1 window, worst = best)
    val common = (1 to 32).map(_ => "the").mkString(" ")
    val rare = (1 to 32).map(i => s"zq$i").mkString(" ")
    val tiny = Seq(1L -> s"$common $rare", 2L -> common).toDF("doc_id", "text")
    val got = TextAnalysis.windowPpl(tiny, width = 32).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) === 2L && got(1L).getLong(2) === 1L,
      "two windows, worst is the rare one")
    assert(got(1L).getDouble(3) < got(1L).getDouble(4), "worst < best")
    assert(got(2L).getLong(1) === 1L &&
      got(2L).getDouble(3) === got(2L).getDouble(4))
  }

  test("ivfRecallSweep is monotone in nprobe and exact at full probe") {
    val emb = graft.model.Tables.load(spark, s"$sf0001/embeddings.parquet")
    val out = Similarity.ivfRecallSweep(emb, col("vec_id") < 10, k = 5,
        nprobes = Seq(1, 2, 4, 16))
      .orderBy("nprobe").collect()
    assert(out.length === 4)
    val hits = out.map(_.getLong(1))
    assert(hits.sliding(2).forall(s => s.length < 2 || s(0) <= s(1)),
      "recall is monotone in nprobe")
    val den = out.head.getLong(2)
    assert(hits.last === den, "nprobe = nlist probes every list → recall 1")
    assert(out.last.getLong(3) === 1000000L)
  }

  test("clusterCards labels every populated cluster with ranked distinct terms") {
    val emb = graft.model.Tables.load(spark, s"$sf0001/embeddings.parquet")
    val d = graft.model.Tables.load(spark, s"$sf0001/documents.parquet")
    val cards = Similarity.clusterCards(emb, d, k = 3).collect()
    assert(cards.nonEmpty)
    val byCluster = cards.groupBy(_.getInt(0))
    assert(byCluster.size <= 16, "at most nlist clusters")
    byCluster.values.foreach { rows =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.toSeq === (1L to ranks.length).toSeq, "dense ranks from 1")
      assert(rows.map(_.getString(2)).distinct.length === rows.length,
        "terms distinct within a cluster")
    }
    // deterministic across re-runs (cached centroids + quantized scores)
    val again = Similarity.clusterCards(emb, d, k = 3).collect()
    assert(cards.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("marginMine pairs translations and never picks the hub vector") {
    import spark.implicits._
    // srcs are axis vectors; each has one clear "translation" target;
    // tgt 12 is a HUB — decently similar to every src. Raw cosine
    // might rank the hub high, but margin divides its own hot
    // neighborhood away (the point of margin over cosine).
    val emb = Seq(
      0L -> Array(1f, 0f, 0f, 0f),
      1L -> Array(0f, 1f, 0f, 0f),
      2L -> Array(0f, 0f, 1f, 0f),
      10L -> Array(0.95f, 0.05f, 0f, 0f),
      11L -> Array(0.1f, 0.9f, 0.1f, 0f),
      12L -> Array(0.6f, 0.6f, 0.6f, 0.2f),
      13L -> Array(0f, 0f, 0.9f, 0.3f),
      14L -> Array(0.2f, 0.1f, 0.05f, 0.9f)
    ).toDF("vec_id", "embedding")
    val out = Similarity.marginMine(emb, col("vec_id") < 10,
        col("vec_id") >= 10, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out.view.mapValues(_._1).toMap === Map(0L -> 10L, 1L -> 11L, 2L -> 13L))
    assert(out.values.forall(_._2 >= 1000000L), "accepted pairs have margin ≥ 1")
    // determinism
    val again = Similarity.marginMine(emb, col("vec_id") < 10,
        col("vec_id") >= 10, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(out === again)
  }

  test("PngCodec decodes imageio-encoded pixels bit-exactly (rgb/rgba/gray)") {
    import java.awt.image.BufferedImage
    // adversarial content: random-ish pixels exercise all five row
    // filters (imageio picks filters adaptively per row)
    def encode(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    def fill(img: BufferedImage, w: Int, h: Int): Unit =
      for (y <- 0 until h; x <- 0 until w) {
        val v = (x * 31 + y * 57 + (x * y) % 97) & 0xffffff
        img.setRGB(x, y, (0xff << 24) | v)
      }
    // RGB (color type 2)
    val rgb = new BufferedImage(21, 13, BufferedImage.TYPE_INT_RGB)
    fill(rgb, 21, 13)
    val pr = graft.ext.PngCodec.decode(encode(rgb)).get
    assert(pr.width === 21 && pr.height === 13 && pr.channels === 3)
    for (y <- 0 until 13; x <- 0 until 21) {
      val want = rgb.getRGB(x, y)
      assert(pr.sample(x, y, 0) === ((want >> 16) & 0xff), s"R at ($x,$y)")
      assert(pr.sample(x, y, 1) === ((want >> 8) & 0xff), s"G at ($x,$y)")
      assert(pr.sample(x, y, 2) === (want & 0xff), s"B at ($x,$y)")
    }
    // RGBA (color type 6) — alpha channel decodes too
    val rgba = new BufferedImage(9, 7, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 7; x <- 0 until 9)
      rgba.setRGB(x, y, ((x * 37 + y) << 24) | ((x * 5) << 16) | (y << 8) | (x + y))
    val pa = graft.ext.PngCodec.decode(encode(rgba)).get
    assert(pa.channels === 4)
    for (y <- 0 until 7; x <- 0 until 9) {
      val want = rgba.getRGB(x, y)
      assert(pa.sample(x, y, 3) === ((want >> 24) & 0xff), s"A at ($x,$y)")
      assert(pa.sample(x, y, 0) === ((want >> 16) & 0xff), s"R at ($x,$y)")
    }
    // grayscale (color type 0)
    val gray = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = (x * 16 + y * 2) & 0xff
      gray.getRaster.setSample(x, y, 0, v)
    }
    val pg = graft.ext.PngCodec.decode(encode(gray)).get
    assert(pg.channels === 1)
    for (y <- 0 until 8; x <- 0 until 8)
      assert(pg.sample(x, y, 0) === gray.getRaster.getSample(x, y, 0))
    // malformed inputs degrade to None, never throw
    val good = encode(rgb)
    assert(graft.ext.PngCodec.decode(null) === None)
    assert(graft.ext.PngCodec.decode("not a png".getBytes) === None)
    assert(graft.ext.PngCodec.decode(good.take(40)) === None)
    assert(graft.ext.PngCodec.decode(good.dropRight(30)) === None, "truncated IDAT")
    val corrupt = good.clone()
    corrupt(60) = (corrupt(60) ^ 0x55).toByte // scribble inside IDAT
    assert(graft.ext.PngCodec.decode(corrupt).fold(true)(_.width === 21),
      "corrupt stream either rejects or still parses structurally")
  }

  test("imageFeatures/imageNearDup run on real decoded pixels") {
    import spark.implicits._
    // identical pixel law at id and id+256 → hamming-0 pair; the
    // features must come from the DECODED payload, not metadata
    val media = Multimodal.ingestPng(
      Seq(1L, 2L, 257L).toDF("doc_id"))
    val f = Multimodal.imageFeatures(media).collect()
      .map(r => r.doc_id -> r).toMap
    assert(f.keySet === Set(1L, 2L, 257L))
    assert(f(1L).width === 16 && f(1L).channels === 3)
    assert(f(1L).ahash.length === 64 && f(1L).ahash.forall(c => c == '0' || c == '1'))
    assert(f(1L).luma_total === f(257L).luma_total, "id≡id' mod 256 → same image")
    assert(f(1L).ahash === f(257L).ahash)
    val pairs = Multimodal.imageNearDup(media, maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 257L && h == 0L })
    // a corrupt blob is dropped, not fatal
    val withJunk = media.unionByName(
      Seq((999L, "junk".getBytes)).toDF("doc_id", "blob"))
    assert(Multimodal.imageFeatures(withJunk).count() === 3)
  }

  test("image header parse reads real container dimensions (png/gif/bmp/jpeg)") {
    import spark.implicits._
    // real encoder output, not hand-built bytes: javax.imageio is the
    // pure-JVM codec the header parser must agree with
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt encoder")
      bos.toByteArray
    }
    for ((fmt, tag) <- Seq("png" -> "png", "gif" -> "gif", "bmp" -> "bmp",
        "jpg" -> "jpeg"))
      assert(Multimodal.parseImageHeader(encode(fmt, 23, 17)) === Some((tag, 23, 17)),
        s"format $fmt")
    // non-container payloads and nulls fall through to the stub path
    assert(Multimodal.parseImageHeader("just text".getBytes) === None)
    assert(Multimodal.parseImageHeader(null) === None)
    // 0xFF fill bytes between segments are legal padding (B.1.1.2):
    // inject them after SOI in a real jpeg and dims must still parse
    val jpg = encode("jpg", 23, 17)
    val padded = (jpg.take(2) :+ 0xff.toByte :+ 0xff.toByte) ++ jpg.drop(2)
    assert(Multimodal.parseImageHeader(padded) === Some(("jpeg", 23, 17)))
    // a stream whose header section ends (SOS/EOI) before any SOF must
    // bail out rather than scan entropy-coded data for segment lengths
    val sosFirst = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x01, 0x02,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x00, 0x11, 0x00, 0x17).map(_.toByte)
    assert(Multimodal.parseImageHeader(sosFirst) === None)
    // end-to-end: a real PNG row gets its REAL dims (not the metadata
    // columns); a text-payload row keeps the metadata stand-ins
    val media = Seq(
      (1L, encode("png", 23, 17), 99, 98, "image"),
      (2L, "plain words".getBytes, 40, 30, "image-stub")
    ).toDF("doc_id", "blob", "width", "height", "modality")
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> ((f.width, f.height))).toMap
    assert(feats(1L) === ((23, 17)) && feats(2L) === ((40, 30)))
  }

  test("audio header parse reads real WAV metadata (rate/channels/bits/data)") {
    // real encoder output: javax.sound writes the RIFF/WAVE container
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(rate: Float, channels: Int, bits: Int, frames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, bits, channels, true, false)
      val data = new Array[Byte](frames * fmt.getFrameSize)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(
        new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val m = Multimodal.parseAudioHeader(wav(16000f, 2, 16, 1234)).get
    assert(m === Multimodal.AudioMeta("wav", 16000, 2, 16, 1234L * 2 * 2))
    val mono8 = Multimodal.parseAudioHeader(wav(8000f, 1, 8, 999)).get
    assert(mono8.sampleRate === 8000 && mono8.channels === 1 &&
      mono8.bitsPerSample === 8 && mono8.dataBytes === 999L)
    // non-audio payloads and nulls fall through to the stub path
    assert(Multimodal.parseAudioHeader("RIFFnope".getBytes) === None)
    assert(Multimodal.parseAudioHeader(null) === None)
    // a truncated/malformed size must terminate, not wrap the cursor
    val broken = wav(8000f, 1, 8, 4)
    broken(16) = 0xff.toByte; broken(17) = 0xff.toByte
    broken(18) = 0xff.toByte; broken(19) = 0xff.toByte
    assert(Multimodal.parseAudioHeader(broken) === None)
  }

  test("parseVideoHeader reads mvhd/tkhd from a hand-built ISO-BMFF box tree") {
    def be(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val ftyp = box("ftyp", "isom".getBytes ++ be(0) ++ "isom".getBytes)
    // mvhd v0: ver/flags, ctime, mtime, timescale=1000, duration=5000
    val mvhd = box("mvhd",
      be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(5000) ++ Array.fill[Byte](80)(0))
    // tkhd v0: 76 payload bytes then 16.16 width/height
    val tkhd = box("tkhd",
      Array.fill[Byte](76)(0) ++ be(640 << 16) ++ be(360 << 16))
    val soundTkhd = box("tkhd", // audio track: zero dims, must not count
      Array.fill[Byte](76)(0) ++ be(0) ++ be(0))
    val moov = box("moov",
      mvhd ++ box("trak", tkhd) ++ box("trak", soundTkhd))
    val m = Multimodal.parseVideoHeader(ftyp ++ moov).get
    assert(m === Multimodal.VideoMeta("mp4", 5000L, 640, 360, 1))
    // mvhd v1 (64-bit times), timescale 600, duration 1200 → 2000 ms
    val mvhd1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++ Array.fill[Byte](16)(0) ++ be(600) ++
        be(0) ++ be(1200) ++ Array.fill[Byte](80)(0))
    val m1 = Multimodal.parseVideoHeader(ftyp ++ box("moov", mvhd1)).get
    assert(m1.durationMs === 2000L && m1.videoTracks === 0)
    // non-video and malformed inputs fall through to the stub path
    assert(Multimodal.parseVideoHeader("nope".getBytes ++ be(0)) === None)
    assert(Multimodal.parseVideoHeader(null) === None)
    // a zero/garbage box size terminates instead of looping
    val bad = ftyp ++ be(3) ++ "moov".getBytes
    assert(Multimodal.parseVideoHeader(bad) === None)
    // truncated leaf boxes (header only / short payload) degrade to
    // None or field-skips — never an out-of-bounds read
    val emptyMvhd = ftyp ++ box("moov", be(8) ++ "mvhd".getBytes)
    assert(Multimodal.parseVideoHeader(emptyMvhd) === None)
    val shortMvhd = ftyp ++ box("moov", box("mvhd", be(0) ++ be(0)))
    assert(Multimodal.parseVideoHeader(shortMvhd) === None)
    val shortTkhd = ftyp ++ box("moov",
      mvhd ++ box("trak", box("tkhd", Array.fill[Byte](40)(0))))
    assert(Multimodal.parseVideoHeader(shortTkhd) ===
      Some(Multimodal.VideoMeta("mp4", 5000L, 0, 0, 0)))
  }

  test("mediaMetadata dispatches image/audio/video/raw by magic number") {
    import spark.implicits._
    def be(v: Int) = Array[Byte](
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def mkBox(typ: String, payload: Array[Byte]): Array[Byte] =
      be(8 + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val png = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val wav = {
      val fmt = javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val af = new javax.sound.sampled.AudioFormat(fmt, 8000f, 16, 1, 2, 8000f, false)
      val data = new Array[Byte](16000) // 1 s of mono 16-bit
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(data), af, 8000),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val mp4 = mkBox("ftyp", "isom".getBytes ++ be(0)) ++ mkBox("moov",
      mkBox("mvhd", be(0) ++ be(0) ++ be(0) ++ be(1000) ++ be(2500) ++
        Array.fill[Byte](80)(0)) ++
      mkBox("trak", mkBox("tkhd",
        Array.fill[Byte](76)(0) ++ be(320 << 16) ++ be(240 << 16))))
    val media = Seq(
      (1L, png, 0, 0, "image"), (2L, wav, 0, 0, "audio"),
      (3L, mp4, 0, 0, "video"), (4L, "words".getBytes, 0, 0, "text"))
      .toDF("doc_id", "blob", "width", "height", "modality")
    val got = Multimodal.mediaMetadata(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(got(1L).format === "png" && got(1L).width === 8 && got(1L).height === 6)
    assert(got(2L).format === "wav" && got(2L).sample_rate === 8000 &&
      got(2L).channels === 1 && got(2L).duration_ms === 1000L)
    assert(got(3L).format === "mp4" && got(3L).width === 320 &&
      got(3L).duration_ms === 2500L && got(3L).video_tracks === 1)
    assert(got(4L).format === "raw")
  }

  test("gopherRules: each rule rejects its own degenerate document") {
    import spark.implicits._
    val en = "the and is in to of a for on with" // 10 stopword tokens
    val tiny = Seq(
      1L -> (en + " " + (1 to 20).map(i => s"term$i").mkString(" ")), // passes all
      2L -> "short text only",                               // r_words
      3L -> (en + (" spam" * 20)),                           // r_top (spam > 20%)
      4L -> ("alpha beta " * 15).trim,                       // r_stop (no stopwords) + r_dup2
      5L -> (en + " " + (1 to 15).map(i => s"superduperextralongtoken$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherRules(tiny, minWords = 15).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(7), "good doc must keep") // keep col idx 7
    assert(!out(2L).getBoolean(2) && !out(2L).getBoolean(7)) // r_words
    assert(!out(3L).getBoolean(4) && !out(3L).getBoolean(7)) // r_top
    assert(!out(4L).getBoolean(6) && !out(4L).getBoolean(5)) // r_stop, r_dup2
    assert(!out(5L).getBoolean(3), "mean token length >10 must fail r_mean_len")
  }

  test("bpeMerges learns the classic merges on a hand-counted corpus") {
    import spark.implicits._
    // word freqs: low×3 lower×2 newest×4 widest×1 → round-1 pair counts
    // peak at (w,e)=6; round 2 ties (l,o)=(s,t)=5 → lexicographic "l o";
    // round 3 then picks (s,t)=5 (hand-derived, Sennrich's example)
    val tiny = Seq(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest widest"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(tiny, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "w e", "we", 6L), (2, "l o", "lo", 5L), (3, "s t", "st", 5L)))
  }

  test("bpeMerges greedy in-word merge is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaaa"×3: round 1 pair (a,a)=9 (3 per word); greedy merge gives
    // [aa, aa] per word, so round 2 sees (aa,aa)=3 — an overlapping
    // count (which would see (a,a)=3·3 then [aa,a,a]…) diverges here
    val tiny = Seq(1L -> "aaaa aaaa aaaa").toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(tiny, rounds = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(3)))
    assert(got.toSeq === Seq((1, "a a", 9L), (2, "aa aa", 3L)))
  }

  test("bpeEncode applies learned merges in order (hand-counted symbol counts)") {
    import spark.implicits._
    // merges learned on this corpus: we, lo, st (see bpeMerges test) →
    // low = [lo w], lower = [lo we r], newest = [n e we st],
    // widest = [w i d e st]
    val tiny = Seq(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest widest"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bpeEncode(tiny, rounds = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) === ((5L, 19L, 12L)), "3·|low|+2·|lower| chars → 3·2+2·3 bpe")
    assert(got(2L) === ((5L, 30L, 21L)), "4·|newest|+|widest| chars → 4·4+5 bpe")
  }

  test("ccnetVerdict: keep implies every gate; an injected dup fails the keeper gate") {
    import spark.implicits._
    val base = docs.limit(60).select("doc_id", "text")
    val dup = base.orderBy("doc_id").limit(1)
      .withColumn("doc_id", col("doc_id") + 500000)
    val out = graft.ext.Pipeline.ccnetVerdict(base.unionByName(dup)).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.values.foreach { r =>
      if (r.getBoolean(5))
        assert(r.getString(1) == "en" && r.getString(3) != "tail" && r.getBoolean(4))
    }
    // the injected higher-id copy is never the keeper
    val injected = out.keys.filter(_ >= 500000L)
    assert(injected.nonEmpty && injected.forall(id => !out(id).getBoolean(4)))
  }

  test("bpe survives merge exhaustion: dried rounds no-op instead of emptying the corpus") {
    import spark.implicits._
    // "ab" everywhere: round 1 merges (a,b); rounds 2-3 have no pairs
    val tiny = Seq(1L -> "ab ab ab").toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(tiny, rounds = 3).collect()
    assert(merges.length === 1 && merges(0).getString(2) === "ab")
    val enc = TextAnalysis.bpeEncode(tiny, rounds = 3).collect()
    assert(enc.length === 1, "encode must not wipe the corpus")
    assert(enc(0).getLong(1) === 3L && enc(0).getLong(2) === 6L &&
      enc(0).getLong(3) === 3L, "three words of one merged symbol each")
  }

  test("PngCodec rejects a hostile chunk length without throwing") {
    val good = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    // overwrite the first post-IHDR chunk's length with ~Int.MaxValue:
    // the Long-bounds guard must reject it (an Int sum would wrap)
    val evil = good.clone()
    evil(33) = 0x7f.toByte; evil(34) = 0xff.toByte
    evil(35) = 0xff.toByte; evil(36) = 0xf0.toByte
    assert(graft.ext.PngCodec.decode(evil) === None)
  }

  test("TokenizerStore: stored-artifact encode equals in-session encode; applies to new batches") {
    import spark.implicits._
    val corpus = Seq(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest widest"
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpe_store").toString
    graft.ext.TokenizerStore.build(corpus, dir, rounds = 3)
    // merges round-trip in learned order
    val stored = graft.ext.TokenizerStore.merges(spark, dir).orderBy("round")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(stored.toSeq === Seq((1, "w e"), (2, "l o"), (3, "s t")))
    // store-backed encode ≡ in-session encode on the training corpus
    val fromStore = graft.ext.TokenizerStore.encode(spark, dir, corpus)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val inSession = TextAnalysis.bpeEncode(corpus, rounds = 3)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(fromStore === inSession)
    // a NEW batch encodes with the TRAINED rules (lowest = lo w e s t
    // under merges we/lo/st → [lo, we, st] = 3 symbols, 6 chars)
    val batch = Seq(9L -> "lowest").toDF("doc_id", "text")
    val enc = graft.ext.TokenizerStore.encode(spark, dir, batch).collect()
    assert(enc.length === 1 &&
      enc(0).getLong(1) === 1L && enc(0).getLong(2) === 6L &&
      enc(0).getLong(3) === 3L)
    // vocab table landed with membership flags
    val v = graft.ext.TokenizerStore.vocab(spark, dir)
    assert(v.columns.toSeq ===
      Seq("tok", "cnt", "rank", "cum", "in_vocab") && v.count() > 0)
  }

  test("vocabCoverage keeps the smallest prefix reaching the target mass") {
    import spark.implicits._
    // counts: a×5 b×3 c×1 d×1 (tot 10). pct=80: {a,b} covers 8 ≥ 8 →
    // c,d out. pct=95: c still short of 9.5 at cum 9, so d is IN too.
    val tiny = Seq(1L -> "a a a b b c", 2L -> "a a b d").toDF("doc_id", "text")
    def vocab(pct: Int) = TextAnalysis.vocabCoverage(tiny, pct).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(vocab(80) === Map("a" -> true, "b" -> true, "c" -> false, "d" -> false))
    assert(vocab(95) === Map("a" -> true, "b" -> true, "c" -> true, "d" -> true))
    val ranks = TextAnalysis.vocabCoverage(tiny, 80).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ranks === Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 4L))
  }

  test("dedupStack: kept implies every gate; an injected copy loses all three") {
    import spark.implicits._
    val base = docs.limit(40).select("doc_id", "text", "source")
    // a verbatim copy with a higher id: same URL bucket inputs mod 25/
    // 100 (id + 100·25·100 keeps both residues), same text
    val dup = base.orderBy("doc_id").limit(2)
      .withColumn("doc_id", col("doc_id") + 250000L)
    val all = base.unionByName(dup)
    val url = format_string("HTTPS://WWW.%s.Example.COM:443/p/%d/?utm_source=s%d&id=%d",
      col("source"), pmod(col("doc_id"), lit(25)),
      pmod(col("doc_id"), lit(3)), pmod(col("doc_id"), lit(100)))
    val out = Dedup.dedupStack(all.withColumn("url", url), col("url"))
      .collect().map(r => r.getLong(0) -> r).toMap
    out.values.foreach { r =>
      if (r.getBoolean(5))
        assert(r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(4))
    }
    val injected = out.keys.filter(_ >= 250000L)
    assert(injected.nonEmpty)
    injected.foreach { id =>
      assert(!out(id).getBoolean(1), s"$id shares its URL bucket")
      assert(!out(id).getBoolean(2), s"$id is an exact copy")
      assert(!out(id).getBoolean(4), s"$id is in its original's near-dup group")
      assert(!out(id).getBoolean(5))
    }
  }

  test("noveltyScore counts shared vs novel shingles (hand-built overlap)") {
    import spark.implicits._
    val tiny = Seq(
      1L -> "alpha beta gamma delta", // shares "alpha beta gamma" with 2
      2L -> "alpha beta gamma zeta",
      3L -> "one two three four" // fully novel
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScore(tiny).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) === ((2L, 1L, 1L, 500000L)))
    assert(got(2L) === ((2L, 1L, 1L, 500000L)))
    assert(got(3L) === ((2L, 0L, 2L, 1000000L)))
    // a doc with fewer than n tokens has no shingles and is absent
    val short = TextAnalysis.noveltyScore(Seq(9L -> "too short").toDF("doc_id", "text"))
    assert(short.count() === 0)
  }

  test("corpusReport: dup injection moves dups, not uniq; quality mean bounded") {
    import spark.implicits._
    val base = docs.limit(40).select("doc_id", "text", "lang", "source")
    val dup = base.limit(5).withColumn("doc_id", col("doc_id") + 100000)
    val rep = TextAnalysis.corpusReport(base.unionByName(dup)).collect()
    val nDocs = rep.map(_.getLong(1)).sum
    val uniq = rep.map(_.getLong(3)).sum
    val dups = rep.map(_.getLong(4)).sum
    assert(nDocs === 45 && dups >= 5 && nDocs - uniq === dups)
    assert(rep.map(_.getLong(5)).sum + rep.map(_.getLong(6)).sum === nDocs) // lang mix partitions
    rep.foreach(r => assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0))
  }

  test("sourceOverlapMatrix finds the planted cross-source copy") {
    import spark.implicits._
    val planted = Seq(
      (1L, "wholly unique first document text about region scans", "en", "sA"),
      (2L, "wholly unique first document text about region scans", "en", "sB"), // copy in sB
      (3L, "completely different second text regarding window aggregation", "en", "sC")
    ).toDF("doc_id", "text", "lang", "source")
    val m = Dedup.sourceOverlapMatrix(planted).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap // (src_a, src_b)
    val ab = m(("sA", "sB"))
    assert(ab.getLong(2) > 0 && ab.getDouble(5) === 1.0,
      "identical docs across sA/sB must share their whole shingle space")
    assert(!m.contains(("sA", "sC")) && !m.contains(("sB", "sC")),
      "disjoint sources must be absent from the matrix")
  }

  test("leakageSafeSplit: near-dup pairs never straddle the split boundary") {
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(100001L))
      .withColumn("text", concat(col("text"), lit(" xyzzy plugh")))
    val all = docs.unionByName(near)
    val s = Dedup.leakageSafeSplit(all).cache()
    assert(s.count() === all.count())
    // a group is atomic: one split per group, always
    val straddled = s.groupBy("group_id")
      .agg(count_distinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(straddled === 0L)
    // the planted near-pair shares a group and therefore a split
    val planted = s.filter(col("doc_id").isin(1L, 100001L)).collect()
    assert(planted.map(_.getLong(1)).distinct.length === 1)
    assert(planted.map(_.getString(2)).distinct.length === 1)
    assert(s.filter(col("split") === "train").count() > 0)
  }

  test("minhash_sigs kernel matches the k-transforms form bit-for-bit") {
    import graft.ext.TextHash._
    import graft.functions.MinHashFunctions.minhash_sigs
    val base = Dedup.shingleArrays(docs.limit(50))
    val k = 16
    val viaKernel = base.select(col("doc_id"), minhash_sigs(col("shs"), k).as("sigs"))
    val viaTransforms = base.select(
      col("doc_id"),
      array((0 until k).map(i =>
        array_min(transform(col("shs"), x => hash48(x, i.toString)))): _*).as("sigs"))
    assert(viaKernel.exceptAll(viaTransforms).isEmpty &&
      viaTransforms.exceptAll(viaKernel).isEmpty)
  }

  test("minhash_sigs: empty shingle array yields k nulls") {
    import graft.functions.MinHashFunctions.minhash_sigs
    import spark.implicits._
    val out = Seq(Seq.empty[String], Seq("a b c")).toDF("shs")
      .select(minhash_sigs(col("shs"), 4).as("sigs"))
      .collect().map(_.getSeq[Any](0))
    assert(out(0).forall(_ == null) && out(1).forall(_ != null))
  }

  test("SQ8 codes are bounded int8 and the flat scan tracks brute recall") {
    val coded = Similarity.sq8Code(col("embedding"),
      graft.functions.VectorFunctions.l2_norm(col("embedding")))
    val bad = emb.select(explode(coded).as("c"))
      .filter(col("c") < -127 || col("c") > 127).count()
    assert(bad === 0L, "every SQ8 component must fit int8 range")
    // recall vs exact brute: int8 of a unit vector loses <1% of the
    // score mass, so top-5 agreement should be near-total
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq = Similarity.annSq8TopK(emb, col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(sq).size.toDouble / brute.size
    assert(recall >= 0.8, s"SQ8 recall $recall too low")
  }

  test("IVF,SQ8 equals the pure-SQ8 ranking restricted to probed lists") {
    // the composite index must be the IVF candidate generator + the
    // SQ8 scorer, nothing else: its results are a subset of flat SQ8's
    // candidate space with identical integer scores
    val ivfsq = Similarity.annIvfSq8TopK(emb, col("vec_id") < 10, k = 5)
    assert(ivfsq.groupBy("query_id").count()
      .filter(col("count") =!= 5).count() === 0L)
    val flatScores = Similarity.annSq8TopK(emb, col("vec_id") < 10, k = 1000)
      .select("query_id", "neighbor_id", "qdot")
    // every (query, neighbor, qdot) the composite emits appears with
    // the same exact integer score in the flat scan
    assert(ivfsq.select("query_id", "neighbor_id", "qdot")
      .exceptAll(flatScores).count() === 0L)
  }

  test("PQ codes are bounded sub-centroid ids with usable ADC recall") {
    val books = Similarity.pqCodebooks(emb, dim = 64, m = 8, ks = 16, iters = 2)
    assert(books.length === 8 && books.forall(_.length === 16) &&
      books.forall(_.forall(_.length === 8)))
    val pq = Similarity.annPqTopK(emb, col("vec_id") < 10, k = 5)
    assert(pq.groupBy("query_id").count()
      .filter(col("count") =!= 5).count() === 0L)
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pq.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    // ADC shortlist + exact refine: recall is set by whether the true
    // neighbor makes the 50-candidate shortlist, then refine is exact
    assert(recall >= 0.5, s"PQ ADC+refine recall $recall too low")
  }

  test("clusterBalancedSample caps every cluster and keeps determinism") {
    val s1 = Similarity.clusterBalancedSample(emb, cap = 10)
    val kept = s1.filter(col("keep")).groupBy("cluster").count()
    assert(kept.filter(col("count") > 10).count() === 0L,
      "no cluster may exceed its cap")
    // every cluster with ≥cap members keeps exactly cap
    val sizes = s1.groupBy("cluster").count().withColumnRenamed("count", "n")
    val full = kept.join(sizes, "cluster")
      .filter(col("n") >= 10 && col("count") =!= 10).count()
    assert(full === 0L, "a full cluster must keep exactly cap members")
    // re-run stability: same salt → identical keep set
    val a = s1.filter(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet
    val b = Similarity.clusterBalancedSample(emb, cap = 10)
      .filter(col("keep")).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("AnnIndex: stored-index query equals the in-session operator and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("ann_idx").toString
    AnnIndex.build(emb, dir)
    val stored = AnnIndex.query(spark, dir, emb.filter(col("vec_id") < 10), k = 5)
    val inSession = Similarity.annIvfSq8TopK(emb, col("vec_id") < 10, k = 5)
    assert(stored.exceptAll(inSession).isEmpty &&
      inSession.exceptAll(stored).isEmpty,
      "the durable index must return bit-identical results")
    // partition pruning: the probed-cluster literal must land as a
    // PARTITION filter on the codes scan (NOT a post-scan predicate —
    // inputFiles/DataFrame-level listings show the unpruned relation,
    // so inspect the scan node itself)
    val one = AnnIndex.query(spark, dir,
      emb.filter(col("vec_id") === 0), k = 3, nprobe = 1)
    val scans = one.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.exists(_.references.exists(_.name == "cluster")) => f
    }
    assert(scans.nonEmpty, "codes scan must carry a cluster partition filter")
    // the filter names exactly the single probed cluster id
    val inVals = scans.head.partitionFilters.map(_.toString).mkString(";")
    assert(inVals.contains("IN") || inVals.contains("="),
      s"expected a literal cluster membership filter, got $inVals")
    val allDirs = new java.io.File(s"$dir/codes").listFiles()
      .count(_.getName.startsWith("cluster="))
    assert(allDirs > 1, "index must actually be split across partitions")
    assert(one.count() === 3)
    // append: a near-copy of vector 0 (id-shifted) joins its cluster
    // and becomes visible to the next query without a rebuild
    val clone = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(900000L))
    AnnIndex.append(spark, dir, clone)
    val after = AnnIndex.query(spark, dir,
        emb.filter(col("vec_id") === 0), k = 1)
      .select("neighbor_id").head().getLong(0)
    assert(after === 900000L,
      "an appended identical vector must be its source's top neighbor")
    // train-on-sample (FAISS's standard form): quantizer from the even
    // half, codes covering ALL — identical to build-on-half + append
    // of the rest (the quantizer is immutable, so both code every
    // vector against the same centroids)
    val d2 = java.nio.file.Files.createTempDirectory("ann_idx2").toString
    AnnIndex.build(emb, d2,
      trainOn = Some(emb.filter(col("vec_id") % 2 === 0)))
    val d3 = java.nio.file.Files.createTempDirectory("ann_idx3").toString
    AnnIndex.build(emb.filter(col("vec_id") % 2 === 0), d3)
    AnnIndex.append(spark, d3, emb.filter(col("vec_id") % 2 =!= 0))
    val qs = emb.filter(col("vec_id") < 10)
    val viaSample = AnnIndex.query(spark, d2, qs, k = 5)
    val viaAppend = AnnIndex.query(spark, d3, qs, k = 5)
    assert(viaSample.exceptAll(viaAppend).isEmpty &&
      viaAppend.exceptAll(viaSample).isEmpty)
  }

  test("IVF ANN achieves reasonable recall vs brute force") {
    val emb = graft.model.Tables.load(spark, s"$sf0001/embeddings.parquet")
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 20, k = 5)
      .select("query_id", "neighbor_id")
    val ivf = Similarity.annIvfTopK(emb, col("vec_id") < 20, k = 5)
      .select("query_id", "neighbor_id")
    val hits = ivf.intersect(brute).count().toDouble
    val total = brute.count().toDouble
    assert(hits / total >= 0.5, s"IVF recall ${hits / total} < 0.5")
    // every query returns exactly k ranked neighbors
    val counts = Similarity.annIvfTopK(emb, col("vec_id") < 20, k = 5)
      .groupBy("query_id").count().select("count").distinct().collect()
    assert(counts.map(_.getLong(0)).forall(_ == 5))
  }

  test("nearDupGroups assigns min-reachable id across chained pairs") {
    import spark.implicits._
    // chain 1-2-3 plus isolated pair (7,9): groups {1,2,3}->1, {7,9}->7
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("i", "j")
    val out = Dedup.nearDupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("segmentDedup drops repeated segments globally and reassembles in order") {
    import spark.implicits._
    val w = 4
    // docA: two 4-token segments; docB: docA's first segment + a fresh
    // one; docC repeats ITS OWN first segment (intra-doc dup)
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "p q r s p q r s")
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(d, width = w).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 2L, "a b c d e f g h")))
    // docB's first segment lost to docA (lower doc_id)
    assert(out(2L) === ((2L, 1L, "x y z w")))
    // docC's second copy of its own segment drops; first stays
    assert(out(3L) === ((2L, 1L, "p q r s")))
  }

  test("boilerplatePurge removes EVERY occurrence of a corpus-frequent segment") {
    import spark.implicits._
    val w = 4
    // "a b c d" appears in 3 distinct docs (boilerplate at minDocs=3) —
    // ALL copies go, including the first; "p q r s" appears twice in
    // doc 3 but only ONE distinct doc, so intra-doc repetition survives
    val d = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"),
      (3L, "a b c d p q r s p q r s")
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplatePurge(d, width = w, minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((2L, 1L, "e f g h")))
    assert(out(2L) === ((2L, 1L, "x y z w")))
    assert(out(3L) === ((3L, 2L, "p q r s p q r s")))
    // below the frequency bar nothing is touched
    val none = Dedup.boilerplatePurge(d, width = w, minDocs = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(none === Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
  }

  test("embedDecontam: per-train verdicts match the brute max-cosine rule") {
    val evalPred = col("vec_id") % 17 === 3
    val out = Similarity.embedDecontam(emb, evalPred, threshold = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val nTrain = emb.filter(!evalPred).count()
    assert(emb.filter(evalPred).count() > 0)
    assert(out.length === nTrain)          // one verdict per train vector
    assert(out.forall(_._1 % 17 != 3))     // eval rows are never judged
    // the verdict equals a directly-computed max-cosine per train row
    val ev = emb.filter(evalPred)
      .select(col("vec_id").as("eid"), col("embedding").as("evv"))
    val chk = emb.filter(!evalPred).crossJoin(ev)
      .withColumn("sim", round(Similarity.cosine(col("embedding"), col("evv")), 6))
      .groupBy("vec_id").agg(max("sim").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { case (id, _, maxSim, contaminated) =>
      assert(maxSim === chk(id))
      assert(contaminated === (chk(id) >= 0.4))
    }
    // an empty eval slice yields all-clean verdicts, not an empty frame
    val clean = Similarity.embedDecontam(emb, lit(false), 0.4).collect()
    assert(clean.length === emb.count())
    assert(clean.forall(r => !r.getBoolean(3) && r.isNullAt(1) && r.isNullAt(2)))
  }

  test("hardNegatives = brute ranking with the positive band cut out") {
    val t = 0.35
    val hard = Similarity.hardNegatives(emb, col("vec_id") < 10, k = 5,
        posThreshold = t)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // no positive leaks past the cut
    assert(hard.forall(_._4 < t))
    // equals brute top-k computed over the sub-threshold universe: take
    // a deep brute list, drop positives, re-rank, truncate to k
    val brute = Similarity.bruteTopK(emb, col("vec_id") < 10, k = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val expected = brute.filter(_._3 < t).groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy(x => (-x._3, x._2)).take(5).zipWithIndex
        .map { case ((_, n, s), i) => (q, i + 1, n, s) }
    }.toSet
    assert(hard.toSet === expected)
  }

  test("knnClassify: leak-free majority vote with deterministic ties") {
    val out = Similarity.knnClassify(emb, col("vec_id") % 20 === 0, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // one verdict per query, queries never among voters
    assert(out.map(_._1).distinct.length === out.length)
    assert(out.forall(_._1 % 20 === 0))
    assert(out.forall(r => r._4 >= 1L && r._4 <= 10L))
    // cross-check one query against a hand vote from the brute list
    val q0 = out.head._1
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val nbrs = Similarity.bruteTopK(emb.filter(col("vec_id") % 20 =!= 0 ||
          col("vec_id") === q0), col("vec_id") === q0, k = 10)
      .collect().map(r => r.getLong(2))
    val vote = nbrs.map(labels).groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy { case (l, n) => (-n, l) }.head
    val got = out.find(_._1 === q0).get
    assert((got._3, got._4) === ((vote._1, vote._2.toLong)))
  }

  test("substringDedup cuts UNALIGNED duplicated spans; first occurrence survives") {
    import spark.implicits._
    val k = 4
    // docB embeds docA's 6-token run at a shifted offset — fixed-width
    // segment dedup would miss it, sliding windows must not. docC is
    // untouched unique text.
    val run = "r1 r2 r3 r4 r5 r6"
    val d = Seq(
      (1L, run),
      (2L, s"x1 x2 x3 $run y1"),
      (3L, "u1 u2 u3 u4 u5")
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedup(d, k = k).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docA: globally-first occurrence of every duplicated window — intact
    assert(out(1L) === ((6L, 6L, run)))
    // docB: covered positions 3..8 cut, prefix+suffix survive
    assert(out(2L) === ((10L, 4L, "x1 x2 x3 y1")))
    assert(out(3L) === ((5L, 5L, "u1 u2 u3 u4 u5")))
  }

  test("incrementalNearDups matches new docs against the corpus only") {
    import spark.implicits._
    // near-copy of corpus doc 1 arriving as new doc 100001, plus two
    // identical NEW docs (100002/100003) that must NOT pair intra-batch
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(100001L))
      .withColumn("text", concat(col("text"), lit(" xyzzy plugh")))
    val twinText = docs.filter(col("doc_id") === 2).select("text").head().getString(0)
    val batch = near.select("doc_id", "text")
      .unionByName(Seq((100002L, twinText), (100003L, twinText)).toDF("doc_id", "text"))
    val all = docs.select("doc_id", "text").unionByName(batch)
    val pairs = Dedup.incrementalNearDups(all, col("doc_id") >= 100000L, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100001L, 1L)))
    // the twin batch docs match corpus doc 2, not each other
    assert(pairs.contains((100002L, 2L)) && pairs.contains((100003L, 2L)))
    assert(!pairs.exists { case (i, j) => i >= 100000L && j >= 100000L })
    // corpus-corpus pairs never surface
    assert(pairs.forall { case (i, j) => i >= 100000L && j < 100000L })
  }

  test("knnGraph covers every vector with k ranked neighbors at usable recall") {
    val k = 5
    val g = Similarity.knnGraph(emb, k = k).collect()
    val n = emb.count()
    // every vector is a query with exactly k neighbors ranked 1..k
    val byQ = g.groupBy(_.getLong(0))
    assert(byQ.size === n)
    assert(byQ.values.forall(_.map(_.getInt(1)).sorted.sameElements(1 to k)))
    // recall vs brute over all queries
    val brute = Similarity.bruteTopK(emb, lit(true), k = k).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = g.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = brute.intersect(got).size.toDouble / brute.size
    assert(recall >= 0.3, s"knnGraph recall $recall too low")
  }

  test("semanticDedup keeps cluster minima; thresholds bound the keep set") {
    val all = Similarity.semanticDedup(emb, threshold = 0.9).collect()
    assert(all.length === emb.count())
    // the lowest id in every cluster is always kept (no lower-id mate)
    val minPerCluster = all.groupBy(_.getInt(1)).values.map(_.map(_.getLong(0)).min).toSet
    assert(all.filter(r => minPerCluster(r.getLong(0))).forall(_.getBoolean(2)))
    // threshold above any cosine: everything kept
    val loose = Similarity.semanticDedup(emb, threshold = 1.1).collect()
    assert(loose.forall(_.getBoolean(2)))
    // threshold at -1: only the cluster minimum survives (every pair qualifies)
    val tight = Similarity.semanticDedup(emb, threshold = -1.0).collect()
    assert(tight.count(_.getBoolean(2)) === minPerCluster.size)
  }

  test("tfidfTopTerms ranks salient terms; a corpus-wide term never wins") {
    import spark.implicits._
    val tiny = Seq(
      (1L, "apple apple apple common"),
      (2L, "banana banana common common"),
      (3L, "cherry common")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(tiny, k = 2).collect()
      .groupBy(_.getLong(0))
    // rank 1 is the doc's own repeated rare term, not 'common' (df=3 → idf 0... negative? ln(4/4)=0)
    assert(top(1L).minBy(_.getLong(1)).getString(2) === "apple")
    assert(top(2L).minBy(_.getLong(1)).getString(2) === "banana")
    assert(top(3L).minBy(_.getLong(1)).getString(2) === "cherry")
    // ranks are 1..k, dense, per doc
    top.values.foreach(rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to rs.length).toSeq))
    // real corpus: every doc with tokens appears, at most k rows each
    val full = TextAnalysis.tfidfTopTerms(docs, k = 3)
    val perDoc = full.groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 3))
    assert(perDoc.length === docs.filter(length(col("text")) > 0).count())
  }

  test("pplBuckets: ntile path splits terciles; thresholds path agrees map-side") {
    val exact = TextAnalysis.pplBuckets(docs, exactNtile = true).cache()
    val n = exact.count()
    val byB = exact.groupBy("ppl_bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("head", "middle", "tail").subsetOf(byB.keySet))
    assert(byB.values.max - byB.values.min <= 1) // ntile balance
    // derive the cutoffs the exact split chose, rerun map-side: same buckets
    val headMin = exact.filter(col("ppl_bucket") === "head")
      .agg(min("avg_logp")).head().getDouble(0)
    val midMin = exact.filter(col("ppl_bucket") === "middle")
      .agg(min("avg_logp")).head().getDouble(0)
    val mapped = TextAnalysis.pplBuckets(docs, Some((headMin, midMin)))
    val diff = exact.alias("a").join(mapped.alias("b"), Seq("doc_id"))
      .filter(col("a.ppl_bucket") =!= col("b.ppl_bucket")).count()
    // boundary docs sharing the cutoff score may land either side of a
    // RANK split but always below the THRESHOLD split — allow only ties
    val tieDocs = exact.groupBy("avg_logp").count().filter(col("count") > 1)
      .join(exact, Seq("avg_logp")).count()
    assert(diff <= tieDocs, s"$diff bucket mismatches exceed $tieDocs boundary ties")
    assert(n === docs.filter(length(col("text")) > 0).count())
    // DEFAULT path (scale-safe self-derived cutoffs): all three
    // buckets populated, roughly tercile-sized (approx_percentile
    // tolerance), deterministic across invocations
    val dflt = TextAnalysis.pplBuckets(docs).cache()
    val dByB = dflt.groupBy("ppl_bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("head", "middle", "tail").subsetOf(dByB.keySet))
    assert(dByB.values.min >= n / 5, s"default terciles too skewed: $dByB")
    val dflt2 = TextAnalysis.pplBuckets(docs)
    assert(dflt.alias("a").join(dflt2.alias("b"), Seq("doc_id"))
      .filter(col("a.ppl_bucket") =!= col("b.ppl_bucket")).count() === 0L)
    intercept[IllegalArgumentException] {
      TextAnalysis.pplBuckets(docs, Some((0.0, -1.0)), exactNtile = true)
    }
  }

  test("canonicalKeep keeps exactly the best-quality member per group") {
    // doc 100001 near-dups doc 1 but is LONGER (higher quality via the
    // length term, still jaccard ≥ 0.8) — the keep-list must prefer it
    // over min-id doc 1
    val near = docs.filter(col("doc_id") === 1)
      .withColumn("doc_id", lit(100001L))
      .withColumn("text", concat(col("text"), lit(" alpha beta gamma")))
    val all = docs.unionByName(near)
    val keep = Dedup.canonicalKeep(all).cache()
    assert(keep.count() === all.count())
    // exactly one keeper per group
    val perGroup = keep.filter(col("keep"))
      .groupBy("group_id").count().collect()
    assert(perGroup.forall(_.getLong(1) === 1L))
    assert(keep.select(count_distinct(col("group_id"))).head().getLong(0)
      === perGroup.length.toLong)
    // the kept member IS the group's max quality
    val q = Dedup.canonicalKeep(all)
    val bad = q.alias("a").join(q.alias("b"),
        col("a.group_id") === col("b.group_id") &&
        col("a.keep") && !col("b.keep") &&
        col("b.quality") > col("a.quality")).count()
    assert(bad === 0L)
    // and for the injected pair specifically, the longer doc wins
    val g1 = keep.filter(col("doc_id").isin(1L, 100001L)).collect()
    assert(g1.map(_.getLong(1)).distinct.length === 1, "1 and 100001 must share a group")
    assert(g1.find(_.getLong(0) === 100001L).get.getBoolean(3),
      "higher-quality member must be kept")
    assert(!g1.find(_.getLong(0) === 1L).get.getBoolean(3))
  }

  test("bm25: rare-term match outranks common-term match; idf orders docs") {
    import spark.implicits._
    // q (doc 0) asks for "alpha zebra"; doc 1 shares only the corpus-wide
    // common term, doc 2 the rare one → doc 2 must score higher
    val tiny = Seq(
      0L -> "alpha zebra",
      1L -> "alpha alpha alpha noise words here",
      2L -> "zebra stripes pattern detail",
      3L -> "alpha other things entirely",
      4L -> "alpha more filler content").toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(tiny, col("doc_id") === 0, k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    val byDoc = got.map(t => t._1 -> t._2).toMap
    // the query doc itself contains both terms → rank 1
    assert(byDoc(0L) === 1L, s"self-match must rank first: ${got.toSeq}")
    assert(byDoc(2L) < byDoc(1L),
      s"rare 'zebra' doc must outrank common 'alpha' doc: ${got.toSeq}")
    // scores strictly descend with rank (ties impossible here)
    val ordered = got.sortBy(_._2).map(_._3)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    import spark.implicits._
    val tiny = Seq(
      0L -> "target",
      1L -> "target short",
      2L -> ("target " + Seq.fill(40)("pad").mkString(" ")),
      3L -> "pad pad pad").toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(tiny, col("doc_id") === 0, k = 4)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    assert(got(1L) > got(2L), s"shorter doc with equal tf must score higher: $got")
    assert(!got.contains(3L), "doc without any query term must be absent")
  }

  test("rrf fusion: score is exactly the sum of the audit-rank terms") {
    val fused = Similarity.rrfFuse(docs, emb,
      lexPred = col("doc_id") % 17 === 0, densePred = col("vec_id") % 17 === 0,
      kEach = 10, kOut = 5)
    val rows = fused.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lexR = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val denR = if (r.isNullAt(5)) None else Some(r.getLong(5))
      val expect = lexR.map(x => 1000000000L / (60 + x)).getOrElse(0L) +
        denR.map(x => 1000000000L / (60 + x)).getOrElse(0L)
      assert(r.getLong(3) === expect, s"rrf_q mismatch in $r")
      assert(lexR.isDefined || denR.isDefined, "row on neither list")
    }
    // per query: ranks are 1..n and scores non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("retrieval nDCG: hand-computed 4-vector case") {
    import spark.implicits._
    // query 0 (label 1): neighbors by cosine are 1 (label 1), then 2
    // (label 2), then 3 (label 1) → rel pattern 1,0,1
    val tiny = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.95f, 0.31f), 1),
      (2L, Array(0.5f, 0.87f), 2),
      (3L, Array(0.05f, 0.999f), 1)).toDF("vec_id", "embedding", "label")
    val r = Similarity.retrievalNdcg(tiny, col("vec_id") === 0, k = 3).head()
    val w1 = 1000000L                                  // floor(1e6/log2(2))
    val w2 = math.floor(1e6 / (math.log(3) / math.log(2))).toLong // 630929
    val w3 = math.floor(1e6 / 2.0).toLong              // 500000
    assert(r.getAs[Long]("n_rel_topk") === 2L)
    assert(r.getAs[Long]("r_corpus") === 2L)   // two other label-1 docs
    assert(r.getAs[Long]("first_rel") === 1L)
    assert(r.getAs[Long]("mrr_q") === 1000000L)
    assert(r.getAs[Long]("dcg_q") === w1 + w3) // relevant at ranks 1 and 3
    assert(r.getAs[Long]("idcg_q") === w1 + w2) // ideal: 2 relevant up front
    val expectedNdcg = math.rint((w1 + w3).toDouble / (w1 + w2) * 1e6) / 1e6
    assert(math.abs(r.getAs[Double]("ndcg") - expectedNdcg) < 1e-6)
  }
  test("hammingBits64 ≡ per-char diff count on random 64-bit fingerprints") {
    // r17-opt pinned equivalence: the conv/xor/bit_count form that
    // replaced the filter/sequence lambda in the near-dup verifies must
    // count EXACTLY the differing chars of two 64-char binary strings —
    // including the all-zeros/all-ones edges and signed-long-risky
    // high-bit patterns (bit 0 set).
    import spark.implicits._
    val rnd = new scala.util.Random(42L)
    def fp(): String = {
      val sb = new StringBuilder(64)
      (0 until 64).foreach(_ => sb.append(if (rnd.nextBoolean()) '1' else '0'))
      sb.toString
    }
    val edge = Seq(
      ("0" * 64, "1" * 64), ("1" * 64, "1" * 64),
      ("1" + "0" * 63, "0" * 63 + "1"),
      ("1" * 16 + "0" * 48, "0" * 48 + "1" * 16))
    val pairs = (edge ++ (0 until 200).map(_ => (fp(), fp())))
      .toDF("ha", "hb")
    val got = pairs.select(col("ha"), col("hb"),
      ext.Multimodal.hammingBits64(col("ha"), col("hb")).as("h"))
      .collect()
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val expect = a.zip(b).count { case (x, y) => x != y }
      assert(r.getInt(2) === expect, s"hamming($a, $b)")
    }
  }
}
