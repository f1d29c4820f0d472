package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing semantics: binary column flow, generator-shaped
  * frame sampling, and the per-partition decode stub.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary metadata: sizes match utf-8 byte lengths") {
    val meta = Multimodal.mBinaryMeta(spark, sf)
    val mismatch = meta.join(Tables.documents(spark, sf), "doc_id")
      .filter(col("n_bytes") =!= length(encode(col("text"), "UTF-8")))
    assert(mismatch.count() === 0)
  }

  test("vad stub: windows match a driver recompute; segment invariants hold") {
    // window energies == driver-side PCM math on the same payload
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val wantWin = texts.flatMap { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      (0 until bytes.length / Multimodal.VadWin).map { w =>
        var e = 0L
        (0 until Multimodal.VadWin).foreach { j =>
          val v = (bytes(w * Multimodal.VadWin + j) & 0xff) - 128
          e += v.toLong * v
        }
        (id, w, e)
      }
    }.toSet
    val gotWin = Multimodal.audioWindows(spark, sf)
      .collect().map(a => (a.doc_id, a.win_idx, a.energy)).toSet
    assert(gotWin === wantWin && gotWin.nonEmpty)
    // per-doc report invariants: counts tile, the mean rule guarantees
    // at least one voiced window whenever any window exists
    val rep = Multimodal.mVadStub(spark, sf)
      .as[(Long, Int, Int, Int, Int)].collect()
    assert(rep.length === texts.size)
    rep.foreach { case (id, nWin, nVoiced, nSeg, longest) =>
      assert(nWin === texts(id).getBytes("UTF-8").length / Multimodal.VadWin)
      if (nWin > 0) assert(nVoiced >= 1 && nSeg >= 1, s"doc $id")
      assert(nVoiced <= nWin && longest <= nVoiced && nSeg <= nVoiced)
      if (nSeg > 0) assert(longest >= (nVoiced + nSeg - 1) / nSeg, s"doc $id")
    }
    assert(rep.exists(_._4 > 1), "fixture should produce a multi-segment doc")
  }

  test("frame sampling caps at 8 frames and ids are distinct") {
    val frames = Multimodal.mFrameSample(spark, sf)
    assert(frames.groupBy("doc_id").count()
      .filter(col("count") > 8).count() === 0)
    assert(frames.select("frame_id").distinct().count() === frames.count())
  }

  test("resize stub: deterministic downsample, size ratio and checksum bounds hold") {
    val rows = Multimodal.resizeStub(spark, sf).collect()
    rows.foreach { r =>
      assert(r.resized_bytes === r.orig_bytes / r.factor)
      assert(r.r_sum >= 0 && r.r_sum <= 255L * r.resized_bytes)
      // weights are 1..n, so the weighted checksum dominates the plain sum
      assert(r.r_check >= r.r_sum)
    }
    val again = Multimodal.resizeStub(spark, sf).collect()
    assert(rows.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("a REAL codec drops into the decode seam: java.util.zip round-trip") {
    // the one codec this container does ship — Deflater/Inflater — as
    // the stand-in real decoder: per-partition init builds the native
    // Deflater (exactly where libjpeg/ffmpeg handles would go), the
    // per-row function compresses the payload and verifies a lossless
    // round-trip. Proves the decodeWith seam carries real per-partition
    // native state without touching any stub or plan.
    import spark.implicits._
    val zipped = Multimodal.decodeWith(
      Multimodal.payloads(spark, sf),
      () => {
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        (id: Long, bytes: Array[Byte]) => {
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          val buf = new Array[Byte](bytes.length * 2 + 64)
          val n = deflater.deflate(buf)
          val inflater = new java.util.zip.Inflater()
          inflater.setInput(buf, 0, n)
          val back = new Array[Byte](bytes.length)
          val m = inflater.inflate(back)
          inflater.end()
          // (doc_id, orig, compressed, roundtrip_ok)
          (id, bytes.length, n,
            m == bytes.length && java.util.Arrays.equals(back, bytes))
        }
      }).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(zipped.length.toLong === nDocs)
    assert(zipped.forall(_._4))
    assert(zipped.forall(_._3 > 0))
    // text payloads actually compress — the codec demonstrably ran
    assert(zipped.count(z => z._3 < z._2) > zipped.length / 2)
  }

  test("REAL image decode: ImageIO PNG round trip is pixel-exact; corrupt bytes fail loudly") {
    // the real-codec path the gated m_decode_real certifies every
    // round: deterministic md5-nibble pixels -> real PNG encode ->
    // javax.imageio decode in the seam -> pixel-domain features. Here
    // pin (a) the decoded features against an independent JVM-side
    // recomputation from the nibble definition (no codec), proving the
    // encode->decode round trip returned exactly the source pixels,
    // and (b) that an undecodable payload throws instead of yielding
    // silent garbage features.
    import spark.implicits._
    val got = Multimodal.decodeReal(spark, sf).collect().sortBy(_.doc_id)
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .as[(Long, String)].collect().sortBy(_._1)
      .map { case (id, fp) =>
        val pix = fp.take(32).map(c => Character.digit(c, 16) * 16)
        val sum = pix.map(_.toLong).sum
        val hash = pix.zipWithIndex.collect {
          case (p, i) if p.toLong * 32 > sum => 1L << i
        }.sum
        Multimodal.DecodedImage(id, 8, 4, sum, hash)
      }
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    // the hash must not be degenerate (all-zero / all-one everywhere)
    assert(got.map(_.phash32).distinct.length > 1)
    // corrupt payload: ImageIO.read returns null -> the seam throws
    val bad = Seq((1L, Array[Byte](1, 2, 3, 4))).toDS()
    val ex = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeWith(bad, () => (id: Long, bytes: Array[Byte]) => {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"undecodable image payload for doc $id")
        id
      }).collect()
    }
    assert(ex.getMessage.contains("undecodable") ||
      Option(ex.getCause).exists(_.getMessage.contains("undecodable")))
  }

  test("decode stub: histogram mass equals byte count; deterministic") {
    val feats = Multimodal.decodeStub(spark, sf).collect()
    feats.foreach { f =>
      assert(f.histogram.split(',').map(_.toInt).sum === f.n_bytes)
      assert(f.brightness >= 0.0 && f.brightness <= 255.0)
    }
    val again = Multimodal.decodeStub(spark, sf).collect()
    assert(feats.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("shard pack: conserves items and bytes; doc ranges tile in order; overshoot bounded") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long").as("nb"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val shards = Multimodal.mShardPack(spark, sf)
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    assert(shards.map(_._2).sum === docs.length, "item conservation")
    assert(shards.map(_._3).sum === docs.map(_._2).sum, "byte conservation")
    // shard ids strictly increase and doc ranges tile without overlap
    shards.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1 && a._5 < b._4, s"ranges overlap: $a / $b")
      case _ =>
    }
    // offset contract: shard bytes <= budget + the largest single item
    // (only the straddler may overshoot)
    val maxItem = docs.map(_._2).max
    shards.foreach { sh =>
      assert(sh._3 <= Multimodal.ShardBudget + maxItem,
        s"shard ${sh._1} overshoots beyond one straddler: ${sh._3}")
      assert(sh._6 === sh._3 * 1000000L / Multimodal.ShardBudget, "fill_ppm")
    }
    // independent replay of the offset rule
    var off = 0L
    val expect = docs.map { case (id, nb) =>
      val sid = (off / Multimodal.ShardBudget).toInt; off += nb; (id, sid)
    }.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    shards.foreach(sh => assert(expect(sh._1) === sh._2,
      s"shard ${sh._1} item count vs replay"))
  }

  test("phash pairs: value-level rows reproduce the brute-force doc-pair census") {
    import spark.implicits._
    val hashes = Multimodal.phashStub(spark, sf).collect()
    // brute-force doc-level ground truth, collapsed to the value level
    val wantDocPairs = (for {
      i <- hashes.indices.iterator
      j <- (i + 1) until hashes.length
      h = Integer.bitCount(hashes(i).phash16 ^ hashes(j).phash16)
      if h <= Multimodal.PhashMaxHamming
    } yield {
      val (a, b) = (hashes(i).phash16, hashes(j).phash16)
      (math.min(a, b), math.max(a, b))
    }).toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Multimodal.mPhashPairs(spark, sf)
      .as[(Int, Int, Int, Long, Long, Long)].collect()
    // every emitted value pair carries the exact doc-pair count, and
    // the value-level census covers the whole brute-force pair set
    got.foreach { case (a, b, h, na, nb, np) =>
      assert(h === Integer.bitCount(a ^ b))
      assert(np === wantDocPairs.getOrElse((a, b), 0L),
        s"value pair ($a,$b) doc-pair count")
    }
    assert(got.map(_._6).sum === wantDocPairs.values.sum, "total doc pairs")
    assert(got.map(r => (r._1, r._2)).toSet === wantDocPairs.keySet)
  }

  test("scene cuts: per-clip frames bounded by the generator cap; cuts < frames") {
    import spark.implicits._
    val rows = Multimodal.mSceneCut(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (doc, nf, nc) =>
      assert(nf >= 1 && nf <= 8, s"doc $doc frame count $nf outside [1,8]")
      assert(nc >= 0 && nc < nf, s"doc $doc cuts $nc vs frames $nf")
    }
    // clip grain matches the frame generator's (docs with >= 1 frame)
    val docsWithFrames = Multimodal.mFrameSample(spark, sf)
      .select("doc_id").distinct().count()
    assert(rows.length.toLong === docsWithFrames)
  }

  test("modality stats: counts partition the corpus; avg within [0, max]") {
    import spark.implicits._
    val rows = Multimodal.mModalityStats(spark, sf)
      .as[(String, String, Long, Long, Double, Long)].collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum === total, "modality x lang cells partition docs")
    assert(rows.map(_._1).toSet === Set("image", "audio", "video"))
    rows.foreach { case (m, l, n, tot, avg, mx) =>
      assert(avg > 0 && avg <= mx, s"($m,$l) avg $avg vs max $mx")
      assert(tot >= n, s"($m,$l) total bytes below one byte per doc")
    }
  }

  test("embed fusion: top-20 is sorted, fused consistent with norm and bytes") {
    import spark.implicits._
    val rows = Multimodal.mEmbedFusion(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length === 20)
    val fusedSeq = rows.map(_._4).toSeq
    assert(fusedSeq === fusedSeq.sorted.reverse, "descending fused order")
    rows.foreach { case (doc, nb, nrm, fused) =>
      val want = nrm * math.log(1.0 + nb)
      // both sides rounded to 6 dp; allow the rounding of nrm itself
      assert(math.abs(fused - want) < 1e-4, s"doc $doc fused $fused vs $want")
    }
  }
}
