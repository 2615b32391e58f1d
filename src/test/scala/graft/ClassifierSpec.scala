package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classifier, Similarity}

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Two lexically distinct dialects + shared filler: the classifier
    * must separate them from word choice alone. */
  private def corpus(n: Int): Seq[(Long, String, Int)] = {
    val rnd = new scala.util.Random(13)
    val good = Array("insight", "rigor", "method", "proof", "theory")
    val bad = Array("clickbait", "outrage", "gossip", "scandal", "hype")
    val fill = Array("the", "a", "of", "and", "to", "in", "report")
    (1 to n).map { i =>
      val label = i % 2
      val marked = if (label == 1) good else bad
      val words = (1 to 20).map { _ =>
        if (rnd.nextInt(3) == 0) marked(rnd.nextInt(marked.length))
        else fill(rnd.nextInt(fill.length))
      }
      (i.toLong, words.mkString(" "), label)
    }
  }

  test("LR separates planted dialects; loss descends") {
    val df = corpus(400).toDF("doc_id", "text", "label")
    val (model, losses) = Classifier.train(df, "doc_id", "text",
      labelPred = col("label") === 1, dim = 512, iters = 25, lr = 2.0,
      seed = "spec")
    // full-batch GD on a convex loss: strictly non-increasing trace
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"loss rose: $a -> $b")
    }
    assert(losses.last < losses.head * 0.7, "training barely moved")
    val scored = Classifier.score(model, df, "doc_id", "text")
      .join(df.select(col("doc_id"), col("label")), "doc_id")
    val acc = scored.filter((col("prob") >= 0.5) === (col("label") === 1))
      .count().toDouble / 400
    assert(acc >= 0.95, s"train accuracy $acc")
    // empty doc scores through the bias alone, no crash
    val e = Classifier.score(model,
      Seq((9L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .select("margin").as[Double].head()
    assert(math.abs(e - model.bias) < 1e-12)
  }

  test("filterByQuality keeps the exact top fraction by prob") {
    val df = corpus(200).toDF("doc_id", "text", "label")
    val out = Classifier.filterByQuality(df, "doc_id", "text",
      labelPred = col("label") === 1, keepBp = 2500, dim = 512,
      iters = 20, lr = 2.0, seed = "spec")
    val kept = out.filter(col("selected")).select("doc_id", "prob_bp")
      .as[(Long, Long)].collect()
    assert(kept.length == 50) // 25% of 200, exact
    // everything kept scores >= everything dropped (boundary ties by id)
    val dropped = out.filter(!col("selected")).select("prob_bp")
      .as[Long].collect()
    assert(kept.map(_._2).min >= dropped.max - 0L ||
      kept.map(_._2).min >= dropped.max)
    // the kept set is overwhelmingly the positive dialect
    val labels = df.select("doc_id", "label").as[(Long, Int)]
      .collect().toMap
    val posShare = kept.count(k => labels(k._1) == 1).toDouble / 50
    assert(posShare >= 0.9, s"positive share $posShare")
  }

  test("randomProject preserves pairwise geometry within JL bounds") {
    val rnd = new scala.util.Random(29)
    val d = 64
    val vecs = (1 to 40).map(i =>
      (i.toLong, Array.fill(d)(rnd.nextGaussian())))
    val df = vecs.toDF("vec_id", "emb")
    val out = Similarity.randomProject(df, "emb", k = 32, dim = d,
        seed = "jlspec")
      .select(col("vec_id"), col("projected"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(out.values.forall(_.length == 32))
    // deterministic across runs
    val again = Similarity.randomProject(df, "emb", k = 32, dim = d,
        seed = "jlspec")
      .select(col("vec_id"), col("projected"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(again == out)
    // norms concentrate around the originals (E‖Px‖² = ‖x‖²); with
    // k = 32 allow a generous but non-vacuous band
    val orig = vecs.toMap
    val ratios = vecs.map { case (id, v) =>
      val pn = math.sqrt(out(id).map(x => x * x).sum)
      val on = math.sqrt(v.map(x => x * x).sum)
      pn / on
    }
    assert(ratios.forall(r => r > 0.5 && r < 1.6),
      s"norm ratio out of band: ${ratios.min} .. ${ratios.max}")
    // distinct seeds give a different projection
    val other = Similarity.randomProject(df, "emb", k = 32, dim = d,
        seed = "jlspec2")
      .select(col("vec_id"), col("projected"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(other != out)
  }
}
