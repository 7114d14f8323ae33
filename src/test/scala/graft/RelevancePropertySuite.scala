package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import scala.util.Random

/** Brute-force exactness checks for graft.api.Relevance on GENERATED
  * corpora (random token streams, several sizes/vocabularies) — the
  * driver's oracle checks one fixed corpus; these recompute TF-IDF, BM25,
  * bigram-LM, and entropy scores independently in plain Scala and demand
  * exact agreement at the operators' own quantization.
  */
class RelevancePropertySuite extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(seed: Int, n: Int, vocab: Int): Seq[(Long, String, String)] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val len = 3 + rnd.nextInt(40)
      val lang = Seq("en", "de")(rnd.nextInt(2))
      (i.toLong, lang, Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" "))
    }
  }

  test("tfIdf ≡ brute force on random corpora") {
    for (seed <- Seq(1, 2)) {
      val docs = corpus(seed, 60, 30)
      val terms = Seq("w0", "w3", "w7")
      val df = docs.toDF("doc_id", "lang", "text")
      val got = graft.api.Relevance
        .tfIdf(df, col("doc_id"), col("text"), terms)
        .select("id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val n = docs.size.toDouble
      val dfs = terms.map(t => docs.count(_._3.split(" ").contains(t)).toDouble)
      docs.foreach { case (id, _, text) =>
        val toks = text.split(" ")
        val expected = terms.indices.map { i =>
          val tf = toks.count(_ == terms(i)).toDouble
          if (tf > 0) tf * math.log(n / dfs(i)) else 0.0
        }.sum
        assert(math.floor(got(id) * 10000) === math.floor(expected * 10000),
          s"seed $seed doc $id")
      }
    }
  }

  test("bm25 ≡ brute force on random corpora") {
    for (seed <- Seq(3, 4)) {
      val docs = corpus(seed, 60, 30)
      val terms = Seq("w1", "w5")
      val (k1, b) = (1.25, 0.75)
      val df = docs.toDF("doc_id", "lang", "text")
      val got = graft.api.Relevance
        .bm25(df, col("doc_id"), col("text"), terms, k1, b)
        .select("id", "score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val n = docs.size.toDouble
      val dfs = terms.map(t => docs.count(_._3.split(" ").contains(t)).toDouble)
      val avgdl = docs.map(_._3.split(" ").length).sum.toDouble / n
      docs.foreach { case (id, _, text) =>
        val toks = text.split(" ")
        val dl = toks.length.toDouble
        val expected = terms.indices.map { i =>
          val tf = toks.count(_ == terms(i)).toDouble
          val idf = math.log((n - dfs(i) + 0.5) / (dfs(i) + 0.5) + 1.0)
          idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }.sum
        assert(math.floor(got(id) * 10000) === math.floor(expected * 10000),
          s"seed $seed doc $id")
      }
    }
  }

  test("bigramLmScore ≡ brute force on a random corpus") {
    val docs = corpus(5, 50, 20)
    val df = docs.toDF("doc_id", "lang", "text")
    val got = graft.api.Relevance
      .bigramLmScore(df, col("doc_id"), col("lang"), col("text"))
      .select("id", "n_big", "sum_lp_c").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val byLang = docs.groupBy(_._2)
    val cu = byLang.map { case (l, ds) =>
      l -> ds.flatMap(_._3.split(" ")).groupBy(identity).map { case (w, xs) => w -> xs.size }
    }
    val vb = byLang.map { case (l, ds) => l -> ds.flatMap(_._3.split(" ")).distinct.size }
    val cb = byLang.map { case (l, ds) =>
      l -> ds.flatMap(_._3.split(" ").sliding(2).filter(_.size == 2).map(_.mkString(" ")))
        .groupBy(identity).map { case (bg, xs) => bg -> xs.size }
    }
    docs.foreach { case (id, lang, text) =>
      val bigs = text.split(" ").sliding(2).filter(_.size == 2).map(_.toSeq).toSeq
      if (bigs.nonEmpty) {
        val lps = bigs.map { bg =>
          val p = (cb(lang)(bg.mkString(" ")) + 1.0) / (cu(lang)(bg.head) + vb(lang))
          math.floor(math.log(p) * 10000).toLong
        }
        val (nBig, sumLp) = got(id)
        assert(nBig === bigs.size.toLong, s"doc $id n_big")
        assert(sumLp === lps.sum, s"doc $id sum_lp")
      } else assert(!got.contains(id), s"doc $id should drop (no bigrams)")
    }
  }

  test("entropyScore ≡ brute force on a random corpus") {
    val docs = corpus(6, 50, 15)
    val df = docs.toDF("doc_id", "lang", "text")
    val got = graft.api.Relevance
      .entropyScore(df, col("doc_id"), col("text"))
      .select("id", "n_tok", "n_distinct", "ent_c").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    docs.foreach { case (id, _, text) =>
      val toks = text.split(" ")
      val n = toks.length.toDouble
      val terms = toks.groupBy(identity).values.map { xs =>
        val p = xs.size / n
        math.floor(p * math.log(p) * -1000000.0).toLong
      }
      val (nTok, nDist, entC) = got(id)
      assert(nTok === toks.length.toLong)
      assert(nDist === toks.distinct.length.toLong)
      assert(entC === terms.sum, s"doc $id entropy")
    }
  }
}
