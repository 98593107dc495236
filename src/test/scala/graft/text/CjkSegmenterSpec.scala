package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CjkSegmenterSpec extends SparkSpec {

  private val dict = CjkSegmenter.starterLexicon

  test("FMM takes the longest dictionary word at each position") {
    assert(CjkSegmenter.segmentRun("机器学习", dict) == Seq("机器学习"))
    // longest match wins over the shorter "学习" inside it
    assert(CjkSegmenter.segmentRun("机器学习工程师", dict) ==
      Seq("机器学习", "工程师"))
    // unknown spans degrade to per-character (the r1/r2 fallback)
    assert(CjkSegmenter.segmentRun("狮子", dict) == Seq("狮", "子"))
    // mixed known/unknown
    assert(CjkSegmenter.segmentRun("我爱机器学习", dict) ==
      Seq("我", "爱", "机器学习"))
  }

  test("lattice DP resolves the overlap ambiguities FMM cannot") {
    // the textbook case: FMM greedily takes 研究生 (graduate student)
    // and strands 命 as an unknown single; the min-cost path prefers
    // three in-vocabulary words — the correct reading
    assert(CjkSegmenter.segmentRun("研究生命科学", dict) ==
      Seq("研究生", "命", "科学"))
    assert(CjkSegmenter.segmentRunDp("研究生命科学", dict) ==
      Seq("研究", "生命", "科学"))
    // on unambiguous text the DP matches FMM (ties break toward the
    // longest word)
    assert(CjkSegmenter.segmentRunDp("机器学习工程师", dict) ==
      Seq("机器学习", "工程师"))
    assert(CjkSegmenter.segmentRunDp("狮子", dict) == Seq("狮", "子"))
    assert(CjkSegmenter.segmentRunDp("我爱机器学习", dict) ==
      Seq("我", "爱", "机器学习"))
    // a long dictionary word is preferred over its in-vocabulary split
    assert(CjkSegmenter.segmentRunDp("自然语言", dict) == Seq("自然语言"))
  }

  test("property: DP segmentation never drops or reorders characters " +
      "and never pays word+stranded-char where two words fit") {
    val rnd = new scala.util.Random(13)
    val dictWords = dict.toVector
    val runs = (1 to 300).map { _ =>
      (1 to rnd.nextInt(8) + 1).map { _ =>
        if (rnd.nextBoolean()) dictWords(rnd.nextInt(dictWords.size))
        else (0x4e00 + rnd.nextInt(0x51a6)).toChar.toString
      }.mkString
    }
    runs.foreach { r =>
      val dp = CjkSegmenter.segmentRunDp(r, dict)
      assert(dp.mkString == r, s"characters lost for: $r")
      // optimality vs the greedy baseline under the DP's own cost
      def cost(seg: Seq[String]): Int =
        seg.map(t => if (t.length > 1) 10 else if (dict.contains(t)) 10
          else 25).sum
      val fmm = CjkSegmenter.segmentRun(r, dict)
      assert(cost(dp) <= cost(fmm),
        s"DP cost ${cost(dp)} exceeds FMM cost ${cost(fmm)} for: $r")
      dp.filter(_.length > 1).foreach(t =>
        assert(dict.contains(t), s"non-dictionary token $t in $r"))
    }
  }

  test("segmentTokens leaves non-CJK tokens untouched") {
    assert(CjkSegmenter.segmentTokens(
      Seq("spark", "机器学习", "c++"), dict) ==
      Seq("spark", "机器学习", "c++"))
  }

  test("column form mirrors the HanLPTokenizer contract") {
    import spark.implicits._
    val df = Seq(
      "I use C++ and 机器学习 at 谷歌",
      "R and scala for 数据分析",
      "x 深度学习框架").toDF("text")
    val got = df.select(CjkSegmenter.cjkAwareDict($"text").as("toks"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("use", "c++", "and", "机器学习", "at", "谷歌"))
    // 1-char non-CJK dropped except whitelisted c/r
    assert(got(1) == Seq("r", "and", "scala", "for", "数据分析"))
    assert(got(2) == Seq("深度学习", "框架"))
  }

  test("property: segmentation never drops or reorders characters " +
      "(concat of tokens == input run)") {
    val rnd = new scala.util.Random(42)
    val dictWords = dict.toVector
    // random mixes of dictionary words and random CJK chars
    val runs = (1 to 200).map { _ =>
      (1 to rnd.nextInt(8) + 1).map { _ =>
        if (rnd.nextBoolean()) dictWords(rnd.nextInt(dictWords.size))
        else (0x4e00 + rnd.nextInt(0x51a6)).toChar.toString
      }.mkString
    }
    runs.foreach { r =>
      assert(CjkSegmenter.segmentRun(r, dict).mkString == r,
        s"characters lost for: $r")
    }
  }

  test("property: every emitted multi-char token is a dictionary word " +
      "and is the longest match at its position") {
    val rnd = new scala.util.Random(7)
    val dictWords = dict.toVector
    val runs = (1 to 200).map { _ =>
      (1 to rnd.nextInt(6) + 1).map { _ =>
        dictWords(rnd.nextInt(dictWords.size))
      }.mkString
    }
    runs.foreach { r =>
      var pos = 0
      CjkSegmenter.segmentRun(r, dict).foreach { t =>
        if (t.length > 1) {
          assert(dict.contains(t), s"non-dictionary token $t in $r")
          // no strictly longer dictionary word starts at the same spot
          val longer = ((t.length + 1) to math.min(8, r.length - pos))
            .map(l => r.substring(pos, pos + l)).filter(dict.contains)
          assert(longer.isEmpty,
            s"FMM took $t at $pos of $r but ${longer.mkString(",")} matches")
        }
        pos += t.length
      }
      assert(pos == r.length)
    }
  }

  test("broadened lexicon segments everyday compounds") {
    assert(CjkSegmenter.segmentRun("我们一起学习数据挖掘", dict) ==
      Seq("我们", "一起", "学习", "数据挖掘"))
    assert(CjkSegmenter.segmentRun("大数据云计算", dict) ==
      Seq("大数据", "云计算"))
  }

  test("r9 breadth pass: realistic dev-corpus sentences segment into " +
      "words, not characters") {
    assert(CjkSegmenter.segmentRun("前端工程师使用微服务架构", dict) ==
      Seq("前端", "工程师", "使用", "微服务", "架构"))
    assert(CjkSegmenter.segmentRun("提交代码然后合并分支", dict) ==
      Seq("提交", "代码", "然后", "合并", "分支"))
    assert(CjkSegmenter.segmentRun("预训练大模型微调", dict) ==
      Seq("预训练", "大模型", "微调"))
    // word-level coverage on a realistic sentence: the two function
    // characters (在/了) stay single, everything else is a word —
    // 7 of 9 tokens (was 15 per-char tokens before the breadth pass)
    val toks = CjkSegmenter.segmentRun("昨天下午我们在机房部署了负载均衡", dict)
    val wordFrac = toks.count(_.length > 1).toDouble / toks.size
    assert(wordFrac >= 0.75, s"got $toks")
  }

  test("empty dictionary degrades exactly to per-character segmentation") {
    import spark.implicits._
    val df = Seq("機器学習 spark").toDF("text")
    val perChar = df.select(Tokenize.cjkAware($"text").as("t"))
      .as[Seq[String]].head()
    val fmmEmpty = df.select(
        CjkSegmenter.cjkAwareDict($"text", Set.empty).as("t"))
      .as[Seq[String]].head()
    assert(fmmEmpty == perChar)
  }
}
