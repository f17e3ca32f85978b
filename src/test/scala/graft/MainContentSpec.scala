package graft

import graft.functions.{HtmlExtract, MainContent}

/** [[MainContent]] — the jusText-style ladder, heading promotion and
  * neighbor revision on hand vectors, plus the shared-scanner facts
  * ([[HtmlExtract.blocks]]) the classifier depends on.
  */
class MainContentSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val en = MainContent.Params(stopwords = Set(
    "the", "a", "of", "and", "to", "in", "is", "it", "that", "was"))

  private def block(text: String, anchor: Int = 0,
                    heading: Boolean = false) =
    HtmlExtract.Block(text, text.count(!_.isWhitespace), anchor, heading)

  // ≥70 chars, stopword-rich: CF good needs > 200 chars too
  private val goodText =
    ("the cat sat in the hat and it was a fine day to think of it " * 4).trim
  private val nearText = // 70..200 chars, stopword-rich → neargood
    "the cat sat in the hat and it was a fine day to think of it all over again"

  test("context-free ladder: every rung, integer thresholds") {
    def cf(b: HtmlExtract.Block) =
      MainContent.classify(IndexedSeq(b), en).head.cfClass
    // link density strictly > 0.2 (5·anchor > nonws)
    assert(cf(block("x" * 100 + " y", anchor = 21)) == "bad")
    // copyright beats length/stopwords
    assert(cf(block("© 2026 someone, " + goodText)) == "bad")
    // short without anchors defers; with anchors it's furniture
    assert(cf(block("Tiny title")) == "short")
    assert(cf(block("Read more", anchor = 8)) == "bad")
    // stopword-rich long → good; same density at ≤200 chars → neargood
    assert(cf(block(goodText)) == "good")
    assert(goodText.length > 200 && nearText.length <= 200)
    assert(cf(block(nearText)) == "neargood")
    // stopword-poor long → bad
    assert(cf(block("lorem ipsum dolor sit amet consectetur " * 3)) == "bad")
  }

  test("neargood revision: bad only when BOTH anchors are bad; " +
      "edges default bad") {
    val alone = MainContent.classify(IndexedSeq(block(nearText)), en)
    assert(alone.head.finalClass == "bad") // edge+edge = bad+bad
    val after = MainContent.classify(
      IndexedSeq(block(goodText), block(nearText)), en)
    assert(after(1).finalClass == "good") // prev good rescues
  }

  test("short revision: good+good → good, bad+bad → bad, mixed " +
      "needs the neargood bridge") {
    val sandwich = MainContent.classify(IndexedSeq(
      block(goodText), block("Tiny title"), block(goodText)), en)
    assert(sandwich(1).finalClass == "good")
    val lonely = MainContent.classify(IndexedSeq(
      block("Nav", anchor = 3), block("Tiny title"),
      block("Read more", anchor = 8)), en)
    assert(lonely(1).finalClass == "bad")
    // mixed without a bridge: bad side's nearest non-short is bad
    val mixed = MainContent.classify(IndexedSeq(
      block(goodText), block("Tiny title"), block("Read more", anchor = 8)),
      en)
    assert(mixed(1).finalClass == "bad")
    // mixed WITH the bridge: a neargood between the short and the bad
    val bridged = MainContent.classify(IndexedSeq(
      block(goodText), block("Tiny title"), block(nearText),
      block("Read more", anchor = 8)), en)
    assert(bridged(1).finalClass == "good")
  }

  test("heading promotion: a short heading near a following good " +
      "block joins its section; distance past 200 chars does not") {
    val near = MainContent.classify(IndexedSeq(
      block("Section one", heading = true), block(goodText)), en)
    assert(near(0).cfClass == "short" && near(0).finalClass == "good")
    // same heading, but 200+ chars of bad furniture in between
    val farFiller = block("z" * 250 + " y")
    val far = MainContent.classify(IndexedSeq(
      block("Section one", heading = true), farFiller, block(goodText)),
      en)
    assert(far(0).finalClass == "bad")
    // a NON-heading short block never promotes
    val plain = MainContent.classify(IndexedSeq(
      block("Section one"), block(goodText)), en)
    assert(plain(0).finalClass == "bad",
      "short + mixed neighbors (edge bad, next good) without bridge")
  }

  test("revision reads post-promotion classes without cascading") {
    // heading promotes to neargood; the FOLLOWING short block sees the
    // heading as its neargood bridge even though the heading's own
    // final class is computed in the same pass
    val cs = MainContent.classify(IndexedSeq(
      block("Nav", anchor = 3),
      block("Section", heading = true),
      block("Tiny"),
      block(goodText)), en)
    assert(cs(1).cfClass == "short" && cs(1).finalClass == "good")
    // Tiny: prev anchor bad (nav), next anchor good → mixed; prev any
    // is the PROMOTED neargood heading → bridged good
    assert(cs(2).finalClass == "good")
  }

  test("extractMain joins only final-good blocks with \\n; all-furniture " +
      "pages extract to empty") {
    val html = "<div><a href=\"/\">Home</a> <a href=\"/x\">About</a></div>" +
      s"<h2>Section one</h2><p>$goodText</p>" +
      "<p><a href=\"/m\">Read more</a></p>" +
      "<footer>&copy; 2026 nobody</footer>"
    val (main, cs) = MainContent.extractMain(html, en)
    assert(main == "Section one\n" + goodText)
    assert(cs.map(_.finalClass) ==
      IndexedSeq("bad", "good", "good", "bad", "bad"))
    val (empty, _) = MainContent.extractMain(
      "<div><a href=\"/\">Home</a></div><footer>&copy; x</footer>", en)
    assert(empty == "")
  }

  test("blocks(): heading flag set by h1-h6 opens only; extract() " +
      "behavior unchanged by the refactor") {
    val html = "<h1>Top</h1><p>body text here</p><h3>Sub</h3><div>tail</div>"
    val bs = HtmlExtract.blocks(html)
    assert(bs.map(_.heading) == IndexedSeq(true, false, true, false))
    val (text, kept, dropped) = HtmlExtract.extract(
      "<p>keep this</p><p><a href=\"/\">drop me</a></p>")
    assert(text == "keep this" && kept == 1 && dropped == 1)
  }

  test("StoplistStore: versions are immutable and pinnable; words " +
      "fold to lowercase at save; missing langs absent (the empty-" +
      "list conservative default is the caller's)") {
    import graft.functions.StoplistStore
    val dir = graft.Scratch.dir("graft_stoplists_spec")
    val v1 = StoplistStore.save(dir, Map("en" -> Seq("The", "a")))
    val v2 = StoplistStore.save(dir, Map("en" -> Seq("the"),
      "de" -> Seq("der", "die")))
    assert(v2 == v1 + 1)
    assert(StoplistStore.listsAt(dir, v1) == Map("en" -> Set("the", "a")))
    val at2 = StoplistStore.listsAt(dir, v2)
    assert(at2("de") == Set("der", "die") && !at2.contains("fr"))
    assert(StoplistStore.listsAt(dir, -1) == at2)
    intercept[IllegalArgumentException](StoplistStore.listsAt(dir, 0))
  }

  test("stopword matching is lowercase-verbatim, single-space splits") {
    val cs = MainContent.classify(
      IndexedSeq(block("The THE the. a A")), en)
    assert(cs.head.nWords == 5)
    assert(cs.head.nStop == 4, "'the.' must NOT count; case folds")
  }

  // ---- the space-free-script char branch ----

  private val zh = MainContent.Params(stopwords = Set.empty,
    stopChars = "的了在是我他这就不人都一有很到说要以个们".toSet)
  // 38 chars, 25 of them stop chars (66% function-char density)
  private val zhHi =
    "我们的人说他要在这里的地方做一个很大的计划了因为我的朋友都是要到这里来的人了"
  private val zhLo = "青山绿水风景秀丽春花秋月冬雪夏雨名胜古迹" // 20, 0 stop

  test("char branch: selected per-block by 2·cjk >= nonws AND a " +
      "non-empty char list; n_words/n_stop report chars there") {
    def one(t: String, p: MainContent.Params = zh) =
      MainContent.classify(IndexedSeq(block(t)), p).head
    // script-majority block, char list pinned → char features
    val c = one(zhHi * 3)
    assert(c.nWords == 114 && c.nStop == 75 && c.cfClass == "good")
    // same text, NO char list (the dark pin) → one giant "word",
    // zero stopword density, perfect prose classifies bad
    val dark = one(zhHi * 3, MainContent.Params(stopwords = Set.empty))
    assert(dark.nWords == 1 && dark.nStop == 0 && dark.cfClass == "bad")
    // Latin-majority block on the SAME params → word ladder
    // (branch selection is per-block, not per-page)
    val latin = one("plain latin words here " * 5)
    assert(latin.nWords == 20 && latin.cfClass == "bad")
  }

  test("char ladder: halved length gates, 0.15/0.10 density rules, " +
      "script-agnostic link/© rules first") {
    def cf(t: String, anchor: Int = 0) = MainContent.classify(
      IndexedSeq(block(t, anchor = anchor)), zh).head.cfClass
    assert(cf(zhLo) == "short", "20 chars: 2·20 < 70")
    assert(cf(zhLo * 2) == "bad", "40 chars, zero function chars")
    assert(cf(zhHi) == "neargood", "66% density but 2·38 <= 200")
    assert(cf(zhHi * 3) == "good", "2·114 > 200 at >=15% density")
    assert(cf("次へ", anchor = 2) == "bad", "anchor stub")
    assert(cf("© 2026 " + zhHi * 3) == "bad", "© beats density")
    // the 0.10 rule: 4 stop of 36 chars = 11.1% → neargood, not good
    val med =
      "春天的山谷风景如画孩童们草地玩耍很远处青山绿水环绕着我家村庄美丽动感色彩"
    assert(cf(med) == "neargood")
  }

  // ---- Thai: the third space-free script (round-16) ----

  private val th = MainContent.Params(stopwords = Set.empty,
    stopChars = "ะัาำิีึืุูเแโใไ็่้๊๋".toSet)
  // 51 chars, 19 stop (vowel signs + tone marks; 37% density)
  private val thHi =
    "ผู้คนในเมืองนี้ชอบอ่านหนังสือที่บ้านของพวกเขาทุกวัน"
  private val thLo = "กขคงจฉชซญดตถทธนบปผฝพ" // 20 consonants, 0 stop

  test("Thai takes the char branch: U+0E00-0E7F is a space-free " +
      "script class; vowel/tone marks are its function chars") {
    assert(MainContent.isSpaceFreeScript('ก') &&
      MainContent.isSpaceFreeScript('๿') &&
      MainContent.isSpaceFreeScript('่'))
    assert(!MainContent.isSpaceFreeScript('a') &&
      !MainContent.isSpaceFreeScript('가'))
    def one(t: String, p: MainContent.Params = th) =
      MainContent.classify(IndexedSeq(block(t)), p).head
    val c = one(thHi)
    assert(c.nWords == 51 && c.nStop == 19 && c.cfClass == "neargood",
      s"got ${(c.nWords, c.nStop, c.cfClass)}") // 2·51 <= 200
    assert(one(thHi * 2).cfClass == "good") // 2·102 > 200, 37% >= 15%
    assert(one(thLo).cfClass == "short") // 2·20 < 70
    assert(one(thLo * 2).cfClass == "bad") // zero function chars
    // the dark pin (no Thai char list): one giant word, prose dies —
    // the exact zh/ja round-14 shape one script family over
    val dark = one(thHi * 2, MainContent.Params(stopwords = Set.empty))
    assert(dark.nWords == 1 && dark.cfClass == "bad")
  }

  test("StoplistStore charLists: saved with v3, absent pre-rollout " +
      "versions read back as empty (back-compat)") {
    import graft.functions.StoplistStore
    val dir = graft.Scratch.dir("graft_stoplists_chars_spec")
    val v1 = StoplistStore.save(dir, Map("en" -> Seq("the")))
    val v2 = StoplistStore.save(dir, Map("en" -> Seq("the"),
      "zh" -> Seq.empty), charLists = Map("zh" -> Seq("的", "了")))
    assert(StoplistStore.charListsAt(dir, v1) == Map.empty)
    assert(StoplistStore.charListsAt(dir, v2) ==
      Map("zh" -> Seq("的", "了")))
    // multi-char entries (words smuggled into a char list, surrogate
    // pairs) are dropped AT THE STORE BOUNDARY, for every consumer
    val v3 = StoplistStore.save(dir, Map("en" -> Seq("the"),
      "zh" -> Seq.empty),
      charLists = Map("zh" -> Seq("的", "的了", "", "😀", "了")))
    assert(StoplistStore.charListsAt(dir, v3) ==
      Map("zh" -> Seq("的", "了")))
    // a pre-charLists JSON file (no field at all) still loads
    val raw = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, s"stoplists_v$v1.json"))
    assert(!raw.contains("charLists"),
      "empty charLists must serialize as ABSENT, not null/{}")
  }
}
