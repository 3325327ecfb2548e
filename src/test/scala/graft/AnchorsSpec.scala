package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlTok

/** Anchor-text extraction: link context (href + visible text) with the
  * tokenizer's text semantics — entity decode, whitespace collapse, markup
  * separation, RAWTEXT skip, implicit close of an open <a> by a new one. */
class AnchorsSpec extends AnyFunSuite {

  test("basic anchors in document order, inner markup separates text") {
    val html = """<p>x</p><a href="/a">one <b>bold</b>text</a><a href='/b'> two </a>"""
    assert(HtmlTok.extractAnchors(html) ==
      Seq("/a" -> "one bold text", "/b" -> "two"))
  }

  test("entities decode in both href and text; script inside anchor skipped") {
    val html = """<a href="/q?a=1&amp;b=2">fish &amp; chips<script>var a="</a>fake";</script> real</a>"""
    assert(HtmlTok.extractAnchors(html) ==
      Seq("/q?a=1&b=2" -> "fish & chips real"))
  }

  test("a new <a> implicitly closes the open one; href-less <a> is silent") {
    val html = """<a href="/one">first <a href="/two">second</a> tail <a name="x">ignored</a>"""
    assert(HtmlTok.extractAnchors(html) ==
      Seq("/one" -> "first", "/two" -> "second"))
  }

  test("unterminated anchor flushes at EOF; comments don't contribute") {
    val html = """<a href="/open">text <!-- <a href="/no">c</a> --> more"""
    assert(HtmlTok.extractAnchors(html) == Seq("/open" -> "text more"))
  }

  test("no anchors -> empty; text outside anchors never leaks") {
    assert(HtmlTok.extractAnchors("<p>plain text</p>") == Seq.empty)
    assert(HtmlTok.extractAnchors("") == Seq.empty)
  }
}
