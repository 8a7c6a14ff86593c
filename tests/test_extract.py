"""Parser golden tests — the byte-for-byte contract (SURVEY.md §2.9, §5.3)."""

from __future__ import annotations

import pyarrow.parquet as pq

from aspseek_spark.functions.textextract import (
    extract1,
    extract_hrefs,
    extract_redirect,
    extract_title,
    sniff_charset,
)

GOLDEN = [
    (
        b"<html><head><title>T &amp; t</title><style>x{}</style></head>"
        b"<body><!-- c --><script>var x=1;</script>"
        b"<p>Hello&nbsp;world &#65;&#x42;</p><a href='p1.html'>go</a>"
        b"</body></html>",
        "T & t Hello world AB go",
    ),
    (b"", ""),
    (b"no tags at all", "no tags at all"),
    (b"<p>a</p>\n\n<p>b</p>", "a b"),
    (b"<SCRIPT>alert(1)</SCRIPT>visible", "visible"),
    (b"<!-- <p>ghost</p> -->real", "real"),
    (b"a &unknown; b &#999999999; c", "a &unknown; b &#999999999; c"),
    ("café <b>naïve</b>".encode("utf-8"), "café naïve"),
    (b"broken \xff utf8", "broken � utf8"),
]


def test_extract_golden():
    for html, want in GOLDEN:
        assert extract1(html) == want, html


def test_extract_title():
    assert extract_title(b"<title>A &amp; B</title>") == "A & B"
    assert extract_title(b"<p>no title</p>") == ""


def test_extract_hrefs_variants():
    html = (
        b'<a href="a.html">1</a>'
        b"<a href='b.html'>2</a>"
        b"<a href=c.html>3</a>"
        b'<A HREF="D.html">4</A>'
        b'<a name="x">no href</a>'
        b'<script>document.write(\'<a href="ghost.html">\')</script>'
        b'<!-- <a href="ghost2.html"> -->'
    )
    assert extract_hrefs(html) == ["a.html", "b.html", "c.html", "D.html"]


def test_sniff_charset_and_latin1_decode():
    l1 = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=iso-8859-1"></head>'
        "<body>caf\xe9 r\xe9sum\xe9</body></html>"
    ).encode("iso-8859-1")
    assert sniff_charset(l1) == "latin-1"
    assert extract1(l1) == "café résumé"
    assert sniff_charset(b"<html>no meta</html>") == "utf-8"
    assert sniff_charset(b'<meta charset="UTF-8">') == "utf-8"
    # unknown charset falls back to utf-8
    assert sniff_charset(b'<meta charset="ebcdic-weird">') == "utf-8"


def test_charset_cyrillic_and_sjis_golden():
    from aspseek_spark.functions.textextract import (
        charset_from_content_type,
        media_type_of,
    )

    # windows-1251 via meta tag
    w1251 = (
        '<html><head><meta charset="windows-1251"></head>'
        "<body>Тест кодировки</body></html>"
    ).encode("windows-1251")
    assert sniff_charset(w1251) == "windows-1251"
    assert extract1(w1251) == "Тест кодировки"
    # koi8-r via meta
    koi = (
        '<html><head><meta charset="koi8-r"></head>'
        "<body>привет мир</body></html>"
    ).encode("koi8-r")
    assert extract1(koi) == "привет мир"
    # shift-jis via meta
    sjis = (
        '<html><head><meta charset="shift_jis"></head>'
        "<body>こんにちは</body></html>"
    ).encode("shift_jis")
    assert extract1(sjis) == "こんにちは"
    # HTTP-header charset takes precedence over a WRONG meta tag
    lying_meta = (
        '<html><head><meta charset="iso-8859-1"></head>'
        "<body>Кодировка из заголовка</body></html>"
    ).encode("windows-1251")
    hdr = charset_from_content_type("text/html; charset=windows-1251")
    assert hdr == "windows-1251"
    assert extract1(lying_meta, hdr) == "Кодировка из заголовка"
    # without the header the meta (wrongly) wins — mojibake, not a crash
    assert "Кодировка" not in extract1(lying_meta)
    # media_type_of strips parameters for the F5 MIME key
    assert media_type_of("text/html; charset=utf-8") == "text/html"
    assert media_type_of("Application/PDF") == "application/pdf"
    assert charset_from_content_type("text/html") is None


def test_charset_cjk_golden():
    """S6 widening (round-3 verdict next-round #8): the three largest
    non-Latin web populations — simplified Chinese (gb2312→gbk superset),
    traditional Chinese (big5), Korean (euc-kr→cp949 superset) — via meta
    tag AND via HTTP header, one golden per charset."""
    from aspseek_spark.functions.textextract import charset_from_content_type

    gb = (
        '<html><head><meta charset="gb2312"></head>'
        "<body>简体中文测试</body></html>"
    ).encode("gbk")
    assert sniff_charset(gb) == "gbk"
    assert extract1(gb) == "简体中文测试"

    big5 = (
        '<html><head><meta charset="big5"></head>'
        "<body>繁體中文測試</body></html>"
    ).encode("big5")
    assert sniff_charset(big5) == "big5"
    assert extract1(big5) == "繁體中文測試"

    kr = (
        '<html><head><meta charset="euc-kr"></head>'
        "<body>한국어 테스트</body></html>"
    ).encode("euc-kr")
    assert sniff_charset(kr) == "cp949"
    assert extract1(kr) == "한국어 테스트"

    # header precedence path per charset (RFC 9110 §8.3)
    for label, codec, text in (
        ("gb2312", "gbk", "页面内容"),
        ("big5", "big5", "頁面內容"),
        ("euc-kr", "cp949", "페이지 내용"),
        ("gb18030", "gb18030", "内容𠀋"),  # 4-byte gb18030 char
    ):
        hdr = charset_from_content_type(f"text/html; charset={label}")
        assert hdr == codec, label
        raw = f"<html><body>{text}</body></html>".encode(codec)
        assert extract1(raw, hdr) == text

    # superset-label tolerance: a page labeled gb2312 carrying a GBK-only
    # character (the common real-web mislabel) still decodes
    gbk_only = (
        '<html><head><meta charset="gb2312"></head>'
        "<body>鎔铗</body></html>"
    ).encode("gbk")
    assert extract1(gbk_only) == "鎔铗"


def test_extract_redirect():
    r = (
        b"<html><head><meta http-equiv=\"refresh\" "
        b"content=\"0;url=http://t.test/x.html\"></head>"
        b"<body>Redirecting</body></html>"
    )
    assert extract_redirect(r) == "http://t.test/x.html"
    assert extract_redirect(b"<html><body>normal</body></html>") is None
    r2 = b'<META HTTP-EQUIV="Refresh" CONTENT="5;url=/rel.html">'
    assert extract_redirect(r2) == "/rel.html"


def test_fixture_text_is_extract1_output(tiny_web):
    """The generator's stored text column IS extract1(html) — golden link."""
    t = pq.read_table(f"{tiny_web}/pages.parquet", columns=["html", "text"])
    htmls = t["html"].to_pylist()
    texts = t["text"].to_pylist()
    for h, x in zip(htmls, texts):
        assert extract1(h) == x
