"""Charset sniffing (WHATWG-style) + decoded-extraction parity."""

from pyontutils_spark.kernel.encoding import (
    decode_html, normalize_label, sniff_charset)
from pyontutils_spark.kernel.extract import (
    html_to_text, html_to_text_reference)


def test_bom_detection():
    assert sniff_charset(b"\xef\xbb\xbfhi") == "utf-8-sig"
    assert sniff_charset(b"\xff\xfeh\x00i\x00") == "utf-16-le"
    assert sniff_charset(b"\xfe\xff\x00h\x00i") == "utf-16-be"
    assert decode_html(b"\xef\xbb\xbfhola") == "hola"   # BOM stripped
    assert decode_html("caf\xe9".encode("utf-16")) == "caf\xe9"


def test_content_type_charset_wins_over_meta():
    body = b'<meta charset="utf-8"><p>caf\xe9</p>'
    assert sniff_charset(body, "text/html; charset=ISO-8859-1") == \
        "cp1252"
    assert "caf\xe9" in decode_html(body, "text/html; charset=latin-1")


def test_meta_charset_variants():
    assert sniff_charset(b"<meta charset=windows-1251>") == "cp1251"
    assert sniff_charset(b"<meta charset='Shift_JIS'>") == "shift_jis"
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=gb2312">') == "gb18030"
    # meta claiming utf-16 over ASCII-visible bytes is read as utf-8
    assert sniff_charset(b'<meta charset="utf-16">') == "utf-8"
    # meta beyond the 1024-byte prescan window is ignored
    far = b"<!--" + b"x" * 1100 + b'--><meta charset="koi8-r">caf\xc3\xa9'
    assert sniff_charset(far) == "utf-8"


def test_label_normalization():
    assert normalize_label("Latin1") == "cp1252"
    assert normalize_label("ISO-8859-1") == "cp1252"
    assert normalize_label("GB2312") == "gb18030"
    assert normalize_label("utf8") == "utf-8"
    assert normalize_label("x-user-defined") == "cp1252"
    assert normalize_label("no-such-charset-xyz") is None
    assert normalize_label("") is None


def test_utf8_probe_and_1252_fallback():
    assert sniff_charset("caf\xe9".encode("utf-8")) == "utf-8"
    assert sniff_charset(b"plain ascii") == "utf-8"
    assert sniff_charset(b"caf\xe9") == "windows-1252"
    assert decode_html(b"caf\xe9") == "caf\xe9"
    assert decode_html(b"\x93quoted\x94") == "“quoted”"  # 1252


def test_declared_charset_with_bad_bytes_replaces():
    # declared utf-8 but invalid sequence: errors='replace' still applies
    out = decode_html(b'<meta charset="utf-8">a\xffb')
    assert "�" in out and out.startswith("<meta")


def test_valid_utf8_bytes_keep_byte_identical_extraction():
    # the pre-sniffer behavior (blunt utf-8 decode) must be preserved
    # for every valid-utf-8 payload — the byte-identical invariant
    html = "<html><body><p>caf\xe9 中文</p></body></html>"
    raw = html.encode("utf-8")
    assert html_to_text(raw) == html_to_text(html)
    assert html_to_text_reference(raw) == html_to_text_reference(html)
    assert html_to_text(raw) == "caf\xe9 中文"


def test_extractors_decode_non_utf8_pages():
    cases = [("windows-1252", b"", "se\xf1or caf\xe9"),
             ("windows-1251", b'<meta charset="windows-1251">',
              "привет"),   # привет
             ("shift_jis", b'<meta charset="shift_jis">',
              "日本語")]                     # 日本語
    for enc, meta, text in cases:
        payload = meta + ("<html><body><p>%s</p></body></html>"
                          % text).encode(enc)
        got_fast = html_to_text(payload)
        got_ref = html_to_text_reference(payload)
        assert got_fast == got_ref, enc
        assert "�" not in got_fast, enc
        assert text in got_fast, enc
