"""URL user-dictionary tests (SURVEY.md §2.1 O7) against a local HTTP
server — fetch caps, gzip, strict UTF-8, error paths
(KuromojiNEologdUDF.java:251-304; KuromojiNEologdUDFTest.java:304-381)."""

from __future__ import annotations

import gzip
import http.server
import threading

import pytest

from hive_udf_neologd_spark.tokenizer.analyzer import JapaneseAnalyzer
from hive_udf_neologd_spark.tokenizer.dictionary import (
    UserDictionaryError,
    fetch_user_dict_url,
)

DICT_BODY = (
    "日本経済新聞,日本 経済 新聞,ニホン ケイザイ シンブン,カスタム名詞\n"
    "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,テスト名詞\n"
)


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *args):  # quiet
        pass

    def do_GET(self):
        if self.path == "/dict.csv":
            body = DICT_BODY.encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/csv")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/dict.csv.gz":
            body = gzip.compress(DICT_BODY.encode("utf-8"))
            self.send_response(200)
            self.send_header("Content-Encoding", "gzip")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/bad-utf8":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"\xff\xfe invalid")
        elif self.path == "/huge":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"x" * (33 * 1024 * 1024))
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_fetch_ok(server):
    rows = fetch_user_dict_url(f"{server}/dict.csv")
    assert len(rows) == 2 and rows[0].startswith("日本経済新聞,")


def test_fetch_gzip(server):
    rows = fetch_user_dict_url(f"{server}/dict.csv.gz")
    assert len(rows) == 2


def test_url_dict_end_to_end(server):
    # KuromojiNEologdUDFTest.java:342-381 — URL dict overrides segmentation.
    a = JapaneseAnalyzer(user_dict_rows=fetch_user_dict_url(f"{server}/dict.csv"))
    assert a.tokenize("日本経済新聞。") == ["日本", "経済", "新聞"]


def test_404_raises(server):
    with pytest.raises(UserDictionaryError):
        fetch_user_dict_url(f"{server}/missing")


def test_bad_utf8_raises(server):
    # strict UTF-8 decode parity (KuromojiNEologdUDF.java:296-300).
    with pytest.raises(UserDictionaryError):
        fetch_user_dict_url(f"{server}/bad-utf8")


def test_size_cap_raises(server):
    # 32 MiB cap (KuromojiNEologdUDF.java:73).
    with pytest.raises(UserDictionaryError):
        fetch_user_dict_url(f"{server}/huge")


def test_bad_scheme_raises():
    with pytest.raises(UserDictionaryError):
        fetch_user_dict_url("ftp://example.com/dict.csv")


def test_invalid_dict_content_raises(server):
    # A URL that serves non-dict content must fail at construction
    # (KuromojiNEologdUDFTest.java:304-340 uses http://google.com/).
    from hive_udf_neologd_spark.functions.tokenize import tokenize_ja

    with pytest.raises(UserDictionaryError):
        tokenize_ja(user_dict=f"{server}/bad-utf8")
