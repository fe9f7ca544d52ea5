"""Text-path kernels: boilerplate strip, tokens, lang id, tags, fingerprint."""

import pyarrow as pa

from p_id_text_extraction_ray.functions import textops as T


def test_normalize_whitespace():
    assert T.normalize_whitespace("  a\t b\n\nc  ") == "a b c"


def test_strip_boilerplate():
    text = "real  line one\nCOPYRIGHT FOOTER 2024\n\n  second   line\nNAV: HOME | ABOUT"
    assert T.strip_boilerplate(text) == "real line one\nsecond line"


def test_strip_boilerplate_all_boiler():
    assert T.strip_boilerplate("ALL RIGHTS RESERVED\nCookie notice") == ""


def test_clean_text_column_matches_scalar():
    texts = ["plain  text", "keep\nSUBSCRIBE NOW\nthis", "", "   "]
    col = T.clean_text_column(pa.array(texts)).to_pylist()
    assert col == [T.strip_boilerplate(t) for t in texts]


def test_token_count():
    arr = pa.array(["one two three", "a-b c!", ""])
    assert T.token_count(arr).to_pylist() == [3, 3, 0]


def test_quality_features_integers():
    f = T.quality_features(pa.array(["The quick, BROWN fox 42."]))
    assert f["n_words"].to_pylist() == [5]
    assert f["n_punct"].to_pylist() == [2]
    assert f["n_stop"].to_pylist() == [1]
    assert f["n_digit"].to_pylist() == [2]


def test_lang_id():
    arr = pa.array(["the cat and the dog is here",
                    "der hund und die katze ist",
                    "le chat et la maison est",
                    "xyzzy qwerty"])
    assert T.lang_id(arr).to_pylist() == ["en", "de", "fr", "und"]


def test_isa_tag_classification():
    kinds = T.classify_kinds(pa.array(["PIC-101", "FT-2003A", "PUMP", "pic-101",
                                       "TOOLONGG-1", "PI-0"]))
    assert kinds.to_pylist() == ["tag", "tag", "image_text", "image_text",
                                 "image_text", "tag"]


def test_fingerprint_column_matches_scalar():
    texts = ["hello  world", "", "a", "hello world"]
    col = T.fingerprint_column(pa.array(texts)).to_pylist()
    assert col == [T.fingerprint(t) for t in texts]
    assert col[0] == col[3]  # whitespace-normalized equality
