"""Media codec, pixel rect detector, and recognition-chain unit tests."""

import numpy as np
import pytest

from p_id_text_extraction_ray.functions.rectdetect import detect_rects
from p_id_text_extraction_ray.media import codec as C
from p_id_text_extraction_ray.stages.cv import StubRecognizer


def test_encode_decode_roundtrip():
    img = np.arange(200 * 100, dtype=np.uint8).reshape(100, 200) % 200
    assert (C.decode_image(C.encode_image(img)) == img).all()


def test_decode_foreign_magic_raises():
    with pytest.raises(NotImplementedError):
        C.decode_image(b"\x89PNG\r\n" + b"0" * 64)


def test_render_and_detect_exact():
    canvas = np.full((300, 400), C.BACKGROUND, np.uint8)
    C.render_string(canvas, "PIC-101", 20, 30, 0)
    C.render_string(canvas, "PUMP", 200, 150, 90)
    rects = detect_rects(canvas)
    assert rects.tolist() == [[20, 30, 20 + 7 * C.CELL_W, 30 + C.CELL_H],
                              [200, 150, 214, 150 + 4 * C.CELL_W]]


def test_detect_rects_empty_and_gap():
    assert detect_rects(np.full((50, 50), C.BACKGROUND, np.uint8)).shape == (0, 4)
    canvas = np.full((100, 100), C.BACKGROUND, np.uint8)
    canvas[10:20, 10:30] = 65
    canvas[30:40, 10:30] = 66   # separated by a 10-row gap
    assert len(detect_rects(canvas)) == 2


def test_decode_text_horizontal_and_vertical():
    canvas = np.full((300, 400), C.BACKGROUND, np.uint8)
    C.render_string(canvas, "FT-2003A", 40, 40, 0)
    C.render_string(canvas, "VALVE", 300, 100, 90)
    w, h = C.string_box_size("FT-2003A", 0)
    crop = canvas[30:40 + h + 10, 30:40 + w + 10]
    assert C.decode_text_from_crop(crop, 0) == "FT-2003A"
    vw, vh = C.string_box_size("VALVE", 90)
    vcrop = canvas[90:100 + vh + 10, 290:300 + vw + 10]
    assert C.decode_text_from_crop(vcrop, 90) == "VALVE"
    assert C.decode_text_from_crop(np.full((30, 30), C.BACKGROUND, np.uint8), 0) == ""


def test_recognizer_primary_confident_on_horizontal():
    canvas = np.full((60, 200), C.BACKGROUND, np.uint8)
    C.render_string(canvas, "DRUM-7", 20, 20, 0)
    w, h = C.string_box_size("DRUM-7", 0)
    crop = canvas[10:20 + h + 10, 10:20 + w + 10]
    text, conf = StubRecognizer._primary(crop)
    assert text == "DRUM-7" and conf == 1.0


def test_recognizer_fallback_on_vertical():
    # primary (horizontal read) must be low-confidence on vertical text so
    # the rotate+fallback chain fires (text_recognition.py:111-131 parity)
    canvas = np.full((200, 60), C.BACKGROUND, np.uint8)
    C.render_string(canvas, "FLARE", 20, 40, 90)
    w, h = C.string_box_size("FLARE", 90)
    crop = canvas[30:40 + h + 10, 10:20 + w + 10]
    _, conf = StubRecognizer._primary(crop)
    assert conf < 0.95
    text, fb_conf = StubRecognizer._fallback(crop, 90)
    assert text == "FLARE" and fb_conf == 1.0
