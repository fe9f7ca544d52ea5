"""Tiny CFF builder for tests: compiles Type2 charstrings into a
valid single-font CFF blob that ``media/cff.CffFont`` (and a PDF
FontFile3 embed) can parse. No external font tooling exists in this
sandbox, so the reader is exercised against fonts built here —
including DejaVu TTF outlines re-encoded as cubic charstrings for a
bitmap-parity test against the TrueType render path.
"""

from __future__ import annotations

import struct


def _enc_num(v: float) -> bytes:
    """Type2 charstring operand encoding."""
    if isinstance(v, float) and v != int(v):
        return b"\xff" + struct.pack(">i", int(round(v * 65536)))
    v = int(v)
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 0xFF])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 0xFF])
    if -32768 <= v <= 32767:
        return b"\x1c" + struct.pack(">h", v)
    return b"\xff" + struct.pack(">i", v * 65536)


_OPS = {
    "hstem": b"\x01", "vstem": b"\x03", "vmoveto": b"\x04",
    "rlineto": b"\x05", "hlineto": b"\x06", "vlineto": b"\x07",
    "rrcurveto": b"\x08", "callsubr": b"\x0a", "return": b"\x0b",
    "endchar": b"\x0e", "hstemhm": b"\x12", "hintmask": b"\x13",
    "cntrmask": b"\x14", "rmoveto": b"\x15", "hmoveto": b"\x16",
    "vstemhm": b"\x17", "rcurveline": b"\x18", "rlinecurve": b"\x19",
    "vvcurveto": b"\x1a", "hhcurveto": b"\x1b", "callgsubr": b"\x1d",
    "vhcurveto": b"\x1e", "hvcurveto": b"\x1f",
    "flex": b"\x0c\x23", "hflex": b"\x0c\x22", "hflex1": b"\x0c\x24",
    "flex1": b"\x0c\x25",
}


def charstring(program) -> bytes:
    """[(num, num, ..., 'op'), ...] -> Type2 bytecode."""
    out = b""
    for step in program:
        *nums, op = step
        for n in nums:
            out += _enc_num(n)
        if isinstance(op, (int, float)):     # bare operand group
            out += _enc_num(op)
        else:
            out += _OPS[op]
    return out


def _index(items) -> bytes:
    if not items:
        return struct.pack(">H", 0)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    off_size = 1 if offs[-1] < 256 else (2 if offs[-1] < 65536 else
                                         (3 if offs[-1] < 1 << 24 else 4))
    out = struct.pack(">HB", len(items), off_size)
    for o in offs:
        out += o.to_bytes(off_size, "big")
    return out + b"".join(items)


def _dict(entries) -> bytes:
    """[(op, [operands])] with all ints as 5-byte so layout is stable."""
    out = b""
    for op, vals in entries:
        for v in vals:
            if isinstance(v, float) and v != int(v):
                s = f"{v:g}"
                nibs = []
                for ch in s:
                    nibs.append({"0": 0, "1": 1, "2": 2, "3": 3, "4": 4,
                                 "5": 5, "6": 6, "7": 7, "8": 8, "9": 9,
                                 ".": 0xA, "-": 0xE}[ch])
                nibs.append(0xF)
                if len(nibs) % 2:
                    nibs.append(0xF)
                out += b"\x1e" + bytes((nibs[i] << 4) | nibs[i + 1]
                                       for i in range(0, len(nibs), 2))
            else:
                out += b"\x1d" + struct.pack(">i", int(v))
        out += bytes([0x0C, op & 0xFF]) if op >= 0xC00 else bytes([op])
    return out


def build_cff(glyphs, *, font_name=b"TestFont", default_width=0,
              nominal_width=0, local_subrs=(), units_per_em=1000):
    """glyphs: list of (name, charstring_bytes); gid 0 should be
    '.notdef'. Returns a CFF blob."""
    names = [n for n, _ in glyphs]
    std = {".notdef": 0}
    from p_id_text_extraction_ray.media.cff import _STD_STRINGS
    for sid, s in enumerate(_STD_STRINGS):
        std.setdefault(s, sid)
    custom = []
    sids = []
    for n in names:
        if n in std:
            sids.append(std[n])
        else:
            custom.append(n.encode())
            sids.append(390 + len(custom))

    header = bytes([1, 0, 4, 2])
    name_index = _index([font_name])
    string_index = _index(custom)
    gsubr_index = _index([])
    charstrings = _index([cs for _, cs in glyphs])
    charset = b"\x00" + b"".join(struct.pack(">H", s) for s in sids[1:])

    subr_blob = _index(list(local_subrs))
    priv_entries = [(20, [default_width]), (21, [nominal_width])]
    fm = 1.0 / units_per_em

    def top(cs_off, charset_off, priv_off, priv_size):
        return _dict([
            (0xC07, [fm, 0, 0, fm, 0, 0]),
            (15, [charset_off]),
            (17, [cs_off]),
            (18, [priv_size, priv_off]),
        ])

    # two-pass layout: sizes of top dict are stable (5-byte ints, but
    # FontMatrix reals vary) -> compute with dummy offsets first
    dummy = top(0, 0, 0, 0)
    top_index_size = len(_index([dummy]))
    base = (len(header) + len(name_index) + top_index_size
            + len(string_index) + len(gsubr_index))
    charset_off = base
    cs_off = charset_off + len(charset)
    priv_off = cs_off + len(charstrings)

    # Subrs offset (op 19) is relative to the Private DICT start; the
    # subr INDEX is appended right after it. Operands are 5-byte ints,
    # so the recompute with the real offset keeps the same size.
    priv = _dict(priv_entries + ([(19, [0])] if local_subrs else []))
    if local_subrs:
        priv = _dict(priv_entries + [(19, [len(priv)])])
    priv_size = len(priv)

    td = top(cs_off, charset_off, priv_off, priv_size)
    assert len(_index([td])) == top_index_size
    blob = (header + name_index + _index([td]) + string_index
            + gsubr_index + charset + charstrings + priv + subr_blob)
    return blob


def polyline_charstring(contours, advance):
    """Flattened contours (lists of (x, y)) -> a Type2 charstring of
    relative moveto/lineto steps. The first rmoveto carries the width
    (the extra leading argument, nominalWidthX = 0)."""
    x, y = 0.0, 0.0
    first = True
    steps = []
    for c in contours:
        px, py = float(c[0][0]), float(c[0][1])
        if first:
            steps.append((advance, px - x, py - y, "rmoveto"))
            first = False
        else:
            steps.append((px - x, py - y, "rmoveto"))
        x, y = px, py
        for qx, qy in c[1:]:
            qx, qy = float(qx), float(qy)
            steps.append((qx - x, qy - y, "rlineto"))
            x, y = qx, qy
    if first:                                # empty glyph
        steps.append((advance, 0, "rmoveto"))
    steps.append(("endchar",))
    return charstring(steps)
