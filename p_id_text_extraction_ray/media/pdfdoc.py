"""Pure-Python PDF document parser (ISO 32000 subset).

Makes the PDF ingestion stage (``sources/pdf.py``, SURVEY.md S1) real:
the reference shells out to pdftocairo (``PDF_to_image.py:8-91``); this
engine parses the PDF object graph itself and hands each page's decoded
content stream + resources to the rasterizer (``media/pdfraster.py``).

Supported: classic xref tables AND cross-reference streams (PDF 1.5+,
/W decoding with PNG predictors), incremental updates via /Prev,
compressed object streams (/ObjStm), FlateDecode (+ /Predictor 2 and
10-15), ASCIIHexDecode, literal/hex strings, the page tree with
attribute inheritance (Resources / MediaBox / CropBox / Rotate), and
multi-part /Contents arrays. Out of scope (raise cleanly): encryption,
linearization hints (ignored, harmless), LZW/DCT/JPX-filtered content
streams, damaged-file reconstruction.

Object model: names -> ``Name`` (str subclass), strings -> ``bytes``,
references -> ``Ref``; dict keys are plain ``str`` (no slash).
"""

from __future__ import annotations

import re
import struct
import zlib

import numpy as np


class PdfError(ValueError):
    """Malformed or unsupported PDF."""


class Name(str):
    """A PDF name object (/X) — distinct from string objects (bytes)."""
    __slots__ = ()


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __repr__(self):
        return f"Ref({self.num},{self.gen})"

    def __eq__(self, other):
        return isinstance(other, Ref) and (self.num, self.gen) == \
            (other.num, other.gen)

    def __hash__(self):
        return hash((self.num, self.gen))


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")


def _skip_ws(data: bytes, pos: int) -> int:
    n = len(data)
    while pos < n:
        c = data[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:                      # % comment
            while pos < n and data[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def parse_object(data: bytes, pos: int):
    """Parse one PDF object at ``pos`` -> (obj, next_pos). Consumes
    ``num gen R`` references and ``num gen obj`` headers greedily."""
    pos = _skip_ws(data, pos)
    if pos >= len(data):
        raise PdfError("unexpected end of data")
    c = data[pos]

    if c == 0x2F:                            # /Name
        end = pos + 1
        while end < len(data) and data[end] not in _WS and \
                data[end] not in _DELIM:
            end += 1
        raw = data[pos + 1:end]
        # #xx escapes
        if b"#" in raw:
            out = bytearray()
            i = 0
            while i < len(raw):
                if raw[i:i + 1] == b"#" and i + 2 < len(raw) + 1:
                    out.append(int(raw[i + 1:i + 3], 16))
                    i += 3
                else:
                    out.append(raw[i])
                    i += 1
            raw = bytes(out)
        return Name(raw.decode("latin-1")), end

    if data.startswith(b"<<", pos):          # dict
        pos += 2
        d = {}
        while True:
            pos = _skip_ws(data, pos)
            if data.startswith(b">>", pos):
                return d, pos + 2
            key, pos = parse_object(data, pos)
            if not isinstance(key, Name):
                raise PdfError(f"dict key is not a name at {pos}")
            val, pos = parse_object(data, pos)
            d[str(key)] = val

    if c == 0x3C:                            # <hex string>
        end = data.index(b">", pos)
        hexed = re.sub(rb"\s", b"", data[pos + 1:end])
        if len(hexed) % 2:
            hexed += b"0"
        return bytes.fromhex(hexed.decode("ascii")), end + 1

    if c == 0x28:                            # (literal string)
        out = bytearray()
        depth = 1
        i = pos + 1
        while i < len(data):
            ch = data[i]
            if ch == 0x5C:                   # backslash
                nxt = data[i + 1]
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12,
                       0x28: 40, 0x29: 41, 0x5C: 92}
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                elif 0x30 <= nxt <= 0x37:    # octal
                    j = i + 1
                    oct_digits = b""
                    while j < len(data) and len(oct_digits) < 3 and \
                            0x30 <= data[j] <= 0x37:
                        oct_digits += data[j:j + 1]
                        j += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                    i = j
                elif nxt in b"\r\n":         # line continuation
                    i += 2
                    if nxt == 0x0D and data[i:i + 1] == b"\n":
                        i += 1
                else:
                    out.append(nxt)
                    i += 2
                continue
            if ch == 0x28:
                depth += 1
            elif ch == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out), i + 1
            out.append(ch)
            i += 1
        raise PdfError("unterminated string")

    if c == 0x5B:                            # [array]
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(data, pos)
            if data[pos] == 0x5D:
                return arr, pos + 1
            item, pos = parse_object(data, pos)
            arr.append(item)

    if data.startswith(b"true", pos):
        return True, pos + 4
    if data.startswith(b"false", pos):
        return False, pos + 5
    if data.startswith(b"null", pos):
        return None, pos + 4

    m = _NUM_RE.match(data, pos)
    if m:
        tok = m.group(0)
        end = m.end()
        # reference or object header lookahead: "num gen R" / "num gen obj"
        if b"." not in tok:
            look = _skip_ws(data, end)
            m2 = re.compile(rb"(\d+)\s+(R|obj)\b").match(
                data, look) if data[look:look + 1].isdigit() else None
            m2 = re.compile(rb"(\d+)\s+(R\b|obj\b)").match(data, look)
            if m2:
                if m2.group(2).startswith(b"R"):
                    return Ref(int(tok), int(m2.group(1))), m2.end()
                # num gen obj ... endobj: parse the inner object
                inner, p2 = parse_object(data, m2.end())
                return inner, p2
            return int(tok), end
        return float(tok), end

    raise PdfError(f"cannot parse object at byte {pos}: {data[pos:pos+20]!r}")


def _png_unpredict(data: bytes, colors: int, columns: int) -> bytes:
    """PNG predictors over rows of ``columns*colors`` bytes (bpc=8)."""
    rowlen = colors * columns
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 + rowlen <= len(data) + rowlen and pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + rowlen])
        pos += 1 + rowlen
        if ft == 1:                          # Sub
            for i in range(colors, rowlen):
                row[i] = (row[i] + row[i - colors]) & 0xFF
        elif ft == 2:                        # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(rowlen):
                left = row[i - colors] if i >= colors else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(rowlen):
                a = row[i - colors] if i >= colors else 0
                b = prev[i]
                cc = prev[i - colors] if i >= colors else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise PdfError(f"unsupported PNG predictor row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def decode_stream(sdict: dict, raw: bytes, resolve) -> bytes:
    """Apply the stream's /Filter chain. Supports FlateDecode (with
    /Predictor) and ASCIIHexDecode."""
    filters = resolve(sdict.get("Filter"))
    if filters is None:
        filters = []
    elif isinstance(filters, Name):
        filters = [filters]
    parms = resolve(sdict.get("DecodeParms"))
    if parms is None or isinstance(parms, dict):
        parms = [parms] * len(filters)
    data = raw
    for f, p in zip(filters, parms):
        f = str(f)
        p = resolve(p) or {}
        if f == "FlateDecode":
            data = zlib.decompress(data)
            pred = resolve(p.get("Predictor", 1))
            if pred and pred >= 10:
                data = _png_unpredict(
                    data, int(resolve(p.get("Colors", 1))),
                    int(resolve(p.get("Columns", 1))))
            elif pred == 2:
                cols = int(resolve(p.get("Columns", 1)))
                arr = np.frombuffer(data, np.uint8).reshape(-1, cols)
                data = np.cumsum(arr.astype(np.uint32), axis=1) \
                    .astype(np.uint8).tobytes()
        elif f == "ASCIIHexDecode":
            hexed = re.sub(rb"[\s>]", b"", data)
            if len(hexed) % 2:
                hexed += b"0"
            data = bytes.fromhex(hexed.decode("ascii"))
        else:
            raise PdfError(f"unsupported stream filter {f}")
    return data


class PdfDocument:
    """Random-access reader over a PDF's object graph."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF header")
        self.data = data
        self.xref: dict[int, tuple] = {}     # num -> ("raw", off) | ("objstm", stm, idx)
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, list] = {}
        self._load_xref()

    # ------------------------------------------------------------ xref

    def _load_xref(self):
        tail = self.data[-2048:]
        i = tail.rfind(b"startxref")
        if i < 0:
            raise PdfError("startxref not found")
        start = int(tail[i + 9:].split()[0])
        seen = set()
        while start is not None and start not in seen:
            seen.add(start)
            start = self._load_xref_section(start)

    def _load_xref_section(self, off: int):
        pos = _skip_ws(self.data, off)
        if self.data.startswith(b"xref", pos):
            return self._load_classic_xref(pos)
        # cross-reference STREAM: "num gen obj << ... >> stream"
        sdict, payload = self._parse_stream_at(pos)
        if str(sdict.get("Type")) != "XRef":
            raise PdfError("startxref target is neither xref nor XRef stream")
        for k, v in sdict.items():
            if k not in self.trailer and k not in ("Type", "W", "Index",
                                                   "Filter", "Length",
                                                   "DecodeParms"):
                self.trailer.setdefault(k, v)
        w = [int(x) for x in sdict["W"]]
        size = int(sdict["Size"])
        index = sdict.get("Index", [0, size])
        index = [int(x) for x in index]
        rowlen = sum(w)
        pos2 = 0
        for si in range(0, len(index), 2):
            first, count = index[si], index[si + 1]
            for num in range(first, first + count):
                row = payload[pos2:pos2 + rowlen]
                pos2 += rowlen
                fields = []
                fp = 0
                for width in w:
                    fields.append(int.from_bytes(row[fp:fp + width], "big")
                                  if width else None)
                    fp += width
                ftype = fields[0] if w[0] else 1
                if num in self.xref:
                    continue                 # newer update wins
                if ftype == 1:
                    self.xref[num] = ("raw", fields[1])
                elif ftype == 2:
                    self.xref[num] = ("objstm", fields[1], fields[2])
                # type 0 = free: skip
        prev = sdict.get("Prev")
        return int(prev) if prev is not None else None

    def _load_classic_xref(self, pos: int):
        pos += 4
        while True:
            pos = _skip_ws(self.data, pos)
            if self.data.startswith(b"trailer", pos):
                tdict, _ = parse_object(self.data, pos + 7)
                for k, v in tdict.items():
                    self.trailer.setdefault(k, v)
                prev = tdict.get("Prev")
                # hybrid files: /XRefStm points at an xref stream
                if "XRefStm" in tdict:
                    self._load_xref_section(int(tdict["XRefStm"]))
                return int(prev) if prev is not None else None
            m = re.compile(rb"(\d+)\s+(\d+)").match(self.data, pos)
            if not m:
                raise PdfError("malformed classic xref")
            first, count = int(m.group(1)), int(m.group(2))
            pos = _skip_ws(self.data, m.end())
            for num in range(first, first + count):
                entry = self.data[pos:pos + 20]
                off, _gen, kind = entry[:10], entry[11:16], entry[17:18]
                if kind == b"n" and num not in self.xref:
                    self.xref[num] = ("raw", int(off))
                pos += 20

    # ------------------------------------------------------- object access

    def _parse_stream_at(self, pos: int):
        """Parse 'num gen obj <<dict>> stream...endstream' at pos ->
        (dict, decoded_payload)."""
        m = re.compile(rb"(\d+)\s+(\d+)\s+obj").match(
            self.data, _skip_ws(self.data, pos))
        if not m:
            raise PdfError(f"expected object header at {pos}")
        sdict, p2 = parse_object(self.data, m.end())
        if not isinstance(sdict, dict):
            raise PdfError("expected stream dictionary")
        p2 = _skip_ws(self.data, p2)
        if not self.data.startswith(b"stream", p2):
            return sdict, None
        p2 += 6
        if self.data[p2:p2 + 2] == b"\r\n":
            p2 += 2
        elif self.data[p2:p2 + 1] == b"\n":
            p2 += 1
        length = self.resolve(sdict["Length"])
        raw = self.data[p2:p2 + int(length)]
        return sdict, decode_stream(sdict, raw, self.resolve)

    def resolve(self, obj):
        while isinstance(obj, Ref):
            obj = self.get(obj.num)
        return obj

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        entry = self.xref.get(num)
        if entry is None:
            return None
        if entry[0] == "raw":
            m = re.compile(rb"(\d+)\s+(\d+)\s+obj").match(
                self.data, _skip_ws(self.data, entry[1]))
            if not m:
                raise PdfError(f"object {num} not at recorded offset")
            obj, p2 = parse_object(self.data, m.end())
            if isinstance(obj, dict):
                p2 = _skip_ws(self.data, p2)
                if self.data.startswith(b"stream", p2):
                    sdict, payload = self._parse_stream_at(entry[1])
                    obj = ("stream", sdict, payload)
        else:
            _tag, stm_num, idx = entry
            objs = self._load_objstm(stm_num)
            obj = objs[idx]
        self._cache[num] = obj
        return obj

    def _load_objstm(self, stm_num: int) -> list:
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        entry = self.xref[stm_num]
        sdict, payload = self._parse_stream_at(entry[1])
        n = int(self.resolve(sdict["N"]))
        first = int(self.resolve(sdict["First"]))
        header = payload[:first].split()
        objs = []
        for i in range(n):
            off = int(header[2 * i + 1])
            obj, _ = parse_object(payload, first + off)
            objs.append(obj)
        self._objstm_cache[stm_num] = objs
        return objs

    # ---------------------------------------------------------- page tree

    def pages(self) -> list[dict]:
        """Flattened page list with inherited attributes. Each entry:
        {"mediabox": [x0,y0,x1,y1], "rotate": int, "resources": dict,
        "contents": bytes (decoded, concatenated)}."""
        root = self.resolve(self.trailer["Root"])
        tree = self.resolve(root["Pages"])
        out: list[dict] = []
        inherit_keys = ("Resources", "MediaBox", "CropBox", "Rotate")

        def walk(node, inherited):
            node = self.resolve(node)
            inh = dict(inherited)
            for k in inherit_keys:
                if k in node:
                    inh[k] = node[k]
            t = str(node.get("Type"))
            if t == "Pages":
                for kid in self.resolve(node["Kids"]):
                    walk(kid, inh)
            elif t == "Page":
                box = [float(self.resolve(v))
                       for v in self.resolve(inh.get("MediaBox",
                                                     [0, 0, 612, 792]))]
                out.append({
                    "mediabox": box,
                    "rotate": int(self.resolve(inh.get("Rotate", 0)) or 0),
                    "resources": self.resolve(inh.get("Resources", {})) or {},
                    "contents": self._page_contents(node),
                })
            else:
                raise PdfError(f"unexpected page-tree node type {t}")

        walk(tree, {})
        declared = int(self.resolve(tree.get("Count", len(out))))
        if declared != len(out):
            raise PdfError(
                f"page tree /Count {declared} != walked {len(out)}")
        return out

    def _page_contents(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, tuple):      # single stream
            return contents[2]
        if isinstance(contents, list):
            parts = []
            for ref in contents:
                s = self.resolve(ref)
                parts.append(s[2] if isinstance(s, tuple) else b"")
            return b"\n".join(parts)
        raise PdfError("unsupported /Contents object")


def pdf_page_count(data: bytes) -> int:
    """Page count from the trailer/page-tree only."""
    return len(PdfDocument(data).pages())
