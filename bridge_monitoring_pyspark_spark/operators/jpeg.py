"""Baseline JPEG (ITU-T T.81) codec — stdlib+numpy only, no PIL.

The third REAL image decoder in the multimodal suite (after PNG and PNM,
operators/multimodal.py): JPEG adds the parts those formats don't exercise —
Huffman entropy coding with byte stuffing and restart markers, quantized
DCT coefficients, interleaved MCU layout with chroma subsampling, and the
YCbCr->RGB color transform. The decoder is a general baseline-sequential
implementation; the fixture encoder (:func:`synth_jpeg`) emits
block-constant images so every decoded pixel has a closed form a SQL
oracle replays exactly (see plans/extras26.py): a constant 8x8 block has
only a DC coefficient, and with a flat quant table of 8 the DC survives
quantization losslessly (DC = 8*(v-128), q = DC/8 = v-128 exactly), so the
full marker/Huffman/dequant/IDCT chain must reproduce v or the hash fails.

Scope (documented, like the PNG decoder's): baseline sequential DCT, 8-bit
samples, grayscale or 3-component YCbCr with arbitrary sampling factors
(4:4:4 and 4:2:0 are what the fixtures emit), restart intervals, multiple
DQT/DHT segments. Progressive (SOF2), arithmetic coding, 12-bit, and CMYK
raise loudly — at 100 TB this per-byte Python stage is the slot a native
decoder (libjpeg-turbo behind the same mapInPandas signature) replaces;
the Spark-side plumbing (schema, batching, payload-width reduction) is
identical either way.

No counterpart in the 550-LoC reference (no binary columns at all:
pipelines/bronze_ingest.py reads JSON events only).
"""

from __future__ import annotations

import struct

import numpy as np

# -- shared tables (public, ITU-T T.81 Annex K) ------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# DC/AC Huffman table specs: (bits[1..16], values). Annex K.3.
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
     0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
     0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
     0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
     0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
     0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
     0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
     0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
     0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
     0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
     0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# 1-D DCT-III basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16); the 2-D
# inverse is M.T @ S @ M (separable, exact to float64 round-off).
_IDCT_M = np.array(
    [[(np.sqrt(0.5) if u == 0 else 1.0) / 2.0
      * np.cos((2 * x + 1) * u * np.pi / 16.0)
      for x in range(8)] for u in range(8)]
)


def _huff_decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: map (code_length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: map symbol -> (code_length, code)."""
    return {v: (length, code) for (length, code), v in
            _huff_decode_table(bits, values).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos          # byte position in buf
        self.bit = 0            # bits consumed of current byte

    def _current_byte(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("truncated entropy data")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("truncated entropy data")
            nxt = self.buf[self.pos + 1]
            if nxt != 0x00:  # a real marker terminates entropy data here
                raise ValueError(
                    f"marker 0x{nxt:02x} inside entropy segment: "
                    "truncated or corrupt scan")
        return b

    def read_bit(self) -> int:
        b = self._current_byte()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1 + (1 if b == 0xFF else 0)  # skip stuffed 0x00
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy segment")

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker (0xFF fill
        bytes before it are legal per T.81 B.1.1.2)."""
        if self.bit:
            self.bit = 0
            if self.pos >= len(self.buf):
                raise ValueError("truncated entropy data")
            self.pos += 1 + (1 if self.buf[self.pos] == 0xFF else 0)
        while (self.pos + 1 < len(self.buf) and self.buf[self.pos] == 0xFF
               and self.buf[self.pos + 1] == 0xFF):
            self.pos += 1  # fill byte
        if self.pos + 1 >= len(self.buf):
            raise ValueError("truncated entropy data")
        if self.buf[self.pos] != 0xFF or self.buf[self.pos + 1] != 0xD0 + (n & 7):
            raise ValueError(
                f"expected RST{n & 7} at byte {self.pos}, got "
                f"{self.buf[self.pos:self.pos + 2].hex()}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t raw bits to the signed coefficient value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(buf: bytes) -> dict:
    """Decode a baseline-sequential JFIF/JPEG byte string to
    ``{width, height, channels, pixels: uint8 (h, w, c)}``.

    Loud failures: truncation, bad marker structure, progressive/
    arithmetic/12-bit streams, invalid Huffman codes, missing RST markers
    — a corrupt 100 TB shard should die in the decode stage, not produce
    silent garbage downstream.
    """
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    restart_interval = 0
    frame = None  # (w, h, comps) where comps = [(cid, h, v, tq)]

    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(buf) and buf[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(buf):
            raise ValueError("truncated marker at end of stream")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS: no image data")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(buf):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", buf[pos:pos + 2])[0]
        seg = buf[pos + 2:pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1 (both baseline-decodable)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit samples unsupported")
            if nc not in (1, 3):
                raise NotImplementedError(f"{nc}-component images unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline SOF marker 0xff{marker:02x} (progressive/"
                "arithmetic/lossless) unsupported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(buf, pos + seglen, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        # APPn / COM / anything else: skip
        pos += seglen
    raise ValueError("no SOS marker: truncated JPEG")


def _decode_scan(buf, pos, frame, scan, qt, huff_dc, huff_ac, ri) -> dict:
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8)) for c in comps]
    preds = [0] * len(comps)
    r = _BitReader(buf, pos)
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and mcu and mcu % ri == 0:
                r.sync_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                dc_t, ac_t = scan[cid]
                for by in range(cv):
                    for bx in range(ch):
                        blk, preds[ci] = _decode_block(
                            r, huff_dc[dc_t], huff_ac[ac_t],
                            qt[tq], preds[ci])
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            mcu += 1
    out = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        p = planes[ci]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        pix = np.floor(out[0] + 128.5).clip(0, 255).astype(np.uint8)
        return {"width": w, "height": h, "channels": 1,
                "pixels": pix[:, :, None]}
    # JFIF YCbCr -> RGB (floor(x + .5) = round-half-up, then clamp)
    y, cb, cr = (o + 128.0 for o in out)
    cb, cr = cb - 128.0, cr - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    pix = np.floor(rgb + 0.5).clip(0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": pix}


def _decode_block(r: _BitReader, dc_tab, ac_tab, q, pred):
    """Huffman-decode one 8x8 block, dequantize, IDCT (level shift is the
    caller's +128). Returns (spatial block float64, new DC predictor)."""
    s = np.zeros(64, dtype=np.int64)
    t = r.read_huff(dc_tab)
    diff = _extend(r.read_bits(t), t)
    pred += diff
    s[0] = pred
    k = 1
    while k < 64:
        rs = r.read_huff(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        s[ZIGZAG[k]] = _extend(r.read_bits(size), size)
        k += 1
    coef = s.reshape(8, 8) * q
    return _IDCT_M.T @ coef @ _IDCT_M, pred


# -- fixture encoder ---------------------------------------------------------

def _encode_value(diff: int) -> tuple[int, int, int]:
    """(category, raw bits, nbits) for a DC diff / AC coefficient."""
    t = 0
    a = abs(diff)
    while a:
        t += 1
        a >>= 1
    bits = diff if diff >= 0 else diff + (1 << t) - 1
    return t, bits, t


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, bits: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(table.reshape(-1)[z]) for z in ZIGZAG)
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


_FLAT8 = np.full((8, 8), 8, dtype=np.int64)


def synth_jpeg(doc_id: int) -> bytes:
    """Deterministic baseline JPEG fixture for ``doc_id``.

    Geometry: ``wb = 1 + id % 3`` x ``hb = 1 + id % 2`` blocks of 8x8;
    block ``b`` (row-major) is the constant value ``(id*7 + b*13) % 256``.
    With the flat quant table of 8s, DC quantization is exact
    (q = 8*(v-128)/8 = v-128), every AC is zero, and the IDCT of a DC-only
    block is constant — so the decoded raster equals the closed form and
    plans/extras26.py's oracle replays it with generate_series.

    Format variety (all under the same pixel closed form):
    * ``id % 3 == 0`` — grayscale, restart interval 1 (an RSTn marker
      between every MCU: the resync + predictor-reset path);
    * ``id % 3 == 1`` — 3-component 4:4:4 YCbCr with neutral chroma
      (Cb = Cr = 128 -> R = G = B = Y exactly under the JFIF transform);
    * ``id % 3 == 2`` — 3-component 4:2:0: Y subsampling 2x2, one chroma
      block per 16x16 MCU, Y edge-padded to the MCU grid (decoder crops).
    """
    wb, hb = 1 + doc_id % 3, 1 + doc_id % 2
    w, h = 8 * wb, 8 * hb
    blocks = [(doc_id * 7 + b * 13) % 256 for b in range(wb * hb)]
    mode = doc_id % 3

    dc_lum = _huff_encode_table(*DC_LUM)
    dc_chr = _huff_encode_table(*DC_CHR)
    ac_lum_eob = _huff_encode_table(*AC_LUM)[0x00]
    ac_chr_eob = _huff_encode_table(*AC_CHR)[0x00]

    def put_block(bw: _BitWriter, value: int, pred: int, dc_tab, eob) -> int:
        """One DC-only block: encode pred diff, then EOB."""
        qdc = value - 128  # exact with the flat-8 table
        t, bits, n = _encode_value(qdc - pred)
        length, code = dc_tab[t]
        bw.write(code, length)
        bw.write(bits, n)
        bw.write(eob[1], eob[0])
        return qdc

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, _FLAT8)
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)

    if mode == 0:  # grayscale + restart markers
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 1)  # DRI 1
        out += (b"\xff\xc0" + struct.pack(">H", 11)
                + bytes([8]) + struct.pack(">HH", h, w)
                + bytes([1, 1, 0x11, 0]))
        out += (b"\xff\xda" + struct.pack(">H", 8)
                + bytes([1, 1, 0x00, 0, 63, 0]))
        pred, rst = 0, 0
        bw = _BitWriter()
        for i, v in enumerate(blocks):
            if i:
                bw.flush()
                out += bw.out + bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                bw = _BitWriter()
                pred = 0
            pred = put_block(bw, v, pred, dc_lum, ac_lum_eob)
        bw.flush()
        out += bw.out
    else:
        out += _dqt_segment(1, _FLAT8)
        out += _dht_segment(0, 1, DC_CHR) + _dht_segment(1, 1, AC_CHR)
        sub = 2 if mode == 2 else 1  # Y sampling factor (4:2:0 vs 4:4:4)
        out += (b"\xff\xc0" + struct.pack(">H", 17)
                + bytes([8]) + struct.pack(">HH", h, w)
                + bytes([3,
                         1, sub << 4 | sub, 0,
                         2, 0x11, 1,
                         3, 0x11, 1]))
        out += (b"\xff\xda" + struct.pack(">H", 12)
                + bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
        bw = _BitWriter()
        preds = [0, 0, 0]
        mcux, mcuy = -(-wb // sub), -(-hb // sub)
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(sub):
                    for bx in range(sub):
                        # edge-replicate padding outside the wb x hb grid
                        gy = min(my * sub + by, hb - 1)
                        gx = min(mx * sub + bx, wb - 1)
                        preds[0] = put_block(bw, blocks[gy * wb + gx],
                                             preds[0], dc_lum, ac_lum_eob)
                for ci in (1, 2):  # neutral chroma: one block each
                    preds[ci] = put_block(bw, 128, preds[ci],
                                          dc_chr, ac_chr_eob)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
