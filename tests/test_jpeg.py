"""Baseline JPEG codec tests (operators/jpeg.py).

The catalog witness (multimodal_decode_jpeg, plans/extras26.py) hash-checks
the DC-only fixture chain end-to-end against DuckDB; these tests cover what
the fixtures can't: AC coefficients against an independent direct-form IDCT,
quantization with non-flat tables, and the loud-failure contract.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bridge_monitoring_pyspark_spark.operators.jpeg import (
    AC_LUM,
    DC_LUM,
    ZIGZAG,
    _BitWriter,
    _dht_segment,
    _dqt_segment,
    _encode_value,
    _huff_encode_table,
    jpeg_decode,
    synth_jpeg,
)


def _direct_idct(coef: np.ndarray) -> np.ndarray:
    """O(64^2) textbook IDCT (T.81 A.3.3) — independent of the decoder's
    separable matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (cu * cv / 4.0 * coef[v, u]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[y, x] = s
    return out


def _encode_gray_1block(qcoef_zz: list[int], qtable: np.ndarray) -> bytes:
    """Hand-assemble a single-block grayscale JPEG from quantized
    coefficients in zigzag order (qcoef_zz[0] = DC, rest AC)."""
    dc_tab = _huff_encode_table(*DC_LUM)
    ac_tab = _huff_encode_table(*AC_LUM)
    bw = _BitWriter()
    t, bits, n = _encode_value(qcoef_zz[0])
    length, code = dc_tab[t]
    bw.write(code, length)
    bw.write(bits, n)
    k = 1
    while k < 64:
        if qcoef_zz[k] == 0:
            k += 1
            continue
        run = 0
        j = k - 1
        while j >= 1 and qcoef_zz[j] == 0:
            run += 1
            j -= 1
        # re-walk emitting ZRL for runs > 15
        while run > 15:
            zl, zc = ac_tab[0xF0]
            bw.write(zc, zl)
            run -= 16
        t, bits, n = _encode_value(qcoef_zz[k])
        al, ac_ = ac_tab[run << 4 | t]
        bw.write(ac_, al)
        bw.write(bits, n)
        k += 1
    if qcoef_zz[63] == 0:  # trailing zeros present -> EOB (T.81 F.1.2.2)
        el, ec = ac_tab[0x00]
        bw.write(ec, el)
    bw.flush()
    return (b"\xff\xd8"
            + _dqt_segment(0, qtable)
            + _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, AC_LUM)
            + b"\xff\xc0" + struct.pack(">H", 11) + bytes([8])
            + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
            + b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
            + bytes(bw.out) + b"\xff\xd9")


def test_ac_coefficients_match_direct_idct():
    """A block with scattered AC energy and a non-flat quant table must
    decode to the direct-form IDCT result (+-1 for the clamp boundary —
    the decoder rounds the separable float path, the reference rounds the
    direct sum; both are exact to well under half an LSB)."""
    rng = np.random.RandomState(7)
    qtable = np.array([[16, 11, 10, 16, 24, 40, 51, 61],
                       [12, 12, 14, 19, 26, 58, 60, 55],
                       [14, 13, 16, 24, 40, 57, 69, 56],
                       [14, 17, 22, 29, 51, 87, 80, 62],
                       [18, 22, 37, 56, 68, 109, 103, 77],
                       [24, 35, 55, 64, 81, 104, 113, 92],
                       [49, 64, 78, 87, 103, 121, 120, 101],
                       [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)
    qzz = [0] * 64
    qzz[0] = 3  # DC
    for k in (1, 2, 5, 9, 17, 20, 35, 63):  # scattered AC incl. last coef
        qzz[k] = int(rng.randint(-9, 10)) or 1
    buf = _encode_gray_1block(qzz, qtable)
    img = jpeg_decode(buf)
    assert (img["width"], img["height"], img["channels"]) == (8, 8, 1)

    coef = np.zeros(64, dtype=np.int64)
    for k in range(64):
        coef[ZIGZAG[k]] = qzz[k]
    expected = np.floor(_direct_idct(coef.reshape(8, 8) * qtable)
                        + 128.5).clip(0, 255)
    assert np.array_equal(img["pixels"][:, :, 0].astype(np.float64), expected)


def test_zrl_long_zero_run():
    """A lone high-frequency coefficient after 16+ zeros forces a ZRL
    symbol through the encoder and decoder."""
    qzz = [0] * 64
    qzz[0] = -5
    qzz[40] = 7  # 39 zeros before it -> two ZRLs + run 7
    qtable = np.full((8, 8), 4, dtype=np.int64)
    img = jpeg_decode(_encode_gray_1block(qzz, qtable))
    coef = np.zeros(64, dtype=np.int64)
    for k in range(64):
        coef[ZIGZAG[k]] = qzz[k]
    expected = np.floor(_direct_idct(coef.reshape(8, 8) * qtable)
                        + 128.5).clip(0, 255)
    assert np.array_equal(img["pixels"][:, :, 0].astype(np.float64), expected)


def test_fixture_modes_cover_all_entropy_paths():
    """doc_id % 3 rotates grayscale+RST / 4:4:4 / 4:2:0; all decode to the
    same closed form with matching channel counts."""
    for d in (0, 1, 2, 3, 4, 5, 30, 31, 32):
        img = jpeg_decode(synth_jpeg(d))
        wb, hb = 1 + d % 3, 1 + d % 2
        assert (img["width"], img["height"]) == (8 * wb, 8 * hb)
        assert img["channels"] == (1 if d % 3 == 0 else 3)
        exp = np.zeros((8 * hb, 8 * wb), dtype=np.uint8)
        for b in range(wb * hb):
            by, bx = divmod(b, wb)
            exp[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (d * 7 + b * 13) % 256
        for c in range(img["pixels"].shape[2]):
            assert np.array_equal(img["pixels"][:, :, c], exp), (d, c)


def test_loud_failures():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    buf = synth_jpeg(1)
    with pytest.raises(ValueError):
        jpeg_decode(buf[:40])  # truncated mid-segment
    # flip SOF0 -> SOF2 (progressive): must refuse loudly, not garbage
    prog = buf.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(NotImplementedError, match="non-baseline"):
        jpeg_decode(prog)
    # corrupt a restart marker in the grayscale fixture (doc 3 has 2 MCUs)
    g = bytearray(synth_jpeg(3))
    idx = bytes(g).find(b"\xff\xd0", 100)
    assert idx > 0
    g[idx + 1] = 0xD5  # wrong RST index
    with pytest.raises(ValueError, match="RST"):
        jpeg_decode(bytes(g))


def test_truncated_entropy_raises_valueerror_not_indexerror():
    # ADVICE r8: a payload cut mid-entropy-segment must die as a loud
    # ValueError, never a bare IndexError/EOFError from the bit reader
    buf = synth_jpeg(1)
    sos = buf.find(b"\xff\xda")
    assert sos > 0
    for cut in (sos + 15, len(buf) - 3):
        with pytest.raises(ValueError):
            jpeg_decode(buf[:cut])
    # EOI moved into the entropy segment: premature marker, still loud
    cut = buf[:len(buf) - 6] + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg_decode(cut)


def test_fill_bytes_before_markers_accepted():
    # T.81 B.1.1.2: any run of 0xFF fill bytes may precede a marker code
    buf = synth_jpeg(4)
    # pad in front of the DQT marker (first 0xFFDB after SOI)
    idx = buf.find(b"\xff\xdb")
    assert idx > 0
    padded = buf[:idx] + b"\xff\xff\xff" + buf[idx:]
    base = jpeg_decode(buf)
    got = jpeg_decode(padded)
    assert np.array_equal(got["pixels"], base["pixels"])


def test_decode_media_routes_jpeg():
    from bridge_monitoring_pyspark_spark.operators.multimodal import decode_media

    img = decode_media(synth_jpeg(4), "image/jpeg")
    assert img["width"] == 8 * (1 + 4 % 3)
